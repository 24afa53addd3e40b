"""Index registry: name/pattern → dirs (Client.java:425-456) + client QPS.

Reference test: LuceneClientTest.java:526 searches the regex ``index[12]``
across two deployed indexes and gets the union.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from katta_spark.build import build_index
from katta_spark.query import IndexHandle, search
from katta_spark.registry import list_indexes, resolve, search_by_name
from katta_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    """Registry with index1/index2 (doc-parity split) + whole (the union)."""
    r = str(tmp_path_factory.mktemp("registry"))
    tx = synth_transcripts(spark, 1500, seed=42)
    from pyspark.sql import functions as F

    doc = F.xxhash64("conv_id", "turn_idx")
    build_index(spark, tx.where(F.pmod(doc, F.lit(2)) == 0),
                os.path.join(r, "index1"), num_shards=2)
    build_index(spark, tx.where(F.pmod(doc, F.lit(2)) == 1),
                os.path.join(r, "index2"), num_shards=2)
    build_index(spark, tx, os.path.join(r, "whole"), num_shards=4)
    os.makedirs(os.path.join(r, "not_an_index"))  # ignored: no FORMAT_VERSION
    return r


def test_list_and_resolve(root):
    assert sorted(list_indexes(root)) == ["index1", "index2", "whole"]
    assert resolve(root, "index1") == [os.path.join(root, "index1")]
    # Katta-style regex patterns, compiled VERBATIM (Client.java:425-456):
    # '*' is a regex quantifier except for the special-cased bare '*'.
    assert resolve(root, "index[12]") == [
        os.path.join(root, "index1"), os.path.join(root, "index2")
    ]
    assert resolve(root, "index.*") == [
        os.path.join(root, "index1"), os.path.join(root, "index2")
    ]
    assert len(resolve(root, "*")) == 3
    assert len(resolve(root, "index1,whole")) == 2
    # a miss among hits only warns (Client.java warn-per-miss) …
    with pytest.warns(UserWarning):
        assert resolve(root, "nosuch.*,index1") == [os.path.join(root, "index1")]
    # … the call errors only when NOTHING resolves
    with pytest.raises(ValueError), pytest.warns(UserWarning):
        resolve(root, "nosuch.*")


def test_search_by_pattern_equals_whole(spark, root):
    """Searching the regex 'index[12]' == searching the monolithic index
    (cross-index stats summing keeps scores identical)."""
    got = search_by_name(spark, root, "index[12]", "hotalpha w00012", k=10).collect()
    want = search(spark, os.path.join(root, "whole"), "hotalpha w00012", k=10).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    np.testing.assert_allclose(
        np.array([r.score for r in got], np.float32),
        np.array([r.score for r in want], np.float32),
        rtol=2e-6,
    )


def test_match_mode_and_custom_kernel(spark, root, tmp_path):
    """'match' mode returns the distinct matching docIDs without scoring;
    register_kernel adds a user mode (IContentServer analog, §2.12)."""
    import numpy as _np
    import pandas as _pd

    from katta_spark import operators
    from katta_spark.query import count_matches

    d = os.path.join(root, "whole")
    got = search(spark, d, "hotalpha", k=10**9, mode="match", ordered=False)
    assert got.count() == count_matches(spark, d, "hotalpha")

    def one_per_shard_factory(qw, n, a, k, prune, dt, wt):
        def kernel(pdf, filter_docs=None):
            return _pd.DataFrame(
                {
                    "shard_id": _np.array([pdf["shard_id"].iloc[0]], dtype=_np.int32),
                    "doc_id": _np.array([0], dtype=_np.int64),
                    "score": _np.array([1.0], dtype=dt),
                }
            )
        return kernel

    operators.register_kernel("one_per_shard", one_per_shard_factory)
    try:
        rows = search(spark, d, "hotalpha", k=10, mode="one_per_shard").collect()
        assert 1 <= len(rows) <= 4 and all(r.doc_id == 0 for r in rows)
    finally:
        del operators.KERNEL_MODES["one_per_shard"]
    with pytest.raises(ValueError):
        search(spark, d, "hotalpha", mode="nope")


def test_grep_docs(spark, tiny_transcripts):
    from katta_spark.operators import grep_docs

    rows = grep_docs(tiny_transcripts, "hotalpha").collect()
    assert rows and all("hotalpha" in r.text for r in rows)


def test_concurrent_queries_consistent(spark, root):
    """SURVEY §5 cat 5 (LuceneSearchIntegrationTest.java:38-96: N threads
    of continuous queries must all see the same hit count): concurrent
    searches through one handle return identical results."""
    from concurrent.futures import ThreadPoolExecutor

    h = IndexHandle.open(spark, os.path.join(root, "whole"))

    def one(_):
        return [
            (r.doc_id, r.shard_id, r.score)
            for r in search(spark, h, "hotalpha w00012", k=10).collect()
        ]

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(one, range(12)))
    assert all(res == results[0] for res in results)
    assert results[0]


def test_qpm_metric(spark, root):
    h = IndexHandle.open(spark, os.path.join(root, "whole"))
    assert h.qpm() == 0.0
    for _ in range(3):
        search(spark, h, "hotalpha", k=1).collect()
    assert h._n_queries == 3
    assert h.qpm() > 0.0
