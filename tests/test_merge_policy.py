"""Tiered merge policy + auto-compaction scheduler.

Planner properties are pure-metadata (no Spark); the end-to-end test
verifies the Lucene/Katta contract: after auto_compact the LIVE segment
set answers every query score-identically to the pre-merge delta set,
and a crash between commit and cleanup never double-counts a document.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.merge_policy import (
    SegmentInfo,
    auto_compact,
    live_index_dirs,
    plan_compaction,
    segment_infos,
)
from katta_spark.query import search_multi

CFG = (4, "pmod_doc_id", (), True, None)


def _seg(name, docs, deleted=0, cfg=CFG):
    return SegmentInfo(index_dir=name, n_docs=docs, deleted=deleted, config=cfg)


def test_dust_deltas_merge_together():
    # 6 dust segments + floor: all land in one tier, one group (fan-in cap 10)
    infos = [_seg(f"delta_{i}", 10 + i) for i in range(6)]
    plan = plan_compaction(infos, floor_docs=1024)
    assert plan == [[f"delta_{i}" for i in range(6)]]


def test_giant_base_never_joins_dust_tier():
    infos = [_seg("merged_0", 1_000_000)] + [
        _seg(f"delta_{i}", 50) for i in range(4)
    ]
    plan = plan_compaction(infos, floor_docs=1024, tier_ratio=10.0)
    assert plan == [[f"delta_{i}" for i in range(4)]]
    # the base is in no group — no O(corpus) rewrite per dust delta
    assert all("merged_0" not in g for g in plan)


def test_fan_in_and_size_caps():
    infos = [_seg(f"d{i:02d}", 100) for i in range(25)]
    plan = plan_compaction(infos, floor_docs=1, max_merge_at_once=10)
    assert [len(g) for g in plan] == [10, 10, 5]
    seen = [d for g in plan for d in g]
    assert len(seen) == len(set(seen)) == 25  # disjoint, complete
    capped = plan_compaction(
        infos, floor_docs=1, max_merge_at_once=10, max_merged_docs=350
    )
    assert all(sum(100 for _ in g) <= 350 for g in capped)
    assert all(len(g) >= 2 for g in capped)


def test_expunge_deletes_singleton():
    infos = [
        _seg("merged_0", 10_000, deleted=4_000),
        _seg("merged_1", 9_000_000),
    ]
    plan = plan_compaction(infos, floor_docs=1024, expunge_deletes_pct=0.25)
    assert ["merged_0"] in plan
    # below the trigger: no singleton
    infos2 = [_seg("merged_0", 10_000, deleted=100), _seg("m1", 9_000_000)]
    assert plan_compaction(infos2, floor_docs=1024) == []


def test_incompatible_configs_never_group():
    other = (8, "pmod_doc_id", (), True, None)
    infos = [_seg("a", 10), _seg("b", 10), _seg("c", 10, cfg=other)]
    plan = plan_compaction(infos, floor_docs=1024)
    assert plan == [["a", "b"]]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _seg_st = st.builds(
        lambda n, docs, deleted_frac, cfg: SegmentInfo(
            index_dir=f"seg_{n:04d}",
            n_docs=docs,
            deleted=int(docs * deleted_frac),
            config=cfg,
        ),
        st.integers(0, 9999),
        st.integers(0, 10_000_000),
        st.floats(0.0, 1.0),
        st.sampled_from([CFG, (8, "pmod_xxhash64", (), True, None)]),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        segs=st.lists(_seg_st, max_size=40, unique_by=lambda s: s.index_dir),
        fan_in=st.integers(2, 12),
        floor=st.integers(1, 1 << 20),
        ratio=st.floats(1.0, 100.0),
        cap=st.one_of(st.none(), st.integers(1, 1 << 22)),
    )
    def test_planner_invariants_fuzz(segs, fan_in, floor, ratio, cap):
        plan = plan_compaction(
            segs,
            max_merge_at_once=fan_in,
            floor_docs=floor,
            tier_ratio=ratio,
            max_merged_docs=cap,
        )
        by_dir = {s.index_dir: s for s in segs}
        seen = [d for g in plan for d in g]
        assert len(seen) == len(set(seen))  # disjoint groups
        for g in plan:
            assert 1 <= len(g) <= fan_in
            members = [by_dir[d] for d in g]
            assert len({m.config for m in members}) == 1  # config purity
            if len(g) == 1:  # only the expunge rule makes singletons
                assert members[0].deleted > 0
                assert members[0].deletes_pct >= 0.25
            else:
                sizes = sorted(max(m.live_docs, floor) for m in members)
                assert sizes[-1] <= ratio * sizes[0]  # tier cohesion
                if cap is not None:
                    assert sum(m.live_docs for m in members) <= cap

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_planner_argument_validation():
    with pytest.raises(ValueError):
        plan_compaction([], max_merge_at_once=1)
    with pytest.raises(ValueError):
        plan_compaction([], min_merge=1)
    with pytest.raises(ValueError):
        plan_compaction([], tier_ratio=0.5)


@pytest.fixture(scope="module")
def delta_root(spark, tiny_transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mergepol"))
    for part in range(4):
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(11)), F.lit(4))
                == part
            ),
            os.path.join(root, f"delta_{part:03d}"),
            num_shards=4,
        )
    return root


def test_auto_compact_end_to_end(spark, delta_root, tiny_transcripts):
    before = live_index_dirs(delta_root)
    assert len(before) == 4
    infos = segment_infos(before)
    assert sum(i.n_docs for i in infos) == tiny_transcripts.count()
    assert all(i.bytes > 0 and i.config == infos[0].config for i in infos)

    want = search_multi(
        spark, before, "hotalpha hotbeta", k=12, score_dtype="float64"
    ).collect()

    res = auto_compact(spark, delta_root, floor_docs=1 << 20)
    assert res["rounds"] == 1 and len(res["merges"]) == 1
    after = live_index_dirs(delta_root)
    assert len(after) == 1 and after[0].endswith("merged_0")
    assert res["merges"][0]["n_docs"] == tiny_transcripts.count()
    # consumed deltas are gone from disk too (cleanup ran)
    assert not any(os.path.isdir(d) for d in before)

    got = search_multi(
        spark, after, "hotalpha hotbeta", k=12, score_dtype="float64"
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert [round(r.score, 9) for r in got] == [
        round(r.score, 9) for r in want
    ]

    # policy satisfied: a second run is a no-op
    res2 = auto_compact(spark, delta_root, floor_docs=1 << 20)
    assert res2["rounds"] == 0 and res2["merges"] == []


def test_stream_build_then_cli_auto_compact(
    spark, tiny_transcripts, tmp_path, capsys
):
    """The full incremental loop: stream_build drains micro-batches into
    delta indexes, the CLI's autoCompact collapses them, and the live
    set answers queries identically to the pre-merge deltas."""
    from katta_spark import cli
    from katta_spark.streaming import stream_build

    src = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    half = F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0
    # two drains with an append between -> exactly two delta segments
    # (the checkpoint makes the second drain see only the new files)
    tiny_transcripts.where(half).write.parquet(src)
    stream_build(spark, src, root, num_shards=4)
    tiny_transcripts.where(~half).write.mode("append").parquet(src)
    stream_build(spark, src, root, num_shards=4)
    before = live_index_dirs(root)
    assert len(before) == 2
    want = search_multi(
        spark, before, "hotalpha hotbeta", k=10, score_dtype="float64"
    ).collect()

    assert cli.main(
        ["autoCompact", root, "--dry-run", "--floor-docs", str(1 << 20)]
    ) == 0
    dry = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(dry["live"]) == 2 and dry["plan"] == [dry["live"]]
    assert len(live_index_dirs(root)) == 2  # dry run executed nothing

    assert cli.main(["autoCompact", root, "--floor-docs", str(1 << 20)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    after = live_index_dirs(root)
    assert len(out["merges"]) == 1 and len(after) == 1
    got = search_multi(
        spark, after, "hotalpha hotbeta", k=10, score_dtype="float64"
    ).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in got] == [
        (r.doc_id, round(r.score, 9)) for r in want
    ]

    # showStructure (Katta.java CLI analog) reads the post-merge registry
    # from metadata alone — no Spark session
    assert cli.main(["showStructure", root]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert [r["index"] for r in lines] == ["merged_0"]
    assert lines[0]["n_docs"] == tiny_transcripts.count()
    assert lines[0]["n_shards"] == 4 and lines[0]["positions"] is True

    assert cli.main(["version"]) == 0
    v = json.loads(capsys.readouterr().out.strip())
    assert {"katta_spark", "index_format", "pyspark"} <= set(v)


def test_stream_build_inline_merge_policy(spark, tiny_transcripts, tmp_path):
    """stream_build(merge_policy={...}) bounds the live segment count as
    drains accumulate — the background-merge-after-flush loop."""
    from katta_spark.streaming import stream_build

    src = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    policy = {"floor_docs": 1 << 20}
    third = F.pmod(F.xxhash64("conv_id"), F.lit(3))
    tiny_transcripts.where(third == 0).write.parquet(src)
    stream_build(spark, src, root, num_shards=2, merge_policy=policy)
    assert len(live_index_dirs(root)) == 1  # single segment: no merge
    for part in (1, 2):
        tiny_transcripts.where(third == part).write.mode("append").parquet(src)
        stream_build(spark, src, root, num_shards=2, merge_policy=policy)
        assert len(live_index_dirs(root)) == 1  # merged back down
    got = search_multi(
        spark, live_index_dirs(root), "hotalpha", k=5, score_dtype="float64"
    ).collect()
    want = {r.doc_id for r in got}
    # the merged index covers the whole corpus: equal to one-shot build
    one = str(tmp_path / "one")
    build_index(spark, tiny_transcripts, one, num_shards=2)
    ref = search_multi(spark, [one], "hotalpha", k=5, score_dtype="float64")
    assert want == {r.doc_id for r in ref.collect()}
    with pytest.raises(ValueError, match="available_now"):
        stream_build(
            spark, src, root, available_now=False, merge_policy=policy
        )


def test_cascade_two_rounds(spark, tiny_transcripts, tmp_path):
    """max_rounds=2 cascades: four dust deltas merge pairwise under a
    fan-in cap of 2, then the two tier-1 merges merge into one."""
    root = str(tmp_path)
    for part in range(4):
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", F.lit(3)), F.lit(4)) == part
            ),
            os.path.join(root, f"delta_{part:03d}"),
            num_shards=2,
        )
    want = search_multi(
        spark, live_index_dirs(root), "hotbeta", k=8, score_dtype="float64"
    ).collect()
    res = auto_compact(
        spark, root, max_rounds=2, max_merge_at_once=2, floor_docs=1 << 20
    )
    assert res["rounds"] == 2
    assert [sorted(m["inputs"]) for m in res["merges"]] == [
        ["delta_000", "delta_001"],
        ["delta_002", "delta_003"],
        ["merged_0", "merged_1"],
    ]
    after = live_index_dirs(root)
    assert [os.path.basename(d) for d in after] == ["merged_2"]
    got = search_multi(
        spark, after, "hotbeta", k=8, score_dtype="float64"
    ).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in got] == [
        (r.doc_id, round(r.score, 9)) for r in want
    ]


def test_reader_grace_and_sweep(spark, tiny_transcripts, tmp_path):
    """remove_inputs=False keeps consumed segments readable for in-flight
    queries; sweep_consumed reclaims them afterward."""
    from katta_spark.merge_policy import sweep_consumed

    root = str(tmp_path)
    for part in range(2):
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2)) == part
            ),
            os.path.join(root, f"delta_{part:03d}"),
            num_shards=2,
        )
    old_live = live_index_dirs(root)
    res = auto_compact(
        spark, root, floor_docs=1 << 20, remove_inputs=False
    )
    assert len(res["merges"]) == 1
    # the pre-merge list still fully scans (reader grace)...
    assert all(os.path.isdir(d) for d in old_live)
    got = search_multi(spark, old_live, "hotalpha", k=5).collect()
    assert got
    # ...new readers see only the merged segment
    assert [os.path.basename(d) for d in live_index_dirs(root)] == [
        "merged_0"
    ]
    removed = sweep_consumed(root)
    assert sorted(removed) == ["delta_000", "delta_001"]
    assert not any(os.path.isdir(d) for d in old_live)


def test_sweep_deletes_manifest_holders_last(tmp_path):
    """A consumed merged segment's manifest hides its own inputs, so the
    sweep must delete inputs before the manifest holder — otherwise a
    crash mid-sweep would resurface consumed deltas (double counting)."""
    from katta_spark.merge_policy import sweep_consumed

    root = str(tmp_path)
    # chain: merged_0 consumed delta_000+delta_001; merged_1 consumed
    # merged_0+delta_002 — everything still on disk (grace mode)
    for name in ("delta_000", "delta_001", "delta_002", "merged_0",
                 "merged_1"):
        os.makedirs(os.path.join(root, name))
    with open(os.path.join(root, "merged_0", "_INPUTS.json"), "w") as fh:
        json.dump({"inputs": ["delta_000", "delta_001"]}, fh)
    with open(os.path.join(root, "merged_1", "_INPUTS.json"), "w") as fh:
        json.dump({"inputs": ["merged_0", "delta_002"]}, fh)
    assert [os.path.basename(d) for d in live_index_dirs(root)] == [
        "merged_1"
    ]
    removed = sweep_consumed(root)
    # leaves strictly before the merged dir whose manifest hides them
    assert removed.index("delta_000") < removed.index("merged_0")
    assert removed.index("delta_001") < removed.index("merged_0")
    assert removed.index("delta_002") < removed.index("merged_0")
    assert [os.path.basename(d) for d in live_index_dirs(root)] == [
        "merged_1"
    ]
    assert sorted(os.listdir(root)) == ["merged_1"]


def test_crash_between_commit_and_cleanup(tmp_path):
    """A committed merge whose inputs are still on disk (crash before
    rmtree) must hide those inputs from readers — no double counting."""
    root = str(tmp_path)
    for name in ("delta_000", "delta_001"):
        os.makedirs(os.path.join(root, name))
    m = os.path.join(root, "merged_0")
    os.makedirs(m)
    with open(os.path.join(m, "_INPUTS.json"), "w") as fh:
        json.dump({"inputs": ["delta_000"]}, fh)
    # stale tmp dir from an uncommitted merge: invisible
    os.makedirs(os.path.join(root, "_tmp_merged_1"))
    live = live_index_dirs(root)
    assert [os.path.basename(d) for d in live] == ["delta_001", "merged_0"]
