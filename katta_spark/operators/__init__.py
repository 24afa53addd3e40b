"""Operator surface (re-exports) — search/top-k/join/dedup kernels.

The implementation lives in flat modules (query/build/textops/similarity);
this package groups them by role for discoverability.
"""

from katta_spark.build import build_index, term_dictionary, token_rows  # noqa: F401
from katta_spark.query import (  # noqa: F401
    IndexHandle,
    count_matches,
    expand_wildcards,
    get_details,
    parse_query,
    search,
    search_multi,
    search_sorted,
)
from katta_spark.similarity import cosine_topk, cosine_topk_lsh  # noqa: F401
from katta_spark.textops import (  # noqa: F401
    doc_fingerprint,
    exact_dedup,
    jaccard_pairs,
    lang_id,
    minhash_lsh_pairs,
    minhash_signatures,
    quality_scores,
    simhash16,
)
