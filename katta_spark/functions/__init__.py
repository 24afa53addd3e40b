"""Scalar-function surface (re-exports): tokenization, scoring, codec."""

from katta_spark.codec import (  # noqa: F401
    decode_posting_list,
    encode_posting_list,
    encode_posting_lists_batch,
    vb_decode,
    vb_encode,
)
from katta_spark.scoring import (  # noqa: F401
    BM25_B,
    BM25_K1,
    idf_col,
    idf_np,
    tf_norm_col,
    tf_norm_np,
)
from katta_spark.tokenizer import (  # noqa: F401
    TOKENIZE_SQL_DUCKDB,
    tokenize_col,
    tokenize_series,
    tokenize_str,
)
