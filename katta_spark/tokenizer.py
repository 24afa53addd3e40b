"""Deterministic tokenizer — identical at build and query time.

The reference uses Lucene's StandardAnalyzer at both build and query time
(IndexerJob.java:129, SampleIndexGenerator.java:64); the invariant that
matters is *the same analysis on both sides*, not the specific analyzer.

Ours: lowercase, then maximal runs of [a-z0-9] are tokens. Three equivalent
implementations, used in different places:

- ``tokenize_col``      : Spark Column (JVM-side, whole-stage codegen) — the
                          hot path for index build and the oracle scorer.
- ``tokenize_series``   : vectorized pandas (inside Arrow UDF kernels).
- ``tokenize_str``      : plain Python (query parsing on the driver, tests).
- ``TOKENIZE_SQL_DUCKDB``: the same semantics as ANSI-ish DuckDB SQL for the
                          driver's oracle gate.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z0-9]+"
_SPLIT_PATTERN = r"[^a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_col(col: Column) -> Column:
    """array<string> of tokens, computed entirely JVM-side (no Python)."""
    return F.array_remove(F.split(F.lower(col), _SPLIT_PATTERN), "")


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer for use inside Arrow/pandas UDFs."""
    return s.str.lower().str.findall(_TOKEN_RE)


def tokenize_str(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


# DuckDB expression producing the same token array from a column `{col}`.
# list_filter removes the empty strings regexp_split leaves at the edges —
# matching F.array_remove above.
TOKENIZE_SQL_DUCKDB = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)
