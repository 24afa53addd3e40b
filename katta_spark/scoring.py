"""BM25 scoring — the single source of truth for the whole engine.

The reference scores with Lucene 3.5 DefaultSimilarity TF-IDF, with *global*
document frequencies injected so sharded scores equal unsharded scores
(LuceneServer.java:441 builds the Weight against a CachedDfSource of the
client-aggregated df map). The north rule replaces the formula with BM25
(k1=1.2, b=0.75) but keeps that architectural invariant: stats are
corpus-global, broadcast to every shard kernel.

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm     = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d, Q) = sum over t in Q of  qweight(t) * idf(t) * tf_norm(t, d)

qweight(t) = number of occurrences of t in the query (a duplicated query
term contributes twice, matching Lucene's per-occurrence weighting —
exercised by the reference's duplicate-term queries).

Rank identity under float math (SURVEY.md §7 hard-point a): every path —
numpy kernel, DataFrame oracle, DuckDB oracle SQL — computes per-term
contributions in float64 and the final comparison rounds to 4 decimals;
the *stored* score type is float32 (Katta's Hit score is a Java float,
Hit.java:39).

Tie-break (rank identity, Hit.java:150-162 compareTo): score DESC,
doc_id ASC, shard_id DESC.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    """Vectorized idf over an array of document frequencies (float64)."""
    df = df.astype(np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_norm_np(tf: np.ndarray, dl: np.ndarray, avgdl: float,
               k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_col(df_col: Column, n_docs_col: Column) -> Column:
    """idf as a Spark Column (float64), for the DataFrame oracle."""
    d = df_col.cast("double")
    return F.log1p((n_docs_col.cast("double") - d + F.lit(0.5)) / (d + F.lit(0.5)))


def tf_norm_col(tf_col: Column, dl_col: Column, avgdl_col: Column,
                k1: float = BM25_K1, b: float = BM25_B) -> Column:
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    return (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl_col.cast("double"))
    )


# DuckDB SQL fragments with identical semantics (for oracle_sql()).
IDF_SQL = "ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5))"
TF_NORM_SQL = "({tf} * (1.2 + 1.0)) / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl}))"
