"""Auxiliary source/lookup operators.

- point_lookup: the MapFile content-server analog (SURVEY.md §2.1 S7,
  lib/mapfile/MapFileServer.java:171-225 — key→value get across shards).
  In Spark a point get is a pushed-predicate scan; against a table sorted/
  partitioned by the key it touches one file's row groups.
- read_transcripts: schema-enforced reader for the canonical input table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.schema import TRANSCRIPTS_SCHEMA


def point_lookup(df: DataFrame, key_col: str, key) -> DataFrame:
    """key→rows lookup (MapFileServer.get analog). The predicate is pushed
    to the scan; with a key-sorted layout parquet min/max stats skip all
    non-matching row groups."""
    return df.where(F.col(key_col) == F.lit(key))


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a transcripts table with the declared schema (no inference)."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
