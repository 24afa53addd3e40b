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


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read the transcripts table with the declared schema (no inference).

    The north-rule input is an ICEBERG table of transcripts; this
    container ships no Iceberg runtime, so parquet is the stand-in —
    the engine is layout-agnostic because every consumer takes a
    DataFrame, and the properties the build relies on map 1:1:
    partition pruning (Iceberg manifests ↔ parquet partition dirs +
    row-group stats), idempotent committed output (Iceberg snapshot
    commit ↔ dynamic-partition-overwrite), and resume (snapshot
    checkpoint ↔ per-batch lineage rows, build.py). On a cluster with
    the Iceberg runtime on the classpath, pass fmt='iceberg' and a
    catalog table name; time travel / incremental reads
    (option('start-snapshot-id', …)) then replace the path argument of
    the streaming delta-build path.
    """
    if fmt == "iceberg":
        df = spark.read.format("iceberg").load(path)
        # Iceberg owns the physical schema; enforce the declared one.
        return df.select(
            *[F.col(f.name).cast(f.dataType) for f in TRANSCRIPTS_SCHEMA.fields]
        )
    if fmt != "parquet":
        raise ValueError(f"unknown transcripts format {fmt!r}")
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
