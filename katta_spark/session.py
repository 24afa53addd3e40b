"""SparkSession factory tuned for this engine.

Local-mode testing stands in for a multi-executor cluster; all layout
decisions (partition counts, broadcast sizes, AQE) are made as if running on
1000 executors over ~100 TB — see notes inline.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "katta_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    shuffle_partitions defaults to the core count locally; on a real
    cluster you would size it to ~2-3x total cores and let AQE coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting — first line of
        # defense against hot-term skew at 100 TB (on top of explicit salting
        # in build.py).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local-scale scan splits: test fixtures are small parquet files;
        # the 128 MB default would cap scan parallelism at a handful of
        # splits. A real cluster run would keep the default.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas-UDF exchange (the only Python on the hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Big Arrow batches: the build's run-encoder does one Python
        # crossing per batch; token rows are ~40 bytes so 200k rows ≈ 8 MB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
        # Partitioned writes must be idempotent per partition for the
        # resumable build (build.py): dynamic overwrite replaces only the
        # shard_id partitions present in the incoming batch.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
