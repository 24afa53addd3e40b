"""spark-submit entry point: time one index build over a parquet transcripts
table. Master/parallelism comes from spark-submit; the job shape (shuffle
partitions, num_shards) is held CONSTANT across cluster sizes so the
two-cluster-size comparison varies only the executor core count.

Usage:
  spark-submit --master local[8] --py-files katta_spark.zip \
      scripts/scaling_build.py <transcripts_parquet> <index_out> \
      <num_shards> <shuffle_partitions>

Prints one JSON line: {"turns": N, "build_sec": s, "turns_per_sec": tps,
"phases": {...}, "metrics": {cpu_sec, run_sec, shuffle_write_mb,
shuffle_read_mb, tasks}}.

The metrics block is the host-noise-immune work accounting the r2/r3
verdicts asked for: total executor CPU-seconds and shuffle bytes for the
TIMED build only (warm-up excluded), parsed from the Spark event log.
Equal CPU-seconds and shuffle bytes at N and 4N executors prove the two
runs execute the same work per row — any wall-clock ratio below the core
ratio is then scheduling/fabric contention, not extra work at 4N.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def _eventlog_metrics(log_dir: str, after_ns: int) -> dict:
    """Sum task metrics from the (single) event log, tasks launched after
    ``after_ns`` (epoch ms actually — Spark logs 'Launch Time' in ms)."""
    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_<app>/
    # events_1_<app>) — walk everything under log_dir.
    paths = []
    for root, _, files in os.walk(log_dir):
        for f in files:
            if "appstatus" not in f:
                paths.append(os.path.join(root, f))
    cpu = run = sw = sr = tasks = 0
    for path in paths:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ti = ev.get("Task Info") or {}
                if ti.get("Launch Time", 0) < after_ns:
                    continue
                tm = ev.get("Task Metrics") or {}
                cpu += tm.get("Executor CPU Time", 0)  # ns
                run += tm.get("Executor Run Time", 0)  # ms
                sw += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                srm = tm.get("Shuffle Read Metrics") or {}
                sr += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                tasks += 1
    return {
        "cpu_sec": round(cpu / 1e9, 2),
        "run_sec": round(run / 1e3, 2),
        "shuffle_write_mb": round(sw / 1e6, 1),
        "shuffle_read_mb": round(sr / 1e6, 1),
        "tasks": tasks,
    }


def main() -> None:
    src, out, num_shards, shuffle_parts = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    # zstd shuffle/broadcast compression trades memory-fabric bandwidth for
    # ALU work — on this bandwidth-ceilinged host it speeds the 16-core
    # cluster ~8% while leaving the 4-core one flat (measured), and on a
    # real cluster it is the standard network-relief choice.
    codec = os.environ.get("KATTA_SCALING_CODEC", "zstd")
    # zstd stream buffer: probed 512k vs the 32k default (BENCH/
    # scaling_probe_zbuf*.json) — wire bytes IDENTICAL at both (the
    # buffer chunks the stream; it is not the compression match window),
    # so the default stays. The knob remains for future probes.
    zbuf = os.environ.get("KATTA_SCALING_ZSTD_BUF", "32k")
    evlog = tempfile.mkdtemp(prefix="katta_evlog_")
    spark = (
        SparkSession.builder.appName("katta_scaling_build")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.io.compression.codec", codec)
        .config("spark.io.compression.zstd.bufferSize", zbuf)
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evlog)
        .config("spark.eventLog.compress", "false")
        # Scan-split sizing: local-scale parquet files are a few MB, so the
        # 128 MB default packs the whole input into a handful of splits and
        # caps the map-stage parallelism regardless of core count. (On a
        # real 100 TB cluster the default is right; this is a fixture-scale
        # knob, held identical across both cluster sizes.)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from katta_spark.build import build_index

    transcripts = spark.read.parquet(src)
    n = transcripts.count()  # warms the scan; excluded from build timing
    # Steady-state warm-up (excluded from timing): a ~2% build exercises
    # every code path on EVERY executor — tokenize/hash codegen compiles,
    # shuffle writers spin up, Python workers fork, Arrow + numpy kernels
    # import. Each spark-submit is a fresh set of JVMs; without this, the
    # measurement mixes ~constant cold-start into the wall clock, which
    # biases against the SHORTER (big-cluster) run and understates scaling.
    # The hash filter (not limit) touches every input partition so no
    # executor stays cold.
    from pyspark.sql import functions as F
    warm_dir = tempfile.mkdtemp(prefix="katta_warm_")
    warm = transcripts.where(
        F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(50)) == 0
    )
    build_index(spark, warm, warm_dir, num_shards=num_shards)
    import shutil
    shutil.rmtree(warm_dir, ignore_errors=True)
    t0 = time.time()
    t0_ms = int(t0 * 1000)
    summary = build_index(spark, transcripts, out, num_shards=num_shards)
    sec = time.time() - t0
    spark.stop()  # flushes the event log
    metrics = _eventlog_metrics(evlog, t0_ms)
    shutil.rmtree(evlog, ignore_errors=True)
    print(json.dumps({"turns": n, "build_sec": round(sec, 3),
                      "turns_per_sec": round(n / sec, 1),
                      "phases": summary.get("phase_timings", {}),
                      "metrics": metrics}))


if __name__ == "__main__":
    main()
