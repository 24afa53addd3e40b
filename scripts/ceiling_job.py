"""Embarrassingly-parallel ALU ceiling job for the scaling harness.

Pure JVM-side hashing over spark.range: no shuffle, no Python workers, no
input IO — the closest a Spark job gets to perfectly parallel on this
hardware. Its N-vs-4N efficiency is the HOST's achievable ceiling under
the exact same harness (local-cluster executors, taskset pinning,
spark-submit); any real dataflow's efficiency should be read against it.

Usage: spark-submit --master local-cluster[E,4,6144] scripts/ceiling_job.py
Prints one JSON line {"work": N, "wall_sec": s, "rate": N/s}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WORK = 40_000_000  # default rows hashed; override with argv[2]


def main() -> None:
    parts = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    global WORK
    WORK = int(sys.argv[2]) if len(sys.argv) > 2 else WORK
    spark = (
        SparkSession.builder.appName("katta_scaling_ceiling")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    def run() -> float:
        t0 = time.time()
        (
            spark.range(0, WORK, 1, parts)
            .select(
                F.sum(
                    F.conv(
                        F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 6),
                        16,
                        10,
                    ).cast("long")
                ).alias("s")
            )
            .collect()
        )
        return time.time() - t0

    # warm-up pass (JIT), then the timed pass
    (
        spark.range(0, WORK // 20, 1, parts)
        .select(F.count(F.sha2(F.col("id").cast("string"), 256)))
        .collect()
    )
    wall = run()
    print(json.dumps({"work": WORK, "wall_sec": round(wall, 3),
                      "rate": round(WORK / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
