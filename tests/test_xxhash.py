"""Pin python xxhash64 parity with Spark's JVM implementation."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from katta_spark.xxhash import term_hash


def test_parity_with_spark(spark):
    rng = random.Random(7)
    terms = [
        "", "a", "hotalpha", "ünïcödé-漢字", "x" * 3, "y" * 4, "z" * 7,
        "q" * 8, "r" * 31, "s" * 32, "t" * 33, "u" * 100,
    ] + [
        "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 40)))
        for _ in range(50)
    ]
    df = spark.createDataFrame([(t,) for t in terms], "t string").select(
        "t", F.xxhash64("t").alias("h")
    )
    want = {r.t: r.h for r in df.collect()}
    assert all(term_hash(t) == want[t] for t in terms)
