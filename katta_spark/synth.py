"""Deterministic synthetic transcripts generator.

Analog of the reference's SampleIndexGenerator (tool/SampleIndexGenerator.java:
46-95: numOfWordsPerDoc random dictionary words x numOfDocuments), adapted to
the transcripts shape mandated by BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string, ts ts).

Design constraints (FIXTURES.md §1):
- pure function of (seed, conv_num, turn_idx): regenerating at any scale
  prefix-extends smaller scales; no Python on the hot path — the whole
  generator is Spark Column expressions over spark.range, so it scales to
  bench sizes (millions of turns) without serializing through the driver.
- Zipf-ish vocabulary: 3 designated hot terms (per-token prob 2%/1%/0.5% →
  doc-frequency roughly 30-60% of turns at typical doc lengths) + a
  log-uniform tail over ``vocab_size`` words so rare terms have df in {1..5}
  at tiny scale (exercises skip/prune paths).
- a small fraction of empty texts (zero-doc edge, reference KATTA-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_TERMS = ("hotalpha", "hotbeta", "hotgamma")
ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("-", "bash", "search", "browser", "editor")

_U_MOD = 1_000_003  # prime modulus for hash→uniform


def _uniform(*cols) -> "F.Column":
    """Deterministic uniform in [0,1) from hashed columns (JVM-side)."""
    return (F.pmod(F.xxhash64(*cols), F.lit(_U_MOD)).cast("double")) / F.lit(float(_U_MOD))


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    turns_per_conv: int = 20,
    vocab_size: int = 2000,
    max_doclen: int = 120,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_turns`` rows of the transcripts table, fully distributed.

    Every column is a deterministic Column expression of
    (seed, conv_num, turn_idx) — no Python UDFs, no driver data.
    """
    if num_partitions is None:
        num_partitions = max(1, min(256, n_turns // 50_000 + 1))
    df = spark.range(0, n_turns, 1, num_partitions)

    conv_num = (F.col("id") / turns_per_conv).cast("long")
    turn_idx = F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int")
    s = F.lit(seed)

    # doc length: 0 with prob 1%, else 3..max_doclen (skewed toward short)
    u_len = _uniform(s, conv_num, turn_idx, F.lit(0))
    doclen = (
        F.when(u_len < 0.01, F.lit(0))
        .otherwise((F.lit(3) + F.pow(u_len, F.lit(2.0)) * F.lit(max_doclen - 3)).cast("int"))
    )

    # token i of the row: hot terms by fixed per-token probability, else a
    # log-uniform rank over the tail vocabulary ('w0010'..'w{V}').
    def token_expr(i):
        u = _uniform(s, conv_num, turn_idx, F.lit(1), i)
        u2 = _uniform(s, conv_num, turn_idx, F.lit(2), i)
        tail_rank = F.floor(
            F.pow(F.lit(float(vocab_size - 10)), u2) + F.lit(9)
        ).cast("int")
        return (
            F.when(u < 0.020, F.lit(HOT_TERMS[0]))
            .when(u < 0.030, F.lit(HOT_TERMS[1]))
            .when(u < 0.035, F.lit(HOT_TERMS[2]))
            .otherwise(F.concat(F.lit("w"), F.lpad(tail_rank.cast("string"), 5, "0")))
        )

    words = F.transform(F.sequence(F.lit(0), doclen - 1), token_expr)
    text = F.when(doclen <= 0, F.lit("")).otherwise(F.array_join(words, " "))

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), F.pmod(turn_idx, F.lit(4)) + 1)
    tool = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]),
        (F.pmod(F.xxhash64(s, conv_num, turn_idx, F.lit(3)), F.lit(5)) + 1).cast("int"),
    )
    # ts: base epoch + 1h per conversation + 30s per turn — monotone per conv.
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + conv_num * 3600 + turn_idx.cast("long") * 30)

    return df.select(
        F.format_string("conv-%08d", conv_num).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def reference_queries() -> list[dict]:
    """The fixed reference query set for rank-identity checks (FIXTURES.md §2).

    Mirrors the query battery of LuceneComplianceTest.java:111-131 (single
    terms, multi-term, absent term "nothing") plus WAND stressors.
    """
    qs = [
        ("hotalpha", 10),                      # single hot term
        ("hotbeta", 10),
        ("w01999", 10),                        # single rare term
        ("w00011 w00012", 10),                 # two mid-frequency terms
        ("hotalpha w01990", 10),               # hot + rare (WAND stress)
        ("hotalpha hotbeta hotgamma", 10),     # all hot, many ties
        ("hotalpha hotalpha", 10),             # duplicated query term
        ("nothing", 10),                       # absent from corpus → empty
        ("hotalpha w00015 w01985 hotgamma", 10),
        ("w00010 w00013 w00017", 10),
        ("hotalpha", 1),                       # k variations (top-k prefix)
        ("hotalpha", 5),
        ("hotalpha", 100),
        ("hotalpha hotbeta", 25),
        ("w00014 hotbeta", 10),
    ]
    return [
        {"query_id": i, "query": q, "k": k} for i, (q, k) in enumerate(qs)
    ]
