"""BPE vocabulary induction over the corpus — the tokenizer-training step
of a training-data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"), re-expressed Spark-first.

The enabling observation: after ONE corpus-sized pass collapses the corpus
to a (word, freq) table, every BPE merge iteration needs only that
VOCAB-sized table — pair counting is an in-row explode + a vocab-sized
aggregation, and applying the chosen merge is an in-row aggregate() fold.
So the corpus is read once; the V-iteration driver loop runs V small jobs
over a persisted relation whose size is the distinct-word count, never the
corpus (at 100 TB, additionally hash-sample the corpus pass with
``sample_fraction`` — real tokenizer training always samples).

Determinism: the argmax merge is tie-broken (count DESC, left ASC,
right ASC), so the learned merge list is a pure function of the corpus
content — independent of partitioning and cluster size (tested by
re-learning on a repartitioned input).

Encoding with the learned merges (``apply_bpe``) is the classic
rank-order greedy loop per word. That loop is inherently data-dependent
Python, so it runs inside a mapInPandas kernel with the merge table
broadcast via closure and a per-batch word cache (each DISTINCT word is
encoded once per batch — Zipf makes the cache hit rate high); the corpus
never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katta_spark.tokenizer import tokenize_col

END_OF_WORD = "▁"  # can't occur in [a-z0-9]+ analyzed tokens


def _word_freqs(
    docs: DataFrame, id_col: str, text_col: str,
    sample_fraction: float | None,
) -> DataFrame:
    d = docs
    if sample_fraction is not None:
        if not 0 < sample_fraction <= 1:
            raise ValueError("sample_fraction must be in (0, 1]")
        # deterministic md5 survival rule (same family as
        # textops.stratified_sample) — a pure function of the doc id
        thresh = format(int(sample_fraction * 16**8), "08x")
        d = d.where(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < thresh
        )
    toks = d.select(tokenize_col(F.col(text_col)).alias("t"))
    return (
        toks.select(F.explode_outer("t").alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(a: str, b: str):
    """In-row left-to-right non-overlapping merge of adjacent (a, b)."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda out, x: F.when(
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(out, F.array(x))),
    )


def _learn_bpe_driver(
    rows: list, n_merges: int, min_freq: int
) -> list[tuple[str, str, str, int]]:
    """Exact replica of the distributed merge loop over a collected
    (word, freq) list — same pair counting (every adjacent position),
    same argmax tie-break (count DESC, left ASC, right ASC; Python's
    code-point string order == Spark's UTF8 binary order — UTF-8 is
    order-preserving), same left-to-right non-overlapping merge fold as
    :func:`_merge_fold`. Property-tested equal to the distributed loop
    (tests/test_vocab.py)."""
    vocab: list[tuple[list[str], int]] = [
        (list(w) + [END_OF_WORD], int(f)) for w, f in rows
    ]
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for p in zip(syms, syms[1:]):
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_freq:
            break
        merged = a + b
        merges.append((a, b, merged, c))
        for i, (syms, f) in enumerate(vocab):
            if len(syms) < 2:
                continue
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            if len(out) != len(syms):
                vocab[i] = (out, f)
    return merges


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    min_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_fraction: float | None = None,
    driver_vocab_max: int | None = None,
) -> list[tuple[str, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, merged,
    pair_freq)] in rank order. Words are analyzed tokens split into
    characters plus an END_OF_WORD sentinel (Sennrich's '</w>' role: a
    word-final subword is a different unit than the same string
    word-internally). Stops early when the best pair's frequency falls
    below ``min_freq``.

    ONE corpus pass collapses the corpus to the persisted (word, freq)
    relation. When the vocabulary fits the driver budget
    (``driver_vocab_max`` rows, default $KATTA_BPE_DRIVER_VOCAB_MAX or
    2,000,000 — a vocab-sized, bounded collect, the same class as the
    argmax row the old loop already pulled), the V merge iterations run
    as a single driver loop (_learn_bpe_driver) — reference BPE trainers
    are single-process over exactly this table — replacing 2 Spark jobs
    per merge (pair-count argmax + re-persist fold) with zero. Past the
    budget, the distributed per-iteration loop below runs unchanged; the
    two paths are exact replicas of each other.

    Distributed fallback per iteration (vocab-sized relation, persisted):
    in-row adjacent-pair explode weighted by word freq → hash agg → a
    bounded (count DESC, left ASC, right ASC) argmax — ONE driver row —
    then the merge applies as an in-row fold and the relation
    re-persists. No corpus re-scan after the first pass.
    """
    import os

    from pyspark import StorageLevel

    if driver_vocab_max is None:
        driver_vocab_max = int(
            os.environ.get("KATTA_BPE_DRIVER_VOCAB_MAX", "2000000")
        )
    wf = _word_freqs(docs, id_col, text_col, sample_fraction)
    if driver_vocab_max > 0:
        wf = wf.persist(StorageLevel.MEMORY_AND_DISK)
        head = wf.limit(driver_vocab_max + 1).collect()
        if len(head) <= driver_vocab_max:
            wf.unpersist()
            return _learn_bpe_driver(
                [(r["word"], r["freq"]) for r in head], n_merges, min_freq
            )
    syms = wf.select(
        "freq",
        F.concat(
            # array_remove: Java's Pattern.split("", -1) can emit a
            # trailing empty element; symbols are never empty strings
            F.array_remove(F.split(F.col("word"), ""), ""),
            F.array(F.lit(END_OF_WORD)),
        ).alias("syms"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[str, str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                syms.select(
                    "freq",
                    F.explode_outer(
                        F.when(
                            F.size("syms") >= 2,
                            F.transform(
                                F.sequence(F.lit(0), F.size("syms") - 2),
                                lambda i: F.struct(
                                    F.element_at(
                                        F.col("syms"), i + 1
                                    ).alias("a"),
                                    F.element_at(
                                        F.col("syms"), i + 2
                                    ).alias("b"),
                                ),
                            ),
                        )
                    ).alias("p"),
                )
                .where(F.col("p").isNotNull())
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("cnt"))
            )
            best = pairs.orderBy(
                F.desc("cnt"), F.asc("a"), F.asc("b")
            ).limit(1).collect()
            if not best or best[0].cnt < min_freq:
                break
            a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
            merges.append((a, b, a + b, cnt))
            nxt = syms.withColumn("syms", _merge_fold(a, b)).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            nxt.count()  # materialize before dropping the parent
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
        if driver_vocab_max > 0:
            wf.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-order greedy BPE encode of one word (+ sentinel)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) >= 2:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, bpe_tokens): encode each document
    with a learned merge list. Arrow-batched mapInPandas with a per-batch
    distinct-word cache — the merge table travels in the task closure
    (it is n_merges rows), the corpus never shuffles, and the output is
    one row per document.
    """
    ranks = {(a, b): i for i, (a, b, _, _) in enumerate(merges)}
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_col(F.col(text_col)).alias("t")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_words, out_bpe, out_toks = [], [], []
            for words in pdf["t"]:
                enc: list[str] = []
                for w in words:
                    e = cache.get(w)
                    if e is None:
                        e = _encode_word(w, ranks)
                        cache[w] = e
                    enc.extend(e)
                out_words.append(len(words))
                out_bpe.append(len(enc))
                out_toks.append(enc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.array(out_words, dtype="int64"),
                    "n_bpe_tokens": pd.array(out_bpe, dtype="int64"),
                    "bpe_tokens": out_toks,
                }
            )

    return toks.mapInPandas(
        kernel,
        schema=(
            "doc_id long, n_words long, n_bpe_tokens long, "
            "bpe_tokens array<string>"
        ),
    )
