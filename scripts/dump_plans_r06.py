"""Dump .explain('formatted') for every operator touched in round 6.

Usage: python scripts/dump_plans_r06.py before|after
Writes plans/r06/<name>_<tag>.txt. Uses sf0.01 (plan shape is SF-invariant)
and a small local session so it can run beside other work.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def main() -> None:
    from katta_spark.session import get_spark
    import katta_spark.textops as tx
    from katta_spark import vocab as kvocab

    import katta_spark.similarity as sim

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan_dump_r06", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    bench = docs.where("doc_id % 41 = 0")

    plans = {
        "dedup_minhash_lsh": lambda: tx.minhash_lsh_pairs(docs),
        "minhash_signatures": lambda: tx.minhash_signatures(docs, num_hashes=4),
        "dedup_near_pairs": lambda: tx.near_dup_pairs(docs, threshold=0.2),
        "decontaminate_fuzzy": lambda: tx.decontaminate_fuzzy(docs, bench, threshold=0.5),
        "curate": lambda: tx.curate(docs, bench, dedup_threshold=0.2),
        "boilerplate": lambda: tx.boilerplate_scores(docs),
        "unigram_lm": lambda: tx.unigram_lm_scores(docs),
        "bigram_lm": lambda: tx.bigram_lm_scores(docs),
        "dsir_weights": lambda: tx.dsir_weights(docs, bench),
        "bpe_apply": lambda: kvocab.apply_bpe(
            docs, kvocab.learn_bpe(docs, n_merges=2)
        ),
        "dedup_exact": lambda: tx.exact_dedup(docs),
        "substring_dedup": lambda: tx.substring_dup_spans(docs, k=16),
        "chunk_documents": lambda: tx.chunk_documents(docs, max_tokens=64, stride=48),
        "decontaminate": lambda: tx.decontaminate(docs, bench),
        "ann_cosine_top20": lambda: sim.cosine_topk(emb, 0, 20),
        "ann_lsh_signatures": lambda: sim.lsh_signatures(emb, dim=64),
    }
    for name, fn in plans.items():
        try:
            df = fn()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # pragma: no cover
            txt = f"ERROR: {e}"
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", f"{name}_{TAG}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
