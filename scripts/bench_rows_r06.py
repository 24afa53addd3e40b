"""Per-row micro-bench for round-6 work — times a SUBSET of the frozen
bench.py rows with the same methodology (min-of-2, same SF dir / core
count envs) so before/after deltas can be measured without paying for the
whole suite. Never a replacement for bench.py: the driver times that.

Usage: python scripts/bench_rows_r06.py row [row ...]
Rows: dedup_minhash_lsh dedup_near_pairs decontaminate_fuzzy curate
      boilerplate unigram_lm bigram_lm bpe_learn_apply dsir_weights
      quality_classifier build_ann_index build_ivf_index hybrid_rrf_top10
      simhash dedup_exact substring_dedup
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from katta_spark.session import get_spark
    import katta_spark.textops as tx
    import katta_spark.similarity as sim
    from katta_spark import vocab as kvocab
    from katta_spark import quality_model as qm

    spark = get_spark("bench_rows_r06", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def _bpe():
        merges = kvocab.learn_bpe(docs, n_merges=8)
        return kvocab.apply_bpe(docs, merges).count()

    def _qc():
        model = qm.train_quality_classifier(
            docs.where("doc_id % 41 = 0"), docs.where("doc_id % 41 = 1"),
            n_features=1 << 16, max_iter=12,
        )
        return qm.pareto_filter(qm.score_quality(model, docs)).count()

    def _ann_build():
        import tempfile, shutil
        d = tempfile.mkdtemp(prefix="r06_ann_")
        try:
            t0 = time.time()
            sim.build_ann_index(emb, d, dim=64, planes=6, seed=7)
            return time.time() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def _ivf_build():
        import tempfile, shutil
        from katta_spark.ivf import build_ivf_index
        d = tempfile.mkdtemp(prefix="r06_ivf_")
        try:
            t0 = time.time()
            build_ivf_index(emb, d, dim=64, n_clusters=16, iters=4, seed=7)
            return time.time() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    rows = {
        "dedup_exact": lambda: tx.exact_dedup(docs).count(),
        "dedup_minhash_lsh": lambda: tx.minhash_lsh_pairs(docs).count(),
        "dedup_near_pairs": lambda: tx.near_dup_pairs(docs, threshold=0.2).count(),
        "simhash": lambda: tx.simhash16(docs).count(),
        "unigram_lm": lambda: tx.unigram_lm_scores(docs).count(),
        "bigram_lm": lambda: tx.bigram_lm_scores(docs).count(),
        "boilerplate": lambda: tx.boilerplate_scores(docs).count(),
        "substring_dedup": lambda: tx.substring_dup_spans(docs, k=16).count(),
        "dsir_weights": lambda: tx.dsir_weights(
            docs, docs.where("doc_id % 41 = 0")).count(),
        "bpe_learn_apply": _bpe,
        "quality_classifier": _qc,
        "decontaminate_fuzzy": lambda: tx.decontaminate_fuzzy(
            docs, docs.where("doc_id % 41 = 0"), threshold=0.5).count(),
        "curate": lambda: tx.curate(
            docs, docs.where("doc_id % 41 = 0"), dedup_threshold=0.2).count(),
    }
    want = sys.argv[1:] or list(rows)
    timings = {}
    for name in want:
        if name not in rows:
            print(f"skip unknown row {name}", file=sys.stderr)
            continue
        fn = rows[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"rows": timings, "sf": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
