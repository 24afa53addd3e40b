"""Probe: zstd shuffle compression LEVEL 1 (Spark default) vs 3 —
decided on DETERMINISTIC byte counts, not wall clock.

Higher zstd levels trade ALU cycles (which scale ~0.88x/core on this
host, BENCH/host_probes.json) for wire/bus bytes (which stop scaling
past ~4 busy cores) — the right direction on a bandwidth-ceilinged box
AND on a network-bound real cluster, IF the shuffle payload actually
compresses better at the higher level. The build's shuffle rows are
(th, doc_id, sd) fixed-width longs — term strings are hashed out
pre-shuffle — so the match-window/ search-depth gains that higher zstd
levels buy on text may simply not exist here. This probe measures that
instead of guessing, like the zbuf probe (scaling_probe_zbuf*.json)
that kept the 32k buffer default.

Wall-clock A/B at two cluster sizes (the r4 approach, see git history
of this file) needs a clean host window — this box has a documented
~200x memory-bus throttle mode (BENCH/HOST_LOG.md) that can eat a whole
session. Compressed BYTES are window-independent: the probe rebuilds
the exact shuffle payload (the real `_docs_with_ids` → `token_rows`
pipeline on a slice of the scaling corpus), cuts it into per-
(map task, reducer) segments exactly as ShuffleBlockFetcher streams
them (each segment is its own zstd stream), and benchmarks zstd -b1 /
-b3 over the segment files: total compressed bytes per level plus the
level's compression speed. Segment partitioning uses xxhash64 in place
of Spark's murmur3 HashPartitioning — a different but statistically
identical randomization of (shard_id, th % salt), which preserves the
per-stream entropy structure the levels compete on.

Validation anchor (bounded): the real run's 1,535 MB total shuffle
write (BENCH/BASELINE.md work-parity table) covers ALL exchanges — the
token exchange simulated here PLUS the second repartition of already-
encoded varbyte blobs (ratio ~1x by construction) and the dictionary
exchange — so the simulated token-exchange ratio (measured 3.07x at
level 1) is expected to sit well above the blended 1.77x, and the
blended figure caps how much any shuffle-codec change can matter.

Decision rule (documented in BENCH/BASELINE.md): adopt level 3 only if
it saves >= 10% of wire bytes — below that, the extra compression CPU
(level 3 is typically ~1.5-2x slower per byte) costs more bus-adjacent
ALU time than the saved bytes buy back at the 0.37x/core fabric ratio.

Writes BENCH/scaling_probe_zlevel.json and prints one JSON line.

Usage: python scripts/probe_zlevel.py  [env: KATTA_ZPROBE_FILES=16
(input part files sampled), KATTA_ZPROBE_SHUFFLE=64 reducers,
KATTA_ZPROBE_SALT=1024]
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_scaling as bs  # noqa: E402

NUM_SHARDS = 32  # headline harness shape (scripts/bench_scaling.py)


def _zstd_bench(level: int, files: list[str]) -> dict:
    """Run `zstd -b<level>` over the segment files; parse the summary."""
    res = subprocess.run(
        ["zstd", f"-b{level}", *files],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    text = res.stdout + res.stderr
    # "...:   960000 ->   214947 (x4.466),  265.1 MB/s,  400.7 MB/s"
    m = None
    for m in re.finditer(
        r"(\d+) ->\s*(\d+) \(x([\d.]+)\),\s*([\d.]+) MB/s(?:,\s*([\d.]+) MB/s)?",
        text,
    ):
        pass
    if m is None:
        raise RuntimeError(f"unparseable zstd -b output:\n{text[-2000:]}")
    raw, comp, ratio, cspeed, dspeed = m.groups()
    return {
        "raw_bytes": int(raw),
        "compressed_bytes": int(comp),
        "ratio": float(ratio),
        "compress_mb_s": float(cspeed),
        "decompress_mb_s": float(dspeed) if dspeed else None,
    }


def main() -> None:
    from pyspark.sql import functions as F

    from katta_spark.build import _docs_with_ids, token_rows
    from katta_spark.session import get_spark

    n_files = int(os.environ.get("KATTA_ZPROBE_FILES", "16"))
    shuffle_parts = int(os.environ.get("KATTA_ZPROBE_SHUFFLE", "64"))
    salt = int(os.environ.get("KATTA_ZPROBE_SALT", "1024"))

    src = os.path.join(
        tempfile.gettempdir(), f"katta_scaling_tx_{bs.TURNS}"
    )
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        from katta_spark.synth import synth_transcripts

        spark = get_spark("zprobe_gen", master="local[16]")
        synth_transcripts(
            spark, bs.TURNS, seed=42, num_partitions=128
        ).write.mode("overwrite").parquet(src)
        spark.stop()
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))[:n_files]

    # the exact pre-shuffle pipeline of the scaling job: doc ids + shard
    # assignment, tokenize, posexplode, th = xxhash64(term), sd packing —
    # plus the map-partition id and the reducer bucket each row shuffles to
    spark = get_spark("zprobe_extract", master="local[8]")
    docs = _docs_with_ids(
        spark.read.parquet(*parts),
        NUM_SHARDS,
        ("conv_id", "turn_idx"),
        "text",
        None,
    )
    # token_rows has no shard_id column (it is packed into sd) — recompute
    # the bucket key from the packed slot exactly as the exchange sees it:
    # the exchange keys on (shard_id, th % salt) BEFORE packing, and
    # shard_id = sd >> 42.
    tr = token_rows(docs)
    rows = (
        tr.withColumn("mapper", F.spark_partition_id())
        .withColumn(
            "reducer",
            F.pmod(
                F.xxhash64(
                    F.shiftright(F.col("sd"), 42),
                    F.pmod(F.col("th"), F.lit(salt)),
                ),
                F.lit(shuffle_parts),
            ).cast("int"),
        )
    )
    pdf = rows.toPandas()
    spark.stop()

    th = pdf["th"].to_numpy(np.int64)
    doc = pdf["doc_id"].to_numpy(np.int64)
    sd = pdf["sd"].to_numpy(np.int64)
    mapper = pdf["mapper"].to_numpy(np.int32)
    reducer = pdf["reducer"].to_numpy(np.int32)
    n = th.size

    segdir = tempfile.mkdtemp(prefix="katta_zprobe_seg_")
    # stable sort by (mapper, reducer) keeps input order INSIDE each
    # segment — exactly the order the map task writes its spill runs
    order = np.lexsort((np.arange(n), reducer, mapper))
    key = mapper[order].astype(np.int64) * shuffle_parts + reducer[order]
    bounds = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    files = []
    for s, e in zip(starts, ends):
        seg = np.zeros(((e - s), 4), dtype="<i8")  # 8B null word + 3 slots
        idx = order[s:e]
        seg[:, 1] = th[idx]
        seg[:, 2] = doc[idx]
        seg[:, 3] = sd[idx]
        f = os.path.join(segdir, f"seg_{key[s]:06d}.bin")
        with open(f, "wb") as fh:
            fh.write(seg.tobytes())
        files.append(f)

    out: dict = {
        "turns_sampled_files": n_files,
        "token_rows": int(n),
        "segments": len(files),
        "raw_mb": round(n * 32 / 1e6, 1),
        "levels": {},
    }
    for lvl in (1, 3):
        out["levels"][f"l{lvl}"] = _zstd_bench(lvl, files)
    shutil.rmtree(segdir, ignore_errors=True)

    l1 = out["levels"]["l1"]
    l3 = out["levels"]["l3"]
    out["wire_saving_frac_l3_vs_l1"] = round(
        1 - l3["compressed_bytes"] / l1["compressed_bytes"], 4
    )
    out["compress_speed_ratio_l3_vs_l1"] = round(
        l3["compress_mb_s"] / l1["compress_mb_s"], 3
    )
    out["verdict"] = (
        "adopt level 3"
        if out["wire_saving_frac_l3_vs_l1"] >= 0.10
        else "keep level 1 (Spark default)"
    )
    with open(
        os.path.join(REPO, "BENCH", "scaling_probe_zlevel.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
