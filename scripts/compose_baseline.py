"""Compose BENCH/BASELINE.md from the session's scaling-suite JSONs.

scripts/bench_scaling.py archives each suite's raw result as
BENCH/scaling_<tag>.json (KATTA_SCALING_TAG); scripts/host_probes.py
writes BENCH/host_probes.json. This script assembles the full
two-cluster-size evidence report from those artifacts so the final
BASELINE.md cites every suite of the round (headline shape, small-host
shape, input-size trend) plus the host-resource probes, instead of only
whichever suite ran last.

Usage: python scripts/compose_baseline.py
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "BENCH")


def _load(name: str) -> dict | None:
    path = os.path.join(BENCH, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _median_inv(suite: dict) -> dict:
    invs = sorted(suite["invocations"], key=lambda r: r["eff"])
    return invs[len(invs) // 2]


def _inv_table(suite: dict, labels: list[str] | None = None,
               med: dict | None = None) -> str:
    med = med or _median_inv(suite)
    rows = []
    for i, r in enumerate(suite["invocations"]):
        best_lo, best_hi = max(r["all_low"]), max(r["all_high"])
        mark = " ← median (headline)" if r is med else ""
        label = labels[i] if labels else str(i + 1)
        rows.append(
            f"| {label} | {best_lo:,.0f} | {best_hi:,.0f} | {r['eff']:.3f} "
            f"| {r['ceiling_eff']:.3f} | {r['normalized_eff']:.3f} |{mark}"
        )
    return "\n".join(rows)


def _shape(suite: dict) -> str:
    lo, hi, c = (suite["low_executors"], suite["high_executors"],
                 suite["executor_cores"])
    return f"{lo}x{c} vs {hi}x{c} cores"


def main() -> None:
    head_a = _load("scaling_2m_headline_a.json")
    head_b = _load("scaling_2m_headline_b.json")
    head_c = _load("scaling_2m_headline_c.json")
    head_d = _load("scaling_2m_headline_d.json")
    head_e = _load("scaling_2m_headline_e.json")
    small = _load("scaling_2m_smallhost.json")
    # Optional final-HEAD re-measurement of the small-host shape (the
    # original suite 2 predates the InferFiltersFromGenerate dictionary
    # fix, so a re-run is a SEPARATE suite — different job, no pooling).
    small_b = _load("scaling_2m_smallhost_b.json")
    trend4 = _load("scaling_4m_trend.json")
    probes = _load("host_probes.json")
    assert head_a and head_b, "headline suite JSONs missing"

    # The headline shape ran as TWO full 3-invocation campaigns in this
    # session's CLEAN windows (B re-measured after the ceiling best-of-2
    # fix); the headline is the median of ALL SIX — no window-shopping.
    # A third campaign (C) ran late in the session under measured
    # external host load (load-avg 6-9 with no local process) — it is
    # archived and fully disclosed below, with the merged median shown
    # both ways, but excluded from the headline per the same clean-window
    # precondition every other suite obeyed.
    import statistics

    campaigns = [c for c in (head_a, head_b) if c]
    merged_invs = [r for c in campaigns for r in c["invocations"]]
    labels = [
        f"{tag}{i + 1}"
        for tag, c in zip("AB", (head_a, head_b))
        if c
        for i in range(len(c["invocations"]))
    ]
    head = {**head_b, "invocations": merged_invs}
    head["median_eff"] = round(
        statistics.median(r["eff"] for r in merged_invs), 3
    )
    head["median_normalized_eff"] = round(
        statistics.median(r["normalized_eff"] for r in merged_invs), 3
    )
    by_eff = sorted(merged_invs, key=lambda r: r["eff"])
    med = by_eff[len(by_eff) // 2]
    # Campaign E (optional): a later clean-window campaign of the SAME
    # final-HEAD job (build path git-verified byte-identical to D's
    # commit), so D and E invocations legitimately pool into one median.
    if head_d and head_e:
        merged = head_d["invocations"] + head_e["invocations"]
        head_d = {**head_d, "invocations": merged}
        head_d["median_eff"] = round(
            statistics.median(r["eff"] for r in merged), 3
        )
        head_d["median_normalized_eff"] = round(
            statistics.median(r["normalized_eff"] for r in merged), 3
        )

    d_labels = (
        [f"D{i + 1}" for i in range(3)] + [f"E{i + 1}" for i in range(3)]
        if head_d and head_e
        else ([f"D{i + 1}" for i in range(len(head_d["invocations"]))]
              if head_d else [])
    )
    d_tag = "campaigns D + E" if head_e else "campaign D"
    parts: list[str] = []
    parts.append(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Generated {datetime.now(timezone.utc).isoformat()} by
scripts/compose_baseline.py from the suite artifacts in BENCH/
(scaling_*.json, host_probes.json; produced by scripts/bench_scaling.py
and scripts/host_probes.py).

The north rule requires index-build throughput scaling efficiency >= 0.8
between clusters of N and 4N executors. No real cluster exists in this
sandbox (driver instruction), so the SAME spark-submit --py-files build
job — identical input parquet (synthetic transcript turns, seed 42),
identical layout (num_shards=32, shuffle.partitions=64, zstd shuffle
compression) — runs in Spark local-cluster mode (real separate executor
JVMs of a fixed shape) at N and 4N executors, the whole process tree
CPU-pinned (taskset) to exactly the cluster's core budget, with an
untimed ~2% hash-sampled warm-up build per submit (fresh JVMs otherwise
put constant JIT/fork/codegen cold-start into the wall clock, biasing
against the shorter big-cluster run).

**Every suite headline is the MEDIAN of its full invocations** (each
invocation = best of K alternated trials per level — best-within-
invocation rejects single-trial host interference; median-across-
invocations avoids headline-shopping the luckiest window, which the
r2/r3 reviews flagged). The ALU ceiling pair is itself best-of-2 per
level inside each invocation window (a single interfered ceiling probe
previously produced a >1.0 "ceiling efficiency" artifact).

## Verdict summary (details per suite below)

| suite | shape | turns | median raw eff | median normalized | >= 0.8 |
|---|---|---|---|---|---|
| 1 (A+B, mid-round code) | {_shape(head)} | {head['turns']:,} | {head['median_eff']:.3f} | {head['median_normalized_eff']:.3f} | {'PASS' if head['median_eff'] >= 0.8 else 'FAIL'} |"""
                 + (f"""
| 1c ({d_tag.replace('campaigns ', '').replace('campaign ', '')}, final HEAD) | {_shape(head_d)} | {head_d['turns']:,} | {head_d['median_eff']:.3f} | {head_d['median_normalized_eff']:.3f} | {'PASS' if head_d['median_eff'] >= 0.8 else 'FAIL'} |""" if head_d else "")
                 + (f"""
| 2 (small-host) | {_shape(small)} | {small['turns']:,} | {small['median_eff']:.3f} | {small['median_normalized_eff']:.3f} | {'PASS' if small['median_eff'] >= 0.8 else 'FAIL'} |""" if small else "")
                 + (f"""
| 2b (small-host, final HEAD) | {_shape(small_b)} | {small_b['turns']:,} | {small_b['median_eff']:.3f} | {small_b['median_normalized_eff']:.3f} | {'PASS' if small_b['median_eff'] >= 0.8 else 'FAIL'} |""" if small_b else "")
                 + (f"""
| 3 (input trend) | {_shape(trend4)} | {trend4['turns']:,} | {trend4['median_eff']:.3f} | {trend4['median_normalized_eff']:.3f} | {'PASS' if trend4['median_eff'] >= 0.8 else 'FAIL'} |""" if trend4 else "")
                 + f"""

The 16-vCPU-budget suites (1, 1c, 3) plateau at ~0.65-0.73 raw because
this ONE box's memory bus stops scaling past ~4 busy cores (host probes
below) — normalized against the concurrently-measured ALU ceiling they
sit at 0.77-0.86. Suite 2, the only budget where the box can actually
give 4N executors 4x the shared resources (the situation the north
rule's wording describes), passes outright at 0.849 raw.

## Suite 1 — headline shape: {_shape(head)}, {head['turns']:,} turns

TWO full 3-invocation campaigns of the identical job ran in this
session's clean windows (campaign A before the ceiling-probe best-of-2
fix — its interfered single-probe ceilings produced the A3 >1.0-adjacent
artifact; campaign B after it). The headline merges ALL SIX invocations
— reporting only the better campaign would be the window-shopping the
r2/r3 reviews flagged. (A third campaign, C, is disclosed below — run
under measured external host load and excluded from the headline.)

| invocation | tp(N) best | tp(4N) best | raw eff | ALU ceiling eff | normalized |
|---|---|---|---|---|---|
{_inv_table(head, labels=labels, med=med)}

**Headline (median of {len(merged_invs)} invocations): raw scaling efficiency =
tp(4N) / (4 x tp(N)) = {head['median_eff']:.3f}** (target >= 0.8:
{'PASS' if head['median_eff'] >= 0.8 else 'FAIL'}); median normalized
efficiency vs the concurrently-measured host ALU ceiling =
{head['median_normalized_eff']:.3f}. The spread of the ceiling column
itself (0.70-1.14 across windows, incl. one normalized > 1.0 where the
build out-scaled "pure ALU") shows the host interference is random and
large relative to the 0.1 gap to target — which is why the work-parity
table and host probes below, not any single wall-clock ratio, are the
load-bearing evidence at this budget.

Upper-median-invocation detail: tp(N) best {max(med['all_low']):,.0f}
(trials {', '.join(f"{t:,.0f}" for t in med['all_low'])}),
tp(4N) best {max(med['all_high']):,.0f}
(trials {', '.join(f"{t:,.0f}" for t in med['all_high'])}).""")

    if head_c:
        c_invs = head_c["invocations"]
        all9 = merged_invs + c_invs
        all9_med = round(statistics.median(r["eff"] for r in all9), 3)
        c_rows = "\n".join(
            f"| C{i + 1} | {max(r['all_low']):,.0f} | "
            f"{max(r['all_high']):,.0f} | {r['eff']:.3f} | "
            f"{r['normalized_eff']:.3f} |"
            for i, r in enumerate(c_invs)
        )
        parts.append(f"""
### Discarded campaign C (disclosed, archived: scaling_2m_headline_c.json)

A third 3-invocation campaign ran late in the session (on the final
HEAD). Its whole window violated the clean-window precondition the other
suites obeyed: the host showed load-average 6-9 with NO local process
running (the documented external-interference mode; measured via uptime
+ ps during and after the run), tp(4N) trials were depressed to
25-46k/s vs 52-62k/s in campaign B — and one invocation additionally
overlapped a local test-suite run. Shuffle bytes and task counts in C's
event logs are identical to A/B (same work), only wall clock degraded.

| invocation | tp(N) best | tp(4N) best | raw eff | normalized |
|---|---|---|---|---|
{c_rows}

Campaign C median raw: {head_c['median_eff']:.3f}. Merged over all NINE
invocations the median would be {all9_med:.3f} — reported here for
completeness; the headline above excludes C because its windows fail the
same load screen under which every other number in this file was taken
(gate verdict unchanged either way: FAIL at this budget).""")

    if head_d:
        dmed = _median_inv(head_d)
        parts.append(f"""
### Suite 1c — the SAME shape re-measured on the final round-5 HEAD ({d_tag})

Campaigns A/B measured the mid-round code. After them the build changed
materially — the dictionary phase lost a duplicated corpus tokenize
(an inferred pre-Generate filter re-ran the regex split per row; the
explode_outer fix halved that job) — so the shape was re-measured as a
full fresh 3-invocation campaign on the shipped HEAD in a clean window.
It is reported separately, not merged into the A+B median: a different
job's invocations cannot share a median with the old one. Every commit
after campaign D touches only query/textops/docs/tests — on the shipped
HEAD build.py, tokenizer.py and scripts/scaling_build.py are
byte-identical to D's, and codec.py differs only by one added function
(u64_to_f64_order, the grouped-search display decode) that no build
code path calls — so these numbers describe exactly the code being
judged.{" The E rows are a later clean-window campaign of the same final-HEAD job from a later session of this round — build path git-diff-verified identical — pooled with D into one median." if head_e else ""}

| invocation | tp(N) best | tp(4N) best | raw eff | ALU ceiling eff | normalized |
|---|---|---|---|---|---|
{_inv_table(head_d, labels=d_labels)}

**Final-HEAD median raw scaling efficiency =
{head_d['median_eff']:.3f} (target >= 0.8:
{'PASS' if head_d['median_eff'] >= 0.8 else 'FAIL'}); median
normalized = {head_d['median_normalized_eff']:.3f}.** Median-invocation
detail: tp(N) best {max(dmed['all_low']):,.0f}, tp(4N) best
{max(dmed['all_high']):,.0f}.""")

    if small:
        smed = _median_inv(small)
        parts.append(f"""
## Suite 2 — small-host shape: {_shape(small)}, {small['turns']:,} turns

The identical job and harness at half the executor width (N = 1x2-core
executor vs 4N = 4x2-core executors, an 8-vCPU total budget on the
32-vCPU box). At this budget the host's shared resources are NOT
saturated at either level (see host probes below), so this is the
measurement where the box can actually supply 4N executors with 4x the
resources — the situation the north rule's wording (clusters of N vs 4N
executors) describes.

| invocation | tp(N) best | tp(4N) best | raw eff | ALU ceiling eff | normalized |
|---|---|---|---|---|---|
{_inv_table(small)}

**Median raw scaling efficiency = {small['median_eff']:.3f}
(target >= 0.8: {'PASS' if small['median_eff'] >= 0.8 else 'FAIL'});
median normalized = {small['median_normalized_eff']:.3f}.**
Median-invocation detail: tp(N) best {max(smed['all_low']):,.0f},
tp(4N) best {max(smed['all_high']):,.0f}.""")

    if small_b:
        sbmed = _median_inv(small_b)
        parts.append(f"""
### Suite 2b — the SAME small-host shape re-measured on the final
round-5 HEAD

Suite 2 above measured the mid-round job (it predates the
InferFiltersFromGenerate dictionary fix that campaign D's preamble
describes), so the shape was re-measured as a fresh
{len(small_b['invocations'])}-invocation campaign on the shipped HEAD.
It is reported separately, not merged into suite 2's median: a
different job's invocations cannot share a median.

| invocation | tp(N) best | tp(4N) best | raw eff | ALU ceiling eff | normalized |
|---|---|---|---|---|---|
{_inv_table(small_b)}

**Final-HEAD small-host median raw scaling efficiency =
{small_b['median_eff']:.3f} (target >= 0.8:
{'PASS' if small_b['median_eff'] >= 0.8 else 'FAIL'}); median
normalized = {small_b['median_normalized_eff']:.3f}.**
Median-invocation detail: tp(N) best {max(sbmed['all_low']):,.0f},
tp(4N) best {max(sbmed['all_high']):,.0f}.""")

    if trend4:
        parts.append(f"""
## Suite 3 — input-size trend: {_shape(trend4)}, {trend4['turns']:,} turns

| invocation | tp(N) best | tp(4N) best | raw eff | ALU ceiling eff | normalized |
|---|---|---|---|---|---|
{_inv_table(trend4)}

Median raw {trend4['median_eff']:.3f}, normalized
{trend4['median_normalized_eff']:.3f}. Doubling the input from 2M to 4M
turns holds tp(4N) (best {max(_median_inv(trend4)['all_high']):,.0f}/s)
while the low-level run doubles its time-on-the-saturated-bus — the
per-build fixed tail amortizes away but the memory-bus share (below)
does not, so raw efficiency at the 16-vCPU budget plateaus in the high
0.6s/low 0.7s regardless of input size. (r4 session, same harness:
1M turns median 0.670, 2M 0.726.)""")

    mlo = head["work_parity"]["low"]
    mhi = head["work_parity"]["high"]
    parts.append(f"""
## Work parity at N vs 4N (host-noise-immune accounting)

Per-run executor task metrics, parsed from the run's own Spark event log
(campaign B's median invocation's best trials):

| metric | N | 4N | 4N / N |
|---|---|---|---|
| executor CPU (s) | {mlo['cpu_sec']:,.0f} | {mhi['cpu_sec']:,.0f} | {mhi['cpu_sec'] / mlo['cpu_sec']:.2f} |
| executor run time (s) | {mlo['run_sec']:,.0f} | {mhi['run_sec']:,.0f} | {mhi['run_sec'] / mlo['run_sec']:.2f} |
| shuffle write (MB) | {mlo['shuffle_write_mb']:,.0f} | {mhi['shuffle_write_mb']:,.0f} | {mhi['shuffle_write_mb'] / mlo['shuffle_write_mb']:.2f} |
| shuffle read (MB) | {mlo['shuffle_read_mb']:,.0f} | {mhi['shuffle_read_mb']:,.0f} | {mhi['shuffle_read_mb'] / mlo['shuffle_read_mb']:.2f} |
| tasks | {mlo['tasks']} | {mhi['tasks']} | {mhi['tasks'] / mlo['tasks']:.2f} |

Equal shuffle bytes and near-equal CPU-seconds per row at both cluster
sizes: the 4N cluster executes the SAME work — no stage does extra
per-row work at 4N, no skew appears, no partition is reshaped. The
wall-clock gap is therefore contention for a shared host resource, which
the probes below identify, not dataflow overhead. On a real 4N-executor
cluster that resource (memory channels) scales with the executor count —
which this single box cannot emulate.""")

    lo, hi = head["low"], head["high"]
    phase_rows = []
    for ph in sorted(set(lo["phases"]) | set(hi["phases"])):
        a, b = lo["phases"].get(ph), hi["phases"].get(ph)
        if not a or not b or a < 1.0:
            continue
        phase_rows.append(
            f"| {ph} | {a} | {b} | {a / b:.1f}x | {a / b / 4:.2f} |"
        )
    parts.append("""
## Per-phase scaling (campaign B median invocation's best trials)

Phases overlap via driver threads, so phase times sum past the wall
clock.

| phase | N (s) | 4N (s) | speedup | eff |
|---|---|---|---|---|
""" + "\n".join(phase_rows) + """

The corpus-sized phases (encode+write, dictionary) carry the scaling;
phase3_stats is one vocab-sized job of mostly fixed scheduling overhead
(2-5 s at either cluster size), constant in input size.""")

    if probes:
        alu, mem = probes["alu"], probes["memstream"]

        def _best(p: dict, procs: int) -> float:
            return max(
                r["units_per_core_sec"] for r in p["runs"]
                if r["procs"] == procs
            )

        mem4, mem16 = _best(mem, 4), _best(mem, 16)
        parts.append(f"""
## Host probes — WHAT bounds the 16-vCPU-budget ratio (scripts/host_probes.py)

Two Spark-free micro-probes, P taskset-pinned processes at P=4 vs P=16,
alternated best-of-2 (BENCH/host_probes.json):

| probe | best per-core rate P=4 | P=16 | ratio (16 vs 4 busy) | max steal frac |
|---|---|---|---|---|
| ALU busy-loop (cache-resident) | {_best(alu, 4):,.0f} | {_best(alu, 16):,.0f} | {alu['per_core_ratio_16_vs_4']:.3f} | {alu['max_steal_frac']:.4f} |
| memory stream (memcpy 512 MB/iter) | {mem4:.2f} ({mem4 * 0.512:.1f} GB/s) | {mem16:.2f} ({mem16 * 0.512:.1f} GB/s) | {mem['per_core_ratio_16_vs_4']:.3f} | {mem['max_steal_frac']:.4f} |

Reading: pure cache-resident compute scales near-cleanly —
{alu['per_core_ratio_16_vs_4']:.2f}x per-core rate with 16 busy vCPUs vs
4, negligible hypervisor steal in clean runs (consistent with the Spark
ALU ceiling job's ~0.9 efficiency in clean windows under the full
harness). The memory bus does not: per-core streaming
bandwidth at 16 cores is {mem['per_core_ratio_16_vs_4']:.2f}x the 4-core
rate — aggregate bandwidth barely grows past the 4-core level
(~{4 * 0.512 * mem4:.0f} GB/s), and heavy streaming is the one probe
that induces hypervisor steal (up to {mem['max_steal_frac']:.2f}/busy
core), i.e. the host actively throttles saturated memory traffic. An
index build moves corpus-sized bytes (tokenize → shuffle write/read →
lexsort → encode → parquet), so the fraction of its work that sits on
the bus cannot speed up past the bus — on ONE box. That is exactly the
resource a real 4N-executor cluster multiplies by 4N (each executor
brings its own memory channels), and why Suite 2 — the budget at which
the bus is NOT saturated — meets the 0.8 target while the 16-vCPU-budget
suite plateaus at ~0.70 raw: the plateau measures the box, not the
dataflow. (A map-side combine of repeated (term, doc) occurrences was
evaluated to cut shuffle bytes further: the measured token duplication
factor on this corpus is 1.31x, so it saves <=24% of shuffle rows while
adding a corpus-sized hash-aggregation pass — net more bus traffic,
rejected. The stronger variant — encoding FULL partial postings per
input partition and shuffling ENCODED_SCHEMA rows merged reduce-side by
the compaction kernel (legal: a document's tokens never split across
input partitions, so partials are doc-disjoint exactly like compaction
inputs) — was analyzed on byte math and rejected too: docIDs are random
64-bit hashes, so each posting's doc delta stays ~8 incompressible
bytes in the partial blob, the token row is already the 3-word
UnsafeRow minimum (th, doc, packed shard|dl|pos), and the combine
therefore saves only the tf/dl/pos share of the wire (~15-30%) while
doubling the Python encode CPU (encode map-side + decode-merge-encode
reduce-side) — on a bus whose measured constraint is total traffic,
that trade moves bytes into CPU-side memory traffic and loses. A map-side sort by term hash to raise zstd shuffle
compressibility was likewise evaluated: simulating the per-reducer wire
streams byte-exactly shows the natural posexplode order already
compresses ~1.9x — matching the measured 1,535 MB wire volume — because
term duplication survives hash bucketing, and a full sort recovers only
~8% more wire bytes while adding a corpus-sized JVM sort pass; net more
bus traffic, rejected. A larger zstd stream buffer — 512k vs the 32k
default — was A/B-probed at 1M turns: wire bytes IDENTICAL at both
settings (scaling_probe_zbuf*.json; the buffer chunks the stream, it is
not the compression match window), no change kept. A higher zstd shuffle
compression LEVEL — 3 vs the Spark-default 1 — was probed on
DETERMINISTIC byte counts (scripts/probe_zlevel.py rebuilds the token
exchange's per-(map,reducer) zstd streams byte-faithfully from the real
pre-shuffle pipeline and benchmarks both levels on them, window-immune
where a wall-clock A/B is not): level 3 recovers only 5.5% of the token-
exchange wire bytes (ratio 3.25x vs 3.07x; scaling_probe_zlevel.json) —
below the 10% adoption threshold, and diluted further because the
job's OTHER exchanges (already-encoded varbyte blobs, ratio ~1x)
share the 1,535 MB total — no change kept.)""")

    # Throttle dose-response: one controlled invocation of the SAME
    # final-HEAD job per distinct measured host-bandwidth regime.
    thr = _load("scaling_2m_probe_throttled2gbs.json")
    disc = _load("scaling_2m_headline_e_attempt1_discarded.json")
    if thr and head_d and disc:
        t_inv = thr["invocations"][0]
        d_raw = json.loads(open(os.path.join(
            BENCH, "scaling_2m_headline_d.json")).read())
        parts.append(f"""
## Throttle dose-response — raw efficiency tracks the HOST, normalized does not

The hypervisor memory-bus throttle (BENCH/HOST_LOG.md) varies by hours;
the build code has been byte-identical (git-verified) across every run
below. Plotting measured raw efficiency of the SAME 2M-turn 1x4-vs-4x4
job against the window's measured sustained stream bandwidth:

| window (sustained memcpy) | campaign | raw eff | normalized eff (vs concurrent ceiling) | tp 1x4 (turns/s) | tp 4x4 |
|---|---|---|---|---|---|
| ~0.15-0.35 GB/s (deep throttle) | discarded E attempt, session g | {disc['median_eff']:.3f} (median of 3) | {disc['median_normalized_eff']:.3f} | {disc['low']['turns_per_sec']:,.0f} | {disc['high']['turns_per_sec']:,.0f} |
| ~1.7-2.8 GB/s (partial throttle) | single-invocation probe, session i | {t_inv['eff']:.3f} | {t_inv['normalized_eff']:.3f} | {thr['low']['turns_per_sec']:,.0f} | {thr['high']['turns_per_sec']:,.0f} |
| clean (~18 GB/s) | campaign D median | {d_raw['median_eff']:.3f} | {d_raw['median_normalized_eff']:.3f} | {d_raw['low']['turns_per_sec']:,.0f} | {d_raw['high']['turns_per_sec']:,.0f} |

Raw efficiency is monotone in host bandwidth; NORMALIZED efficiency —
the same wall-clocks divided by the ceiling job measured concurrently in
the same window — is flat ({t_inv['normalized_eff']:.3f} throttled vs
{d_raw['median_normalized_eff']:.3f} clean). The mechanism is directly
visible in the throughput columns: the 1-executor run is
window-invariant across all three regimes
({disc['low']['turns_per_sec']:,.0f} / {thr['low']['turns_per_sec']:,.0f}
/ {d_raw['low']['turns_per_sec']:,.0f} turns/s — one executor does not
saturate even a deeply throttled bus), while the 4-executor run alone
pays the throttle, monotonically
({disc['high']['turns_per_sec']:,.0f} / {thr['high']['turns_per_sec']:,.0f}
/ {d_raw['high']['turns_per_sec']:,.0f}). Work parity holds in every
window (identical 1,535 MB shuffle both sides, ~equal CPU-seconds). A
quantity that (a) moves with a host knob the job cannot see, (b) stays
fixed when that knob is normalized out, and (c) leaves per-executor
work and bytes unchanged, is measuring the box, not the dataflow — on a
real 4N-executor cluster each executor brings its own memory channels,
which is the small-host suite's regime (PASS 0.849).""")

    parts.append("""
## Design properties that carry the scaling onto a real cluster

- one corpus-sized shuffle total of fixed-width int rows (term strings
  replaced by xxhash64 pre-shuffle; shard_id+doclen+token position packed
  into ONE long slot so positional postings add zero shuffle width);
- salted hash repartition (shard_id, th % salt) with slices >> partitions
  (straggler-free balance); in-kernel numpy lexsort + one-pass vectorized
  multi-list encode; 3-column packed token rows;
- per-shard hash document spread bounds any single term's postings by
  df/num_shards;
- work parity proven above: no stage does extra per-row work at 4N.

Reference (sgroschupf/katta) publishes no absolute throughput numbers —
its performance artifacts are measurement harnesses
(LuceneSearchPerformanceTest.java:20-45,
LoadTestMasterOperation.java:158-190); the binding targets come from
BASELINE.json. See BENCH_r*.json for the per-round headline-suite
timings at sf0.1 and BENCH/RAMP.md for the load-ramp analog.

Round history (headline basis changed in r4 to median-of-invocations at
2M turns): r01 eff 0.577 (best-of), r02 0.546 (best-of), r03 0.708 best
/ 0.661 median of 3 invocations at 1M turns; r04 0.707 median at 2M
turns (normalized 0.793). r05 adds the fixed best-of-2 ceiling probe,
the small-host suite, the 4M trend suite, and the host probes; its
final-HEAD campaign D medians 0.731 raw / 0.861 normalized at the
16-vCPU budget, and the small-host (8-vCPU) shape — the only budget on
this box where 4N executors actually get 4x the shared resources —
PASSES at 0.849 raw.""")

    with open(os.path.join(BENCH, "BASELINE.md"), "w") as f:
        f.write("\n".join(parts) + "\n")
    print(json.dumps({
        "headline_median_eff": head["median_eff"],
        "headline_median_normalized": head["median_normalized_eff"],
        "smallhost_median_eff": small and small["median_eff"],
        "smallhost_finalhead_median_eff": small_b and small_b["median_eff"],
        "trend4m_median_eff": trend4 and trend4["median_eff"],
    }))


if __name__ == "__main__":
    main()
