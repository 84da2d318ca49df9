#!/usr/bin/env python
"""Two-parallelism scaling study — the sandbox stand-in for the north
rule's N vs 4N executor-cluster criterion (BASELINE.json: scaling
efficiency >= 0.8 between cluster sizes).

No real cluster exists here, so the same job runs on the same input at
local[N] and local[4N] (default 8 vs 32 cores, shuffle partitions scaled to
match). Each level runs in its OWN subprocess (one SparkSession per
process), workers are import-warmed before timing, and levels are
interleaved round-robin across `--repeats` replicates.

The HEADLINE number per level is the MEDIAN over replicates, reported with
the min-max spread, and the pass/fail efficiency verdict is stated on the
median (round-3 verdict item: best-of-N overstates the central estimate on
a multi-tenant host whose wall-clock wobbles 2-3x).  Best-of is still
recorded as the steady-state upper bound.

Usage:  python tools/scaling_study.py [--convs 500] [--levels 8 32]
                                      [--repeats 5] [--out BENCH.md]

Writes BENCH.md with turns/sec at both levels, scaling efficiency
(tput_4N / tput_N) / (4N/N) on the median, and the per-run config table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_GEN_SNIPPET = """
import sys
from pdf_extractor_spark.session import build_session
from pdf_extractor_spark.sources.transcripts import transcripts_spark_df
path, convs = sys.argv[1], int(sys.argv[2])
spark = build_session("scaling-gen", cores=8)
spark.sparkContext.setLogLevel("ERROR")
transcripts_spark_df(spark, convs, seed=42, skew_every=20, partitions=64)\\
    .write.mode("overwrite").parquet(path)
print(spark.read.parquet(path).count())
spark.stop()
"""

_RUN_SNIPPET = """
import json, sys, time, shutil
from pyspark.sql import functions as F
from pdf_extractor_spark.session import build_session
from pdf_extractor_spark.sources.transcripts import transcripts_spark_df
from pdf_extractor_spark.plans.pipeline import build_multiplexed
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.config import SALT_BUCKETS
tx_path, out_path, cores, repeats, packed = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5] == "1")
spark = build_session(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
# untimed warmup: import-warm every Python worker
build_multiplexed(transcripts_spark_df(spark, 2 * cores, seed=99))\\
    .write.format("noop").mode("overwrite").save()
tx = spark.read.parquet(tx_path)
n = tx.count()
ex_secs, secs = [], []
for _ in range(repeats):
    # (a) extraction stage alone — the BASELINE.json metric is extraction
    # turns/sec; noop sink isolates it from the local-JVM vector funnel
    salted = tx.repartition(
        F.xxhash64("conv_id", F.pmod(F.col("turn_idx"), F.lit(SALT_BUCKETS))))
    t0 = time.time()
    extract_turns(salted, with_first_extract=True)\\
        .write.format("noop").mode("overwrite").save()
    ex_secs.append(time.time() - t0)
    # (b) full pipeline to parquet (extract + chunk + embed + sink)
    shutil.rmtree(out_path, ignore_errors=True)
    t0 = time.time()
    build_multiplexed(tx, salt_stage1=True, packed_embeddings=packed)\\
        .write.mode("overwrite").parquet(out_path)
    secs.append(time.time() - t0)
print(json.dumps({"cores": cores, "turns": n,
                  "ex_secs": [round(s, 2) for s in ex_secs],
                  "secs": [round(s, 2) for s in secs],
                  "ex_best_sec": round(min(ex_secs), 2),
                  "best_sec": round(min(secs), 2),
                  "ex_turns_per_sec": round(n / min(ex_secs), 1),
                  "turns_per_sec": round(n / min(secs), 1)}))
spark.stop()
"""


def _run(snippet: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", snippet, *args],
        cwd=REPO, capture_output=True, text=True, timeout=3000,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{proc.stderr[-3000:]}")
    return proc.stdout.strip().splitlines()[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=1500)
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    ap.add_argument("--append", action="store_true",
                    help="append a results section to --out instead of rewriting")
    ap.add_argument("--packed", action="store_true",
                    help="schema-v2 packed float32 binary embedding column")
    args = ap.parse_args()
    levels = sorted(args.levels)

    tmp = tempfile.mkdtemp(prefix="scaling_")
    import atexit

    # each study writes ~5 GB of transcripts + outputs; leaked temp dirs
    # from repeated studies filled the sandbox disk — always clean up
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    tx_path = f"{tmp}/transcripts"
    print(f"generating {args.convs} conversations -> {tx_path}", flush=True)
    n_turns = int(_run(_GEN_SNIPPET, tx_path, str(args.convs)))
    print(f"input: {n_turns} turns", flush=True)

    # interleave levels round-robin so slow drift in machine load hits both
    # levels equally; keep the best run per level (steady-state analog)
    results = {c: {"cores": c, "secs": []} for c in levels}
    for rnd in range(args.repeats):
        for cores in levels:
            print(f"round {rnd}: local[{cores}] ...", flush=True)
            r = json.loads(
                _run(_RUN_SNIPPET, tx_path, f"{tmp}/out{cores}", str(cores), "1",
                     "1" if args.packed else "0")
            )
            results[cores]["turns"] = r["turns"]
            results[cores]["secs"] += r["secs"]
            results[cores].setdefault("ex_secs", []).extend(r["ex_secs"])
            print(f"  {r}", flush=True)
    import statistics

    for c, r in results.items():
        n = r["turns"]
        for pre, key in (("", "secs"), ("ex_", "ex_secs")):
            runs = r[key]
            r[f"{pre}best_sec"] = min(runs)
            r[f"{pre}med_sec"] = round(statistics.median(runs), 2)
            # throughput per replicate, then median/min/max of THOSE —
            # the spread the verdict asked to see alongside the center
            tputs = sorted(round(n / s, 1) for s in runs)
            r[f"{pre}tput_runs"] = tputs
            r[f"{pre}turns_per_sec"] = round(
                statistics.median(tputs), 1
            )
            r[f"{pre}best_turns_per_sec"] = tputs[-1]
            r[f"{pre}tput_spread"] = f"{tputs[0]}-{tputs[-1]}"

    from pdf_extractor_spark.config import ARROW_MAX_RECORDS_PER_BATCH, SALT_BUCKETS

    rows = "\n".join(
        f"| {c} | {results[c]['ex_secs']} "
        f"| {results[c]['ex_turns_per_sec']} ({results[c]['ex_tput_spread']}) "
        f"| {results[c]['secs']} "
        f"| {results[c]['turns_per_sec']} ({results[c]['tput_spread']}) |"
        for c in levels
    )
    pairs = []
    for a, b in zip(levels, levels[1:]):
        for kind, key in (("extraction stage", "ex_turns_per_sec"),
                          ("full pipeline", "turns_per_sec")):
            ta, tb = results[a][key], results[b][key]
            eff = (tb / ta) / (b / a)
            bkey = key.replace("turns_per_sec", "best_turns_per_sec")
            eff_best = (results[b][bkey] / results[a][bkey]) / (b / a)
            pairs.append(
                f"- **{a} -> {b} cores ({b // a}x), {kind}**: median "
                f"efficiency = ({tb} / {ta}) / {b // a} = **{eff:.3f}** "
                f"({'PASS' if round(eff, 3) >= 0.8 else 'MISS'} vs the 0.8 "
                f"target on the median; best-of replicates {eff_best:.3f})"
            )
    pair_lines = "\n".join(pairs)

    md = f"""# BENCH — scaling study (N vs 4N parallelism)

Sandbox evidence for the BASELINE.json north rule's two-cluster-size
criterion (scaling efficiency >= 0.8 between N and 4N executors): the same
extraction job — stage-1 pandas-UDF extract (salted, {SALT_BUCKETS} buckets)
-> stage-2 groupBy(conv_id).applyInPandas chunk fold -> stage-3 embeddings
-> parquet sink — on the same input at each of local[{'], local['.join(map(str, levels))}]
(shuffle partitions = cores; Arrow batch {ARROW_MAX_RECORDS_PER_BATCH}).
Workers import-warmed before timing; levels interleaved round-robin,
**median over {args.repeats} replicates per level** (min-max spread in
parentheses; best-of is noted as the steady-state upper bound but the
pass/fail verdict is stated on the median). Reproduce:
`python tools/scaling_study.py`.

Input: {args.convs} synthetic conversations = **{n_turns} turns**
(seed 42, skewed every 20th conversation ~40x median length).

| cores | extract runs (sec) | extract turns/sec median (spread) | full runs (sec) | full turns/sec median (spread) |
|---|---|---|---|---|
{rows}

{pair_lines}

## Measurement notes

Two effects dominate sandbox measurements and were diagnosed before
recording these numbers:

1. **Driver heap size**: a 24g G1 heap made the embed+sink stage 2-3x
   slower at 32 cores (storms of ~75% kernel time in /proc/stat — heap
   commit/uncommit page churn); 4-8g heaps are stable. The engine now
   defaults to 8g with -Xms pinned (session.py), which is also the right
   per-executor sizing posture for a real cluster: many modest executors
   beat one huge heap.
2. **Fixed per-job overhead** (~4-5s: stage setup, scan listing, salt
   shuffle spin-up) biases small-corpus runs against the high-core level,
   so each pair below uses a corpus large enough that compute dominates.
   Residual host interference (firecracker neighbors; occasional 2x
   wall-clock swings with visible steal%) is damped by interleaving the
   levels round-robin and reporting the median replicate per level.

On a real multi-executor cluster each executor is an isolated modest-heap
JVM on its own host — exactly the regime these settings approximate.

Generated {time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())}.
"""
    if args.append:
        md = f"""

## Additional pair — levels {levels}, {args.convs} conversations ({n_turns} turns){", PACKED (schema-v2) embeddings" if args.packed else ""}

| cores | extract runs (sec) | extract turns/sec median (spread) | full runs (sec) | full turns/sec median (spread) |
|---|---|---|---|---|
{rows}

{pair_lines}
"""
    with open(args.out, "a" if args.append else "w", encoding="utf-8") as f:
        f.write(md)
    print(md)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
