#!/usr/bin/env python
"""Stage-attribution diagnostic for the full-pipeline scaling miss.

Times four nested sub-plans of build_multiplexed at two parallelism
levels so the non-scaling stage shows itself:

  a. extract                     -> noop
  b. extract+chunk (shuffle)     -> noop
  c. extract+chunk+embed         -> noop
  d. extract+chunk+embed         -> parquet   (the full pipeline)

Usage: python tools/scaling_diag.py [--convs 5000] [--levels 4 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_GEN = """
import sys
from pdf_extractor_spark.session import build_session
from pdf_extractor_spark.sources.transcripts import transcripts_spark_df
path, convs = sys.argv[1], int(sys.argv[2])
spark = build_session("diag-gen", cores=8)
spark.sparkContext.setLogLevel("ERROR")
transcripts_spark_df(spark, convs, seed=42, skew_every=20, partitions=64)\\
    .write.mode("overwrite").parquet(path)
print(spark.read.parquet(path).count())
spark.stop()
"""

_RUN = """
import json, sys, time, shutil
from pyspark.sql import functions as F
from pdf_extractor_spark.session import build_session
from pdf_extractor_spark.sources.transcripts import transcripts_spark_df
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.operators.chunk import chunk_conversations
from pdf_extractor_spark.operators.enrich import add_embeddings
from pdf_extractor_spark.plans.pipeline import build_multiplexed
tx_path, out_path, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = build_session(f"diag-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
build_multiplexed(transcripts_spark_df(spark, 2 * cores, seed=99))\\
    .write.format("noop").mode("overwrite").save()
tx = spark.read.parquet(tx_path)

def t(df, sink):
    t0 = time.time()
    if sink == "noop":
        df.write.format("noop").mode("overwrite").save()
    else:
        shutil.rmtree(out_path, ignore_errors=True)
        df.write.mode("overwrite").parquet(out_path)
    return round(time.time() - t0, 2)

ex = extract_turns(tx, with_first_extract=True)
ch = chunk_conversations(ex)
em = add_embeddings(ch, packed=True)
res = {"cores": cores}
for name, df, sink in (
    ("a_extract", ex, "noop"),
    ("b_chunk", ch, "noop"),
    ("c_embed", em, "noop"),
    ("d_full_parquet", em, "parquet"),
):
    res[name] = [t(df, sink) for _ in range(2)]
print(json.dumps(res))
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
    ap.add_argument("--convs", type=int, default=5000)
    ap.add_argument("--levels", type=int, nargs="+", default=[4, 16])
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="scaldiag_")
    import atexit

    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    tx = f"{tmp}/tx"
    n = int(_run(_GEN, tx, str(args.convs)))
    print(f"input: {n} turns", flush=True)
    out = {}
    for cores in args.levels:
        r = json.loads(_run(_RUN, tx, f"{tmp}/out{cores}", str(cores)))
        out[cores] = r
        print(json.dumps(r), flush=True)
    a, b = args.levels
    ratio = b / a
    print("\nstage-level best-of-2 scaling efficiency "
          f"({a} -> {b} cores):")
    for k in ("a_extract", "b_chunk", "c_embed", "d_full_parquet"):
        ta, tb = min(out[a][k]), min(out[b][k])
        print(f"  {k:16s} {ta:7.2f}s -> {tb:7.2f}s   "
              f"eff={(ta / tb) / ratio:.3f}")


if __name__ == "__main__":
    main()
