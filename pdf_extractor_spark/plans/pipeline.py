"""End-to-end extraction plan with partition checkpoints and resume.

Topology (SURVEY.md §7.1):

    transcripts ──[bucket filter: pmod(xxhash64(conv_id), B)]──▶ per batch:
      Stage 1  extract_turns        pandas UDF, embarrassingly parallel
      Stage 2  chunk_conversations  ONE shuffle: groupBy(conv_id), multiplexed
      Stage 3  add_embeddings       pandas UDF on chunk rows (pre-commit)
      commit   parquet → rename → manifest JSON      (atomic per batch)

The commit protocol is the local-filesystem analog of an Iceberg snapshot
append (reference sink: bulk insert with verified ``affected_rows``,
/root/reference/api.py:1390-1445): data lands in a staging dir, is renamed
into place, and only then does the manifest appear — a batch without a
manifest is invisible to readers and is re-done wholesale on resume, so a
killed run resumes without duplicates or reprocessing of completed batches
(north rule).  On a real cluster swap `_commit_batch`/`read_*` for
``writeTo(...).append()`` on an Iceberg catalog table and snapshot-summary
verification; everything upstream is unchanged.

Skew handling: stage 1 runs on scan partitions (no shuffle; AQE balances),
stage 2's only shuffle keys on conv_id — per-group cost is bounded by the
MAX_TURNS_PER_CONV reject rule enforced *inside* the group fn.  An optional
stage-1 salt (`salt_stage1`) demonstrates the repartition(hash(conv_id,
salt)) pattern for inputs whose file layout clusters giant conversations.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CHECKPOINT_BUCKETS, SALT_BUCKETS
from ..operators.chunk import chunk_conversations
from ..operators.enrich import add_embeddings, batch_lineage, split_chunks, split_documents
from ..operators.extract import extract_turns

_BATCH_DIR = "batches"
_CKPT_DIR = "_checkpoints"


def bucket_col(buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(buckets)).cast("int")


def _manifest_path(root: str, batch_id: str) -> str:
    return os.path.join(root, _CKPT_DIR, f"batch_{batch_id}.json")


def _data_path(root: str, batch_id: str) -> str:
    return os.path.join(root, _BATCH_DIR, f"batch_{batch_id}", "data.parquet")


def committed_batches(root: str) -> dict[str, dict[str, Any]]:
    ckpt = os.path.join(root, _CKPT_DIR)
    if not os.path.isdir(ckpt):
        return {}
    out = {}
    for name in sorted(os.listdir(ckpt)):
        if name.startswith("batch_") and name.endswith(".json"):
            with open(os.path.join(ckpt, name), encoding="utf-8") as f:
                m = json.load(f)
            out[m["batch_id"]] = m
    return out


def _commit_batch(
    spark: SparkSession, multiplexed: DataFrame, root: str, batch_id: str,
    bucket_ids: list[int],
) -> dict[str, Any]:
    final = _data_path(root, batch_id)
    staging = final + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(final):
        shutil.rmtree(final)  # uncommitted leftovers from a killed run

    t0 = time.time()
    multiplexed.write.mode("overwrite").parquet(staging)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.rename(staging, final)

    # counters from the *written* data — exactly-once, like the reference's
    # verified affected_rows (api.py:1417-1445)
    written = spark.read.parquet(final)
    counters = batch_lineage(written).collect()[0].asDict()

    manifest = {
        "batch_id": batch_id,
        "buckets": bucket_ids,
        "path": final,
        "elapsed_sec": round(time.time() - t0, 3),
        "counters": {k: (int(v) if v is not None else 0) for k, v in counters.items()},
    }
    os.makedirs(os.path.join(root, _CKPT_DIR), exist_ok=True)
    tmp = _manifest_path(root, batch_id) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    os.rename(tmp, _manifest_path(root, batch_id))
    return manifest


def build_multiplexed(
    transcripts: DataFrame, salt_stage1: bool = False, salt: int = SALT_BUCKETS
) -> DataFrame:
    """The logical plan: stage 1 → stage 2 → stage 3 (no IO)."""
    src = transcripts
    if salt_stage1:
        # spread any pathological file layout before the Python stage;
        # the salt keys on (conv_id, turn_idx % salt) so one giant
        # conversation fans out across `salt` partitions for extraction
        src = src.repartition(
            F.xxhash64("conv_id", F.pmod(F.col("turn_idx"), F.lit(salt)))
        )
    extracted = extract_turns(src, with_first_extract=True)
    multiplexed = chunk_conversations(extracted)
    return add_embeddings(multiplexed)


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    output_root: str,
    buckets: int = CHECKPOINT_BUCKETS,
    buckets_per_batch: int = 4,
    salt_stage1: bool = False,
    fail_after_batches: Optional[int] = None,
    bucket_range: Optional[tuple[int, int]] = None,
) -> dict[str, Any]:
    """Checkpointed run over the whole input; resumable and idempotent.

    ``fail_after_batches`` simulates a killed run for the resume tests.
    ``bucket_range=(lo, hi)`` restricts this run to buckets lo..hi-1 — the
    multi-executor work split: each executor process owns a disjoint bucket
    range and commits into the SAME output root (batch ids are bucket-
    derived, so ranges never collide; the manifest protocol makes the
    shared root safe).  Returns a summary dict with per-batch manifests
    and totals.
    """
    os.makedirs(output_root, exist_ok=True)
    done = committed_batches(output_root)

    lo, hi = bucket_range if bucket_range else (0, buckets)
    all_buckets = list(range(lo, hi))
    batches = [
        all_buckets[i : i + buckets_per_batch]
        for i in range(0, len(all_buckets), buckets_per_batch)
    ]

    manifests = []
    executed = 0
    for batch_buckets in batches:
        batch_id = f"{batch_buckets[0]:04d}"
        if batch_id in done:
            manifests.append(done[batch_id])
            continue
        if fail_after_batches is not None and executed >= fail_after_batches:
            raise RuntimeError(
                f"simulated kill after {executed} batches (resume test)"
            )
        sub = transcripts.where(bucket_col(buckets).isin(batch_buckets))
        multiplexed = build_multiplexed(sub, salt_stage1=salt_stage1)
        manifests.append(
            _commit_batch(spark, multiplexed, output_root, batch_id, batch_buckets)
        )
        executed += 1

    totals: dict[str, int] = {}
    for m in manifests:
        for k, v in m["counters"].items():
            totals[k] = totals.get(k, 0) + int(v or 0)
    return {"batches": manifests, "totals": totals, "executed_now": executed}


def read_multiplexed(spark: SparkSession, root: str) -> DataFrame:
    paths = [_data_path(root, b) for b in committed_batches(root)]
    if not paths:
        raise FileNotFoundError(f"no committed batches under {root}")
    return spark.read.parquet(*paths)


def read_chunks(spark: SparkSession, root: str) -> DataFrame:
    return split_chunks(read_multiplexed(spark, root))


def read_documents(spark: SparkSession, root: str) -> DataFrame:
    return split_documents(read_multiplexed(spark, root))


def read_lineage(spark: SparkSession, root: str) -> DataFrame:
    rows = [
        {"batch_id": b, **{k: int(v or 0) for k, v in m["counters"].items()}}
        for b, m in committed_batches(root).items()
    ]
    return spark.createDataFrame(rows)
