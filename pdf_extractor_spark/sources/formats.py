"""Transcript readers for non-parquet arrival formats.

Production transcripts land as Iceberg/parquet (the primary path,
``sources/transcripts.py`` + S1), but upstream emitters commonly hand
over JSONL dumps or CSV exports.  These readers normalize any of those
into the ONE canonical schema (``TRANSCRIPT_DDL`` — BASELINE.json
``input_hint``), so every downstream operator is source-agnostic:

* explicit schema, never inference — schema inference re-scans the input
  (2x read at 100 TB) and silently drifts types (a conv_id of "123"
  becomes a bigint);
* malformed rows are captured PERMISSIVEly into a ``_corrupt`` column and
  split out, mirroring the engine's counted-never-silent failure posture
  (reject gate F2/F5): callers get (clean, corrupt) and decide;
* timestamps parse from ISO-8601 strings (``ts`` arrives as text in both
  dump formats).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .transcripts import TRANSCRIPT_DDL, TRANSCRIPT_SCHEMA

# arrival-format schema: ts as string (ISO-8601), plus the corrupt-capture
_ARRIVAL_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts string, _corrupt string"
)

_CANON_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


@dataclass
class ArrivalBatch:
    """One parsed arrival dump: (clean, corrupt) plus an explicit
    ``release()`` for the cached parse pass.

    Tuple-unpacks as ``clean, corrupt = read_transcripts_*(...)`` for
    callers that live as long as the session; long-lived drivers ingesting
    many dumps keep the handle and call ``release()`` once both branches
    are materialized — otherwise each ingest leaks MEMORY_AND_DISK blocks
    for the lifetime of the session (round-3 ADVICE)."""

    clean: DataFrame
    corrupt: DataFrame
    _raw: DataFrame

    def __iter__(self) -> Iterator[DataFrame]:
        return iter((self.clean, self.corrupt))

    def release(self) -> None:
        """Drop the cached parse pass.  END-OF-LIFE: call only after both
        branches are fully consumed — the corrupt-capture pattern NEEDS the
        cache for plan validity (Spark refuses file-source plans whose scan
        prunes down to only ``_corrupt``, QUERY_ONLY_CORRUPT_RECORD_COLUMN),
        so re-executing either branch after release may raise."""
        self._raw.unpersist()


def _normalize(raw: DataFrame) -> ArrivalBatch:
    """Split the parsed arrival frame into (clean canonical-schema rows,
    corrupt raw rows).

    The parsed scan is persisted before splitting: Spark disallows plans
    whose file-source scan references ONLY the corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and prescribes exactly this — and
    it is the right shape regardless, since both branches consume the one
    parse pass of the arrival batch (MEMORY_AND_DISK: a dump batch larger
    than memory spills instead of re-parsing)."""
    from pyspark import StorageLevel

    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    corrupt = raw.where(F.col("_corrupt").isNotNull()).select(
        "conv_id", "_corrupt"
    )
    clean = (
        raw.where(F.col("_corrupt").isNull())
        .withColumn("ts", F.to_timestamp("ts"))
        .select(*_CANON_COLS)
    )
    return ArrivalBatch(clean, corrupt, raw)


def read_transcripts_jsonl(spark: SparkSession, path: str) -> ArrivalBatch:
    """JSON-lines transcript dump → ArrivalBatch (unpacks to
    (canonical rows, corrupt lines); ``.release()`` frees the parse
    cache)."""
    raw = (
        spark.read.schema(_ARRIVAL_DDL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return _normalize(raw)


def read_transcripts_csv(spark: SparkSession, path: str) -> ArrivalBatch:
    """CSV transcript export (headered, quoted multiline text) →
    ArrivalBatch (unpacks to (canonical rows, corrupt lines);
    ``.release()`` frees the parse cache)."""
    raw = (
        spark.read.schema(_ARRIVAL_DDL)
        .option("header", True)
        .option("multiLine", True)   # turn text contains newlines
        .option("escape", '"')
        # layout whitespace is SIGNIFICANT in transcript text (column
        # positions, footer bands) — never trim it
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return _normalize(raw)


def write_transcripts_csv(df: DataFrame, path: str) -> None:
    """Canonical transcripts → headered CSV, whitespace-exact (Spark's CSV
    WRITER trims trailing whitespace by default, which corrupts
    layout-significant transcript text — both trim options forced off)."""
    df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
    ).write.mode("overwrite").option("header", True).option("escape", '"')\
        .option("ignoreLeadingWhiteSpace", False)\
        .option("ignoreTrailingWhiteSpace", False).csv(path)


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """Canonical transcripts → JSONL (ts serialized ISO-8601) — the
    round-trip partner of ``read_transcripts_jsonl`` for tests/export."""
    df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
    ).write.mode("overwrite").json(path)


# canonical column -> type, derived from the canonical StructType (the
# source of truth TRANSCRIPT_DDL itself derives from) so future canonical
# types containing commas or angle brackets (decimal(10,2),
# map<string,string>) can never be mis-split into wrong cast targets
_CANON_TYPES = {
    f.name: f.dataType.simpleString() for f in TRANSCRIPT_SCHEMA.fields
}


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC transcript handoff — the typed columnar exchange format
    Hive/Trino warehouses emit.  Unlike the text dumps there is no
    corrupt-record channel to split: ORC stripes are self-describing and
    either decode or fail the task loudly, so this returns a plain
    DataFrame, not an ArrivalBatch.

    The canonical contract is still enforced: missing columns raise
    immediately (never a null-filled silent pass), extra warehouse
    columns are pruned, and every column casts to the canonical type —
    a bigint turn_idx from a Hive export narrows to int here, at the
    boundary, instead of poisoning downstream schema comparisons."""
    df = spark.read.orc(path)
    missing = [c for c in _CANON_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"ORC transcript handoff at {path!r} is missing canonical "
            f"columns {missing}; refusing to null-fill"
        )
    return df.select(
        *[F.col(c).cast(_CANON_TYPES[c]).alias(c) for c in _CANON_COLS]
    )


def write_transcripts_orc(df: DataFrame, path: str) -> None:
    """Canonical transcripts → ORC (native typed round trip; zstd to
    match the parquet sink's codec choice)."""
    df.select(*_CANON_COLS).write.mode("overwrite").option(
        "compression", "zstd"
    ).orc(path)


__all__ = [
    "TRANSCRIPT_DDL",
    "ArrivalBatch",
    "read_transcripts_csv",
    "read_transcripts_jsonl",
    "read_transcripts_orc",
    "write_transcripts_csv",
    "write_transcripts_jsonl",
    "write_transcripts_orc",
]
