"""Pluggable seen-conversation ledger + quarantine store for run_stream.

The whole-conversation-per-batch contract (streaming/ingest.py) needs two
pieces of durable state: which conv_ids each PRIOR batch carried (to
detect straddlers) and where quarantined rows live.  This module makes
that storage a protocol with two implementations:

* ``LocalParquetLedger`` — the sandbox/NFS path: per-batch parquet
  partitions under underscore-prefixed side dirs (invisible to plain
  partition discovery of the main output), listed with driver-local
  ``os.listdir``.  Refuses URI-scheme roots loudly — on ``hdfs://`` or
  ``s3a://`` the listings would silently resolve to "no prior batches"
  and disable the contract.
* ``IcebergLedger`` — the cluster path the ingest docstring promises:
  ``<prefix>_seen`` (conv_id, batch_id) and ``<prefix>_quarantine``
  tables; every write is idempotent under foreachBatch's at-least-once
  replay via DELETE-on-batch_id before insert — the same protocol, with
  catalog-backed listing instead of a filesystem walk.  Constructor-gated
  on the Iceberg runtime (like plans/sinks.IcebergSink); its SQL control
  flow is pinned by mock tests where no runtime exists.

Both honor the replay rule: ``prior_seen(batch_id)`` returns conv_ids
from batches STRICTLY BEFORE batch_id, so a replayed batch never sees its
own previous (possibly partial) attempt and self-quarantines.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEEN_DIR = "_seen"
_QUARANTINE_DIR = "_quarantine"

_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


@runtime_checkable
class StreamLedger(Protocol):
    """Durable, replay-idempotent contract state for the ingest stream."""

    def prior_seen(
        self, spark: SparkSession, batch_id: int
    ) -> Optional[DataFrame]:
        """Distinct conv_ids recorded by batches < batch_id.  May return
        None when no prior batches exist; may ALSO return an empty frame
        in that case (callers' semi/anti joins are correct either way —
        None is an optimization, not a contract)."""
        ...

    def record_seen(self, batch_df: DataFrame, batch_id: int) -> None:
        """Record every conv_id this batch carried (overwrite-idempotent)."""
        ...

    def write_quarantine(self, rows: DataFrame, batch_id: int) -> None:
        """Persist a batch's contract-violating rows (overwrite-idempotent)."""
        ...

    def read_quarantine(self, spark: SparkSession) -> Optional[DataFrame]:
        """All quarantined rows so far (None if none)."""
        ...


class LocalParquetLedger:
    """Per-batch parquet partitions under ``<root>/_seen`` and
    ``<root>/_quarantine`` (see module doc)."""

    def __init__(self, root: str):
        if _URI_SCHEME.match(root):
            raise ValueError(
                "LocalParquetLedger uses driver-local filesystem listings; "
                f"got {root!r}. Use IcebergLedger (catalog-backed), a "
                "local/NFS path, or run_stream_stateful — refusing to run "
                "with the whole-conversation contract silently disabled."
            )
        self.root = root

    def _batch_path(self, side: str, batch_id: int) -> str:
        return os.path.join(self.root, side, f"batch_id={batch_id}")

    def prior_seen(self, spark, batch_id):
        seen_root = os.path.join(self.root, _SEEN_DIR)
        if not os.path.isdir(seen_root):
            return None
        paths = []
        for name in os.listdir(seen_root):
            m = re.fullmatch(r"batch_id=(\d+)", name)
            if m and int(m.group(1)) < batch_id:
                paths.append(os.path.join(seen_root, name))
        if not paths:
            return None
        return spark.read.parquet(*paths).select("conv_id").distinct()

    def record_seen(self, batch_df, batch_id):
        batch_df.select("conv_id").distinct().write.mode("overwrite").parquet(
            self._batch_path(_SEEN_DIR, batch_id)
        )

    def write_quarantine(self, rows, batch_id):
        rows.write.mode("overwrite").parquet(
            self._batch_path(_QUARANTINE_DIR, batch_id)
        )

    def read_quarantine(self, spark):
        q_root = os.path.join(self.root, _QUARANTINE_DIR)
        if not os.path.isdir(q_root) or not os.listdir(q_root):
            return None
        return spark.read.parquet(q_root).drop("batch_id")


class IcebergLedger:
    """Catalog-table ledger: ``<prefix>_seen`` + ``<prefix>_quarantine``.

    Idempotence: every write DELETEs its own batch_id first, so an
    at-least-once foreachBatch replay rewrites identical rows instead of
    duplicating, and a crash between the data write and the seen-record
    redoes both wholesale.  Requires the Iceberg runtime on the classpath.
    """

    def __init__(self, spark: SparkSession, prefix: str):
        from ..plans.sinks import iceberg_available

        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergLedger requires the Iceberg Spark runtime "
                "(iceberg-spark-runtime jar + a configured catalog); "
                "use LocalParquetLedger in environments without one"
            )
        self.spark = spark
        self.seen_table = prefix + "_seen"
        self.quarantine_table = prefix + "_quarantine"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.seen_table} "
            "(conv_id STRING, batch_id BIGINT) USING iceberg"
        )
        # memo: once the seen table is known non-empty it stays non-empty,
        # so the emptiness probe (an extra Spark job scanning the table
        # EVERY micro-batch) runs at most once per driver lifetime — on a
        # fresh stream it flips after the first record_seen anyway
        self._seen_nonempty = False

    def prior_seen(self, spark, batch_id):
        df = (
            spark.table(self.seen_table)
            .where(F.col("batch_id") < batch_id)
            .select("conv_id")
            .distinct()
        )
        if not self._seen_nonempty:
            if not df.limit(1).count():
                return None
            self._seen_nonempty = True
        return df

    def record_seen(self, batch_df, batch_id):
        self._seen_nonempty = True
        self.spark.sql(
            f"DELETE FROM {self.seen_table} WHERE batch_id = {int(batch_id)}"
        )
        batch_df.select("conv_id").distinct().withColumn(
            "batch_id", F.lit(int(batch_id)).cast("bigint")
        ).writeTo(self.seen_table).append()

    def write_quarantine(self, rows, batch_id):
        spark = self.spark
        stamped = rows.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("bigint")
        )
        if spark.catalog.tableExists(self.quarantine_table):
            spark.sql(
                f"DELETE FROM {self.quarantine_table} "
                f"WHERE batch_id = {int(batch_id)}"
            )
            stamped.writeTo(self.quarantine_table).append()
        else:
            stamped.writeTo(self.quarantine_table).using("iceberg").create()

    def read_quarantine(self, spark):
        if not spark.catalog.tableExists(self.quarantine_table):
            return None
        df = spark.table(self.quarantine_table).drop("batch_id")
        return df if df.limit(1).count() else None
