"""SparkSession factory with the engine's tuned defaults.

Single place for execution config so tests, bench.py, jobs/ and the driver
contract all run the same physics:

* AQE on (runtime coalescing + skew-join splitting);
* Arrow on, batch size pinned (stage-1 pandas UDF batch shape);
* shuffle partitions sized to the core count (local mode) — on a real
  cluster this is set per-job via spark-submit --conf.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .config import ARROW_MAX_RECORDS_PER_BATCH, DEFAULT_SHUFFLE_PARTITIONS


def build_session(
    app_name: str = "spark-transcript-extractor",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """driver_memory defaults to a deliberately MODEST 8g with Xms pinned:
    measured on this sandbox, a 24g heap made the embed+sink stage 2-3x
    slower at 32 cores (kernel time storms from heap commit/uncommit churn
    under G1; 4g/8g heaps are stable).  The pipeline streams through Arrow
    batches and never needs a large driver heap in local mode."""
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.extraJavaOptions", f"-Xms{driver_memory}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # measured (BENCH.md codec sweep, 32-core packed pipeline): zstd is
        # both the fastest sink codec AND ~9% smaller than snappy — strictly
        # dominant for this workload's write-bound tail
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
