"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use ``local[N]`` (single JVM); the same builder settings —
AQE, skew-join handling, partition coalescing, UTC session timezone,
Arrow — are the ones you would ship to a 1000-executor cluster. Only
``master`` and the memory sizing are local-mode artifacts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "db_loader_spark", cpus: str | None = None) -> SparkSession:
    """Return the singleton SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching replace hand-tuned partition counts
      at 100 TB.
    - ``spark.sql.shuffle.partitions`` seeds AQE's initial parallelism;
      locally = core count, on a cluster AQE re-coalesces per stage.
    - Session timezone pinned to UTC so timestamps agree with
      UTC-naive parquet/DuckDB semantics.
    """
    cpus = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime row-level filtering: build a bloom filter from the
        # small join side and prune the big side's scan — at 100 TB this
        # is the difference between scanning a fact table and scanning
        # the ~join-matched slice of it.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # MIN/MAX/COUNT over parquet answered from footer statistics —
        # no row reads for pure metadata aggregates (a2_max_id shape).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Back-compat with TIMESTAMP(NANOS) parquet (the r1-r2 events
        # encoding): harmless for MICROS files, and avoids mutating the
        # session conf per table load if the driver ever ships nanos
        # again; tables.decode_ts adapts to whichever type the read gives.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
