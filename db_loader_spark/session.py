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


def sized_partitions(
    spark: SparkSession,
    est_bytes: int,
    bytes_per_partition: int = 32 * 1024 * 1024,
    floor: int = 8,
) -> int:
    """The data_sized_shuffle rule as a NUMBER, for a single explicit
    ``repartition`` whose input size the caller already knows (e.g.
    g_pagerank's contrib frame: ~48 B × 2m edge rows) — bytes-per-
    partition bound, floored, clamped to the session's configured
    ceiling exactly like the context manager. Scale-correct by
    construction: the same formula that yields the floor on a MB-sized
    frame yields hundreds of partitions on a 100 TB one (then capped
    at the cluster's configured budget)."""
    target = max(floor, est_bytes // bytes_per_partition)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    return int(min(int(prev), target)) if str(prev).isdigit() else int(target)


@__import__("contextlib").contextmanager
def data_sized_shuffle(
    spark: SparkSession,
    *paths: str,
    bytes_per_partition: int = 32 * 1024 * 1024,
    floor: int = 8,
):
    """Scope ``spark.sql.shuffle.partitions`` to the INPUT DATA SIZE
    for a multi-stage query, then restore.

    Rationale: AQE coalesces post-shuffle partitions by size, but a
    composed pipeline of 20+ jobs over a small input still pays
    per-stage scheduling for ``shuffle.partitions`` map-side tasks in
    every exchange — measured 6.6 → 5.1 s on curation_e2e at sf0.1
    purely from right-sizing this bound. Sizing by bytes/partition is
    the rule that stays correct at 100 TB: the same formula that
    yields the floor on a 5 MB corpus yields thousands of partitions
    on a 100 TB one (then clamped to the session's configured ceiling,
    which a cluster deployment sets to its executor-core budget).

    ONLY valid around wrappers that MATERIALIZE inside the scope
    (the settle pattern): shuffle.partitions is read at execution
    time, so a lazily returned plan executed after restore would not
    see the sizing.
    """
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    target = max(floor, total // bytes_per_partition)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    sized = min(int(prev), target) if str(prev).isdigit() else target
    spark.conf.set("spark.sql.shuffle.partitions", str(sized))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
