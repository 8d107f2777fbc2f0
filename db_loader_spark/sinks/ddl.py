"""DDL helpers (K7): the ECJ star/EAV schema as Spark SQL DDL.

Re-expresses scripts/create_tables.sql:1-54 for a lakehouse: parquet
tables via Spark SQL; FKs become validation anti-joins
(operators.idempotence.fk_violations) since Spark doesn't enforce
constraints. Drop order mirrors scripts/drop_tables.sql:1-7 (children
first) — cosmetic for parquet, load-bearing if passed through to an
RDBMS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# child → parent dependency order (drop in this order, create reversed)
# Ids are BIGINT (not the reference's serial INT): hash-mode run ids are
# 63-bit xxhash64 values (operators/ids.py), and at 100 TB serial INT
# counters overflow anyway. ``experiment.logname`` carries the trial's
# log file, matching the reference insert columns (new-exp,
# src/parse_logs_ecj.clj:70-86: expid/logname/batchid/param/value).
ECJ_TABLES: dict[str, str] = {
    "generations": "genid BIGINT, expid BIGINT, param STRING, value STRING",
    "experiment": "expid BIGINT, logname STRING, batchid BIGINT, param STRING, value STRING",
    "experiments": "batchid BIGINT, userid BIGINT, probid BIGINT, locid BIGINT, batchdate STRING",
    "problems": "probid BIGINT, sysid BIGINT, probname STRING, githash STRING",
    "locations": "locid BIGINT, location STRING, loginid STRING",
    "systems": "sysid BIGINT, sysname STRING, version STRING, githash STRING",
    "users": "userid BIGINT, username STRING, password STRING, email STRING",
}


def create_all(spark: SparkSession, location: str, fmt: str = "parquet") -> None:
    for name in reversed(list(ECJ_TABLES)):
        cols = ECJ_TABLES[name]
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING {fmt} "
            f"LOCATION '{location}/{name}'"
        )


def drop_all(spark: SparkSession) -> None:
    for name in ECJ_TABLES:  # children first (drop_tables.sql order)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def write_bucketed(
    df,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a fact table bucketed (and sorted) by its join key.

    Two tables bucketed the same way equi-join with ZERO exchange — the
    scan is already hash-partitioned on the key — which at 100 TB turns
    the repeated fact⋈fact shuffle (e.g. orders⋈lineitem on orderkey)
    into a local merge per bucket. Bucket count should be a multiple of
    target parallelism; sorting makes the join a streaming merge.

    The pre-write ``repartition`` aligns writer tasks with bucket hashing
    (both are Murmur3 ``hash(key) mod n``), so every bucket lands in
    exactly ONE file — the condition under which Spark's scan reports the
    ``sortBy`` order and sort-merge join can skip its per-bucket sorts.
    Multiple files per bucket would silently re-sort at read time.
    """
    w = (
        df.repartition(n_buckets, df[bucket_col])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    part_expr: Column,
    part_col: str,
    mode: str = "overwrite",
) -> None:
    """Persist a fact table hive-partitioned by a derived column — the
    time-sliced storage layout for append-mostly fact data.

    At 100 TB a fact table is written once per ingest window and read
    thousands of times with time-range predicates; directory-level
    partitioning (``part_col=value/`` paths) lets every such read prune
    non-matching partitions at PLANNING time — the scan never even lists
    the excluded directories' files, so a 3-day query over a 3-year
    table touches ~0.3% of the bytes. Granularity rule: pick the coarsest
    unit that still bounds a typical query's scan (events → day, orders
    → month here); finer than ~daily produces small-file explosions at
    scale.

    The pre-write ``repartition(part_expr)`` routes each partition's
    rows to one writer task so each directory holds ONE file instead of
    (tasks × partitions) shards — same small-file discipline as
    write_bucketed.
    """
    keyed = df.withColumn(part_col, part_expr)
    (
        keyed.repartition(F.col(part_col))
        .write.format("parquet")
        .mode(mode)
        .partitionBy(part_col)
        .save(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    part_col: str | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_mb`` output files. Returns the output file count chosen.

    The maintenance op every streaming/incremental ingest needs at
    scale: availableNow micro-batches and fine-grained partitions leave
    thousands of KB-sized files, and scan planning cost grows with file
    count (listing + footer reads) long before data volume matters. The
    target count is computed from the ACTUAL input bytes (Hadoop
    FileSystem, so it works on any scheme, not just file://), then one
    repartition writes evenly sized outputs.

    With ``part_col`` the hive layout is preserved: rows repartition by
    the partition column so each directory compacts to one file (same
    discipline as write_partitioned); without it, round-robin gives
    maximally even file sizes.
    """
    import math

    df = spark.read.parquet(src)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if part_col is not None:
        (
            df.repartition(F.col(part_col))
            .write.format("parquet")
            .mode(mode)
            .partitionBy(part_col)
            .save(dst)
        )
    else:
        df.repartition(n).write.format("parquet").mode(mode).save(dst)
    return n


def pruned_time_filter(
    df: DataFrame,
    ts_col: str,
    start: str,
    end: str,
    part_col: str = "event_date",
) -> DataFrame:
    """Half-open time-range filter [start, end) that ALSO bounds the
    partition column, so a date-partitioned scan prunes directories.

    The row-level ``ts`` predicate alone cannot prune: the partition
    column is what appears in directory names, and Catalyst only turns
    predicates ON THAT COLUMN into PartitionFilters. The derived bounds
    are inclusive on both ends (a ts just under ``end`` can live in
    ``date(end)``'s partition), which is correct and still prunes
    everything outside the range. Row-level ts bounds stay in the filter
    for exactness within edge partitions."""
    return df.filter(
        (F.col(ts_col) >= F.lit(start))
        & (F.col(ts_col) < F.lit(end))
        & (F.col(part_col) >= F.to_date(F.lit(start)))
        & (F.col(part_col) <= F.to_date(F.lit(end)))
    )
