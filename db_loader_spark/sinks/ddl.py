"""DDL helpers (K7): the ECJ star/EAV schema as Spark SQL DDL.

Re-expresses scripts/create_tables.sql:1-54 for a lakehouse: parquet
tables via Spark SQL; FKs become validation anti-joins
(operators.idempotence.fk_violations) since Spark doesn't enforce
constraints. Drop order mirrors scripts/drop_tables.sql:1-7 (children
first) — cosmetic for parquet, load-bearing if passed through to an
RDBMS.
"""

from __future__ import annotations

import os

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
    files_per_partition: int = 1,
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
    write_bucketed. That also means ONE task per partition: a skewed
    ingest day (one hot date holding most of the batch) serializes into
    a single writer. ``files_per_partition`` is the escape hatch —
    a deterministic row-hash salt spreads each partition over up to
    that many writer tasks/files, trading file count for write
    parallelism on skewed days.
    """
    keyed = df.withColumn(part_col, part_expr)
    if files_per_partition > 1:
        salt = F.pmod(
            F.hash(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)
        )
        # Explicit partition count: AQE coalesces a column-only
        # repartition of a small shuffle down to a handful of tasks,
        # which silently re-merges the salt groups (measured: every
        # date back to ONE file at test SF). Pinning the count keeps
        # (partition, salt) groups in distinct tasks.
        n_shuffle = int(
            keyed.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        keyed = keyed.repartition(
            n_shuffle * files_per_partition, F.col(part_col), salt
        )
    else:
        keyed = keyed.repartition(F.col(part_col))
    keyed.write.format("parquet").mode(mode).partitionBy(part_col).save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """Range-clustered parquet layout: globally sort by the filter
    column before writing, so every file (range-partitioned by the
    sort) and every row group inside it covers a NARROW, disjoint
    value range. Parquet stores per-row-group min/max statistics;
    a selective predicate on the sort column then skips whole row
    groups (and the footer check skips whole files) instead of
    scanning everything — the one-dimension analogue of Z-ORDER
    clustering, and the right layout for a column that dominates the
    workload's predicates (user_id on events, orderkey on lineitem).

    On an UNsorted layout the same statistics exist but are useless:
    every row group's min/max spans the full domain, so nothing ever
    skips — which is why clustering is a LAYOUT decision, not a reader
    optimization. ``row_group_bytes`` shrinks the row-group size so
    small test/bench tables still hold many groups; production leaves
    the 128 MB default (a 100 TB table has ~10⁶ groups regardless).
    Pruning is proven two ways: footer min/max disjointness
    (tests/test_partitioned_layout.py reads the metadata directly)
    and the measured scan delta (bench `ev_value_sorted` vs
    `ev_value_unsorted`)."""
    w = df.sort(sort_col).write.format("parquet").mode(mode)
    if row_group_bytes:
        w = w.option("parquet.block.size", row_group_bytes)
    w.save(path)


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> Column:
    """Bit-interleaved Z-ORDER key over two numeric columns: each value
    is min/max-scaled to ``bits`` bits, then the bits are interleaved
    (a→even positions, b→odd) so proximity on the Z-curve implies
    proximity in BOTH dimensions. One tiny min/max aggregate job per
    call prices the scaling; the interleave itself is a pure
    higher-order-function projection (no shuffle, small Catalyst tree —
    the same packed-integer idiom as simhash_bits)."""
    import math

    stats = df.agg(
        F.min(col_a).cast("double").alias("amin"),
        F.max(col_a).cast("double").alias("amax"),
        F.min(col_b).cast("double").alias("bmin"),
        F.max(col_b).cast("double").alias("bmax"),
    ).first()
    top = (1 << bits) - 1

    def scaled(col: str, lo: float, hi: float) -> str:
        span = hi - lo
        if not span or not math.isfinite(span):
            return "CAST(0 AS BIGINT)"
        return (
            f"LEAST(CAST({top} AS BIGINT), CAST(FLOOR((CAST({col} AS DOUBLE)"
            f" - {lo!r}) / {span!r} * {top + 1}) AS BIGINT))"
        )

    a = scaled(col_a, stats["amin"], stats["amax"])
    b = scaled(col_b, stats["bmin"], stats["bmax"])
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) ->"
        f" acc + shiftleft(CAST(getbit({a}, i) AS BIGINT), 2 * i)"
        f" + shiftleft(CAST(getbit({b}, i) AS BIGINT), 2 * i + 1))"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """TWO-dimensional range clustering: sort by the interleaved
    :func:`zorder_key` before writing, so every row group covers a
    small rectangle in (col_a, col_b) space and parquet min/max
    statistics skip groups for selective predicates on EITHER column.

    This completes :func:`write_sorted` for two-column workloads:
    1-D clustering makes the sort column's stats disjoint but leaves
    every other column spanning the full domain in every group
    (nothing ever skips); the Z-curve trades a little per-column
    tightness for coverage of both. Rule of thumb at 100 TB: cluster
    on the one dominant predicate column if there is one (1-D beats
    Z on its own column); Z-order when two columns genuinely share
    the workload. Footer-stat coverage on both dimensions is pinned in
    tests/test_partitioned_layout.py; the measured scan deltas are the
    bench ``ev_value2_*`` pair."""
    key = zorder_key(df, col_a, col_b, bits)
    w = df.withColumn("_zkey", key).sort("_zkey").drop("_zkey").write.format(
        "parquet"
    ).mode(mode)
    if row_group_bytes:
        w = w.option("parquet.block.size", row_group_bytes)
    w.save(path)


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

    With ``part_col`` the hive layout is preserved AND ``target_mb``
    still governs: each ``part_col=value`` directory's actual bytes set
    its own output file count (≥ 1), so small partitions compact to one
    file while a partition larger than ``target_mb`` is SPLIT across
    up to ceil(bytes/target) files via a deterministic row-hash salt —
    the r4 version wrote one file per partition regardless, silently
    ignoring the target for oversized days. The per-partition counts
    ride into the plan as a literal map, so keep partition counts
    directory-like (thousands, not millions — true of any sane hive
    layout). Returns the TARGET file count (sum of per-partition
    counts when partitioned); the actual count can be slightly lower
    because distinct (partition, salt) groups that hash into the same
    shuffle task share one file — the shuffle is widened to 2× the
    target to keep such merges rare.
    """
    import math

    df = spark.read.parquet(src)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    target_bytes = target_mb * 1024 * 1024
    if part_col is not None:
        per_part: dict[str, int] = {}
        for status in fs.listStatus(path):
            name = status.getPath().getName()
            if not name.startswith(f"{part_col}="):
                continue
            pbytes = fs.getContentSummary(status.getPath()).getLength()
            per_part[name.split("=", 1)[1]] = max(1, math.ceil(pbytes / target_bytes))
        n = sum(per_part.values()) or 1
        keys = [F.col(part_col)]
        if any(k > 1 for k in per_part.values()):
            counts = F.create_map(
                *[x for v, k in sorted(per_part.items()) for x in (F.lit(v), F.lit(k))]
            )
            keys.append(
                F.pmod(
                    F.hash(*[F.col(c) for c in df.columns]),
                    F.coalesce(counts[F.col(part_col).cast("string")], F.lit(1)),
                )
            )
        (
            df.repartition(max(2 * n, 1), *keys)
            .write.format("parquet")
            .mode(mode)
            .partitionBy(part_col)
            .save(dst)
        )
    else:
        total = fs.getContentSummary(path).getLength()
        n = max(1, math.ceil(total / target_bytes))
        df.repartition(n).write.format("parquet").mode(mode).save(dst)
    return n


def compact_partitions_if_needed(
    spark: SparkSession,
    root: str,
    part_col: str,
    max_files: int = 8,
    target_mb: int = 128,
) -> list[str]:
    """The incremental maintenance loop a streaming ingest actually
    runs: scan a hive layout's partition directories and rewrite ONLY
    those whose file count exceeds ``max_files`` — healthy partitions
    are not touched (no read, no write, files byte-identical), so the
    cost is proportional to the debris, not the table. Returns the
    partition values compacted.

    Each rewritten partition lands via write-to-temp + two renames.
    The swap is NOT atomic: a reader racing it can momentarily see the
    partition absent (old moved aside, new not yet in place). What IS
    guaranteed is that crash residue can never corrupt the table: both
    the temp and the moved-aside dirs live under the dot-prefixed
    ``root/.compact/`` staging dir, which Spark's hive partition
    discovery ignores, so an interrupted run leaves invisible debris —
    never a duplicate partition or a mangled partition value — and the
    next invocation recovers it (restores a moved-aside partition whose
    swap never completed, discards everything else). On a local/HDFS
    filesystem each rename is atomic; object stores need a
    manifest/commit layer instead — :mod:`db_loader_spark.sinks
    .manifest` provides exactly that (snapshot publish via one atomic
    pointer update; readers never list directories). At
    100 TB this runs as a periodic job after availableNow drains; with
    day-partitioned ingest only the most recent day ever needs work,
    so the loop is O(one partition) per cycle.
    """
    import math
    import shutil

    # Crash recovery: a prior interrupted run may have left residue in
    # the (discovery-invisible) staging dir. "<name>.old" with no live
    # partition dir = crash mid-swap → restore it; anything else
    # (.tmp = incomplete rewrite, .old beside a live dir = crash just
    # before cleanup) is safely discarded.
    staging = os.path.join(root, ".compact")
    if os.path.isdir(staging):
        for res in os.listdir(staging):
            if res.endswith(".old"):
                orig = os.path.join(root, res[: -len(".old")])
                if not os.path.exists(orig):
                    os.rename(os.path.join(staging, res), orig)
        shutil.rmtree(staging, ignore_errors=True)

    compacted: list[str] = []
    for name in sorted(os.listdir(root)):
        pdir = os.path.join(root, name)
        if not (name.startswith(f"{part_col}=") and os.path.isdir(pdir)):
            continue
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) <= max_files:
            continue
        pbytes = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        n = max(1, math.ceil(pbytes / (target_mb * 1024 * 1024)))
        os.makedirs(staging, exist_ok=True)
        tmp = os.path.join(staging, name + ".tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.parquet(pdir).repartition(n).write.mode("overwrite").parquet(tmp)
        old = os.path.join(staging, name + ".old")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        compacted.append(name.split("=", 1)[1])
    shutil.rmtree(staging, ignore_errors=True)
    return compacted


def slice_tag_dim(
    df: DataFrame,
    key_expr: Column,
    key_col: str,
    pick: Column,
    tag_col: str = "tag",
) -> DataFrame:
    """Derived dimension for JOIN-DRIVEN pruning: distinct join-key
    values tagged 'pick'/'skip' by the ``pick`` predicate. Filtering
    the dim on ``tag = 'pick'`` and joining the fact on ``key_col``
    lets Spark's runtime filters prune the FACT side — dynamic
    partition pruning when the key is the fact's hive partition column
    (the scan gains a ``dynamicpruningexpression`` PartitionFilter and
    never lists the excluded directories), and a runtime bloom filter
    on a shuffle join (the fact side is semi-filtered before its
    exchange). This is how a star query prunes at 100 TB when the
    selective predicate lives on the dimension, where literal-bound
    layouts (partition dirs, row-group stats) can't see it.

    Heuristic gotcha this encodes (cost a probe session an hour): the
    tag must be matched with a real comparison on a non-boolean column.
    Catalyst folds ``flag = true`` to the bare attribute ``flag``, and
    ``isLikelySelective`` — the gate both PartitionPruning and
    InjectRuntimeFilter apply to the dimension's predicate — accepts
    comparisons/IN/LIKE but NOT a bare attribute reference, so a
    boolean flag column silently disables every runtime filter."""
    return (
        df.select(key_expr.alias(key_col))
        .distinct()
        .withColumn(tag_col, F.when(pick, F.lit("pick")).otherwise(F.lit("skip")))
    )


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
