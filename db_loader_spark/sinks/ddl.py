"""DDL helpers (K7): the ECJ star/EAV schema as Spark SQL DDL.

Re-expresses scripts/create_tables.sql:1-54 for a lakehouse: parquet
tables via Spark SQL; FKs become validation anti-joins
(operators.idempotence.fk_violations) since Spark doesn't enforce
constraints. Drop order mirrors scripts/drop_tables.sql:1-7 (children
first) — cosmetic for parquet, load-bearing if passed through to an
RDBMS.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

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
