"""Loaders for the driver's TPC-H-ish parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

Reads are plain ``spark.read.parquet`` so Catalyst gets full pushdown /
pruning; no schema inference cost (parquet carries its schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, os.path.join(sf_dir, "events.parquet"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events with ``ts`` normalized to TIMESTAMP micros.

    The driver has shipped this table with two physical encodings of
    ``ts`` across rounds — parquet TIMESTAMP(NANOS) (readable only as
    long via nanosAsLong) and plain TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ) — so the decode is schema-adaptive rather than
    hard-coded. TIMESTAMP (LTZ) is the canonical downstream type:
    ``unix_micros`` requires it (rejects NTZ outright), and under the
    UTC session timezone ``get_spark`` pins, LTZ values and formatting
    agree exactly with DuckDB's naive TIMESTAMP (verified by the r1/r2
    hash-matched correctness rows).
    """
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Vanilla session + TIMESTAMP(NANOS) file: the read itself throws
        # PARQUET_TYPE_ILLEGAL. nanosAsLong has no per-read form, so the
        # fallback is unavoidably session-wide; only touched on failure.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    return df.withColumn("ts", decode_ts(df.schema["ts"].dataType))


def decode_ts(dt):
    """Column expression turning a raw ``ts`` of type *dt* into TIMESTAMP micros."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    if isinstance(dt, LongType):
        # nanos-as-long. `ts div 1000` is exact INTEGER division.
        # `floor(ts / 1000)` would go through DOUBLE, whose 53-bit
        # mantissa can't hold ~1.7e18 ns (ulp ≈ 256 ns) — that rounding
        # made Spark's micros disagree with DuckDB's exact truncation by
        # ±1 µs on ~0.4% of rows.
        return F.timestamp_micros(F.expr("ts div 1000"))
    if isinstance(dt, TimestampType):
        return F.col("ts")
    # TIMESTAMP_NTZ: naive→instant under the session timezone; identity
    # on the naive value for formatting/roundtrip, exact under UTC.
    return F.col("ts").cast("timestamp")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
