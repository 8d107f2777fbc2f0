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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read nanos as long and convert (floor) to micros.
        # Sessions built by session.get_spark set nanosAsLong at build
        # time; the conf is only touched here when the caller brought a
        # vanilla session (the external driver does) where the read would
        # otherwise throw PARQUET_TYPE_ILLEGAL. nanosAsLong has no
        # per-read form, so that fallback is unavoidably session-wide.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # `ts div 1000` is exact INTEGER division. `floor(ts / 1000)` would
        # go through DOUBLE, whose 53-bit mantissa can't hold ~1.7e18 ns
        # (ulp ≈ 256 ns) — that rounding made Spark's micros disagree with
        # DuckDB's exact truncation by ±1 µs on ~0.4% of rows.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
