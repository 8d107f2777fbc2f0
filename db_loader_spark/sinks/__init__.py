"""Output connectors: CSV (K1/K2/K8), JDBC batched/quarantining/upsert
(K3-K6), DDL helpers (K7), tiny-state checkpoint (K9)."""

from db_loader_spark.sinks.csv_sink import clean_csvs, write_csv_table
from db_loader_spark.sinks.jdbc_sink import (
    jdbc_write,
    quarantining_jdbc_write,
    upsert_via_staging_sql,
)

__all__ = [
    "write_csv_table",
    "clean_csvs",
    "jdbc_write",
    "quarantining_jdbc_write",
    "upsert_via_staging_sql",
]
