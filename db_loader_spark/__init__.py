"""db_loader_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
utility ``etosch/DB_Loader`` (semi-structured log → relational tables →
CSV/JDBC), built idiomatically on the Spark DataFrame/SQL stack:

- ``sources/``   — text-log / sidecar-index / config / JDBC readers
- ``operators/`` — sessionization, joins, aggregates, id assignment
- ``plans/``     — end-to-end pipelines (Clojush log path, ECJ log path)
- ``sinks/``     — CSV, JDBC (batched + quarantining), DDL helpers
- ``functions/`` — text analysis, dedup, similarity search, multimodal
- ``streaming/`` — Structured Streaming incremental ingest

Everything is declared through the DataFrame API so Catalyst performs
pushdown/pruning/join-selection; Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (EDN parsing,
multimodal decode stubs).
"""

from db_loader_spark.session import get_spark, stop_spark
from db_loader_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "stop_spark", "TABLE_NAMES", "load_table", "load_tables"]

__version__ = "0.1.0"
