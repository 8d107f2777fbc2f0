"""Input connectors: text logs (plain/gzip), EDN sidecar index, config,
ECJ parameter files, JDBC."""

from db_loader_spark.sources.text_logs import read_log_lines
from db_loader_spark.sources.edn_index import read_edn_index

__all__ = ["read_log_lines", "read_edn_index"]
