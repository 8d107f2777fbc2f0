"""Structured Streaming incremental ingest (T1-T5)."""

from db_loader_spark.streaming.file_ingest import stream_log_tables

__all__ = ["stream_log_tables"]
