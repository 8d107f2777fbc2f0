"""End-to-end pipelines re-expressing the reference's two entry points:
Clojush logs → four tables (src/db_loader.clj) and ECJ logs → star/EAV
schema (src/parse_logs_ecj.clj)."""

from db_loader_spark.plans.clojush import parse_clojush_logs

__all__ = ["parse_clojush_logs"]
