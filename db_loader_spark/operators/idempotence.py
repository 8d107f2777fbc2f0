"""Idempotent-append guards (JN4/T2) and FK validation (JN7).

The reference refuses to re-ingest: batch-exists checks
(src/parse_logs_ecj.clj:51-59,71-77) and the shell dedup loop
(scripts/load_csv_to_cloud.sh:110-112). In Spark both collapse to a
left-anti join of the incoming frame against the already-loaded keys —
run BEFORE the write, making re-runs no-ops instead of errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new(
    incoming: DataFrame, existing: DataFrame, keys: list[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key tuple is absent from ``existing``.

    The existing side is projected to the key columns (column-pruned
    scan) and deduplicated; Spark broadcasts it when small."""
    existing_keys = existing.select(*keys).distinct()
    return incoming.join(existing_keys, keys, "left_anti")


def fk_violations(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """JN7: child rows whose FK has no matching parent PK (must be empty
    for a consistent load)."""
    return child.join(
        parent.select(F.col(pk)).distinct(), child[fk] == F.col(pk), "left_anti"
    )
