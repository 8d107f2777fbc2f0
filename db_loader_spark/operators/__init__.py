"""Reusable relational operators: sessionization (J1/J2), continuation
merge (P14), id assignment (A7), idempotent-append anti-join (JN4),
FK validation (JN7)."""

from db_loader_spark.operators.sessionize import (
    merge_continuations,
    route_sections,
    seq_split,
)
from db_loader_spark.operators.ids import assign_file_ids
from db_loader_spark.operators.idempotence import anti_join_new, fk_violations

__all__ = [
    "seq_split",
    "route_sections",
    "merge_continuations",
    "assign_file_ids",
    "anti_join_new",
    "fk_violations",
]
