"""CSV sink (K1/K2/K8, src/db_loader.clj:87-93,120-129,260-267,245-253).

The reference appends comma-joined rows with NO quoting — comma-bearing
values corrupt rows (SURVEY.md §7 bug list). Spark's CSV writer quotes
by default: a strictly safer superset, identical output on values
without commas/quotes. Header bootstrap (K2) becomes ``header=True``;
the 'clean' op (K8) is a directory delete.

At scale an append is a new set of part files per batch — no row-at-a-
time IO, no 500 MB manual flush (the shell path's buffer,
scripts/load_csv_to_cloud.sh:124-134).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def write_csv_table(
    df: DataFrame,
    out_dir: str,
    mode: str = "append",
    header: bool = True,
    compression: str | None = None,
) -> None:
    writer = df.write.mode(mode).option("header", header)
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(out_dir)


def clean_csvs(base_dir: str, tables: list[str] | None = None) -> list[str]:
    """K8: delete the named table dirs (or every child dir for 'all')."""
    base = Path(base_dir)
    removed = []
    # `tables=[]` must delete NOTHING — only an explicit None means
    # "every child dir" (an empty computed selection is not a wildcard).
    targets = (
        [p for p in base.iterdir() if p.is_dir()]
        if tables is None
        else [base / t for t in tables]
    )
    for p in targets:
        if p.exists():
            shutil.rmtree(p)
            removed.append(str(p))
    return removed
