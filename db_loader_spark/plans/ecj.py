"""ECJ log pipeline (src/parse_logs_ecj.clj — completed: the reference's
version does not compile, SURVEY.md §0).

Lifecycle: parameter file (k=v, S6) → EAV ``experiment`` rows; log file →
generation groups (boundary lines ``Generation:`` / ``of Run:``, S7/P15)
with continuation-line folding (P14) and key whitespace-stripping (P13)
→ EAV ``generations`` rows; dimension lookups (JN1/JN3) and idempotence
guards (JN4) are broadcast/anti joins against the dim tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from db_loader_spark.operators.idempotence import anti_join_new
from db_loader_spark.operators.sessionize import merge_continuations
from db_loader_spark.sources.text_logs import read_log_lines

BOUNDARY = r"Generation:|of Run:"  # P15 (src/parse_logs_ecj.clj:98-99)


def parse_ecj_params(spark: SparkSession, path: str) -> DataFrame:
    """S6: one ``key=value`` per line → EAV (file, param, value)
    (exp-param-vals, src/parse_logs_ecj.clj:62-65 — fixed)."""
    lines = read_log_lines(spark, path)
    parts = F.split(F.col("line"), "=", 2)
    return (
        lines.filter(F.col("line").contains("="))
        .select(
            "file",
            F.trim(parts.getItem(0)).alias("param"),
            F.trim(parts.getItem(1)).alias("value"),
        )
        .filter(F.col("param") != "")
    )


def parse_ecj_log(spark: SparkSession, path: str) -> DataFrame:
    """S7 + P14 + P13 + P2: ECJ log → (file, gen_group, param, value).

    gen_group is the 0-based generation-section index per file
    (read-gen, src/parse_logs_ecj.clj:89-105); continuation lines (no
    ':') fold into the previous line (group-gen :107-116); keys lose
    embedded whitespace (clean-data :118-123).
    """
    lines = read_log_lines(spark, path)
    w = (
        W.partitionBy("file")
        .orderBy("line_no")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    grouped = lines.withColumn(
        "gen_group", F.sum(F.col("line").rlike(BOUNDARY).cast("int")).over(w)
    )
    merged = merge_continuations(
        grouped,
        anchor=F.col("line").contains(":"),
        file_col="file",
        order_col="line_no",
    )
    # re-attach gen_group (the anchor row's group)
    merged = merged.join(
        grouped.select("file", "line_no", "gen_group"), ["file", "line_no"]
    )
    parts = F.split(F.col("line"), ": ", 2)
    return (
        merged.filter(F.col("line").contains(":"))
        .select(
            "file",
            "gen_group",
            F.regexp_replace(F.trim(parts.getItem(0)), r"\s+", "").alias("param"),
            F.trim(parts.getItem(1)).alias("value"),
        )
        .filter((F.col("param") != "") & F.col("value").isNotNull())
    )


def resolve_batch_dims(
    new_batches: DataFrame,
    users: DataFrame,
    problems: DataFrame,
    locations: DataFrame,
) -> DataFrame:
    """JN1/JN2/JN3 (new-batch, src/parse_logs_ecj.clj:41-48): resolve
    username→userid, folder→probid (contains-join), location→locid."""
    out = (
        new_batches.join(F.broadcast(users.select("userid", "username")), "username")
        .join(
            F.broadcast(problems.select("probid", "probname")),
            F.col("probname").contains(F.col("folder")),
        )
        .join(F.broadcast(locations.select("locid", "location")), "location")
    )
    return out


def guard_existing_batches(resolved: DataFrame, existing: DataFrame) -> DataFrame:
    """JN4 (src/parse_logs_ecj.clj:51-59): drop batches whose
    (userid, probid, locid, batchdate) already exists."""
    return anti_join_new(resolved, existing, ["userid", "probid", "locid", "batchdate"])
