#!/usr/bin/env python
"""ecj_star shared-subtree fold A/B at larger-than-bench input sizes
(VERDICT r15 #5: the sf0.1 negative — localCheckpoint of `parsed`
measured 1.215 -> 1.255 s — was to be re-tried where the duplicated
scan->merge->window chain costs real time).

assign_file_ids(mode='dense') derives its file list from `parsed`, so
the physical plan runs the whole line-build + continuation-merge +
boundary-window chain TWICE: once under the dense-id mapping's
BroadcastExchange and once as the probe side. Arm A is the shipped
shape; arm B lazily localCheckpoints `parsed` so both consumers read
one materialization. Input = the sf0.1 events table replicated KX
deterministically (shifted user_id/event_id: more files and more lines
per the same distribution).

Methodology: one staged input per scale, fresh noop-sink action per
timed run (bench protocol: warm, gc, median of 3), arms alternated.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loader_spark.operators.ids import assign_file_ids
from db_loader_spark.plans.ecj import ecj_log_eav
from db_loader_spark.session import get_spark
from db_loader_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def staged_events(spark, k: int) -> str:
    d = os.path.join(tempfile.gettempdir(), f"ecj_scale_{k}x")
    if os.path.isdir(os.path.join(d, "ev")):
        return d
    os.makedirs(d, exist_ok=True)
    ev = load_table(spark, SF_DIR, "events")
    big = (
        ev.withColumn("rep", F.explode(F.expr(f"sequence(0, {k - 1})")))
        .select(
            (
                F.col("user_id").cast("long")
                + F.col("rep").cast("long") * 1_000_000
            ).alias("user_id"),
            (
                F.col("event_id").cast("long")
                + F.col("rep").cast("long") * 1_000_000_000
            ).alias("event_id"),
            "event_type",
            "value",
        )
    )
    big.write.mode("overwrite").parquet(os.path.join(d, "ev"))
    return d


def lines_of(spark, d: str):
    e = spark.read.parquet(os.path.join(d, "ev"))
    payload = F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")
    return e.select(
        F.col("user_id").cast("string").alias("file"),
        F.col("event_id").alias("line_no"),
        F.when(
            F.col("event_type") == "error",
            F.concat(F.lit("Generation: "), F.col("event_id")),
        )
        .when(F.col("event_type") == "view", F.concat(F.lit("cont "), payload))
        .otherwise(F.concat(F.col("event_type"), F.lit(": "), payload))
        .alias("line"),
    )


def run_arm(spark, d: str, fold: bool) -> float:
    # the clock covers plan CONSTRUCTION too: a lazy localCheckpoint
    # under AQE executes its stages at construction time, so a
    # save-only window would silently exclude arm B's chain cost
    t0 = time.perf_counter()
    parsed = ecj_log_eav(lines_of(spark, d))
    if fold:
        parsed = parsed.localCheckpoint(eager=False)
    exps = assign_file_ids(parsed, file_col="file", mode="dense")
    out = exps.select("id", "file", "gen_group", "param", "value")
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    if fold:
        from db_loader_spark import cache

        cache.free_local_checkpoint(parsed)
    return wall


def main() -> int:
    scales = [int(s) for s in (sys.argv[1:] or ["1", "8", "32"])]
    spark = get_spark("ecj-scale")
    spark.range(1).count()
    for k in scales:
        d = staged_events(spark, k)
        rows = spark.read.parquet(os.path.join(d, "ev")).count()
        for fold in (False, True):
            run_arm(spark, d, fold)  # warm
            spark._jvm.System.gc()
            runs = sorted(run_arm(spark, d, fold) for _ in range(3))
            print(
                f"scale={k}x rows={rows} fold={'ckpt' if fold else 'dup '} "
                f"median={runs[1]:.3f} runs={[round(r, 3) for r in runs]}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
