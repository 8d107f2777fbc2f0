#!/usr/bin/env python
"""Per-query profiling harness for the r15 optimization round.

Usage:
  python scripts/profile_query.py <key> [key ...]   # time + job breakdown
  python scripts/profile_query.py --plan <key>      # explain("formatted")
  python scripts/profile_query.py --plan-out DIR --suffix before <key> ...

Timing methodology mirrors bench.py (warm run, System.gc, then N timed
runs taking the median, with bench's RESET_BEFORE_TIMING cache resets
applied before every timed run — without them a key like
text_bpe_train times its warm memo, not the computation) so numbers
here are comparable to the bench rows. For a per-job wall-time
breakdown use the Spark event-log probe instead; this script reports
per-key medians and plan dumps only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_loader_spark.queries import all_queries
from db_loader_spark.session import get_spark

N_TIMED = 3


def timed(fn, n=N_TIMED, reset=None):
    runs = []
    for _ in range(n):
        if reset:
            reset()
        t0 = time.perf_counter()
        out = fn()
        runs.append(time.perf_counter() - t0)
        try:
            out.unpersist()
        except Exception:
            pass
    runs.sort()
    return runs[(len(runs) - 1) // 2], runs


def main() -> int:
    args = sys.argv[1:]
    plan_mode = "--plan" in args
    args = [a for a in args if a != "--plan"]
    plan_out = None
    suffix = "before"
    if "--plan-out" in args:
        i = args.index("--plan-out")
        plan_out = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    registry = all_queries()
    registry["a2_max_id"].spark(spark, sf_dir).collect()  # session warm

    for key in keys:
        spec = registry[key]
        if plan_mode or plan_out:
            from db_loader_spark import cache

            with cache.plan_only():
                df = spec.spark(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            if plan_out:
                path = os.path.join(plan_out, f"{key}_{suffix}.txt")
                with open(path, "w") as fh:
                    fh.write(txt)
                print(f"wrote {path} ({len(txt)} chars)")
            else:
                print(f"===== {key} =====")
                print(txt)
            continue
        # warm
        t0 = time.perf_counter()
        warm = spec.spark(spark, sf_dir)
        warm.count()
        warm.unpersist()
        warm_s = time.perf_counter() - t0
        spark._jvm.System.gc()

        def run_once(spec=spec):
            df = spec.spark(spark, sf_dir)
            df.count()
            return df

        from bench import RESET_BEFORE_TIMING

        med, runs = timed(run_once, reset=RESET_BEFORE_TIMING.get(key))
        print(
            f"{key:32s} med={med:7.3f}s warm={warm_s:7.3f}s "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
