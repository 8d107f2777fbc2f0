#!/usr/bin/env python
"""Bench-methodology timing of a few registry keys in isolation.

Usage: python scripts/time_keys.py [--sf sf_dir] key [key ...]

Same discipline as bench.py's headline loop: one warm run, System.gc,
then median of 3 timed runs (with the per-key cache resets bench.py
registers). For adjudicating a single optimization without paying the
full-suite wall clock.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_loader_spark.queries import all_queries
from db_loader_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    n = int(os.environ.get("TIME_KEYS_N", "3"))
    spark = get_spark("time-keys")
    registry = all_queries()
    registry["a2_max_id"].spark(spark, sf_dir).collect()  # session warm

    from bench import RESET_BEFORE_TIMING

    for name in args:
        spec = registry[name]
        warm = spec.spark(spark, sf_dir)
        warm.count()
        warm.unpersist()
        spark._jvm.System.gc()
        runs = []
        for _ in range(n):
            reset = RESET_BEFORE_TIMING.get(name)
            if reset:
                reset()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.count()
            runs.append(time.perf_counter() - t0)
            df.unpersist()
        runs.sort()
        med = runs[(len(runs) - 1) // 2]
        print(f"{name}: med={med:.3f}s runs={[round(r, 3) for r in runs]}", flush=True)


if __name__ == "__main__":
    main()
