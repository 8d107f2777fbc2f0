#!/usr/bin/env python
"""Clean single-key timing run with the bench protocol, for
round-over-round adjudication of one query's wall time (the
bench_history protocol: never adjudicate drift from a single full-suite
run — pair a fresh, alone-on-box measurement of the key at each HEAD).

Usage: python scripts/adjudicate_key.py KEY [sf_dir] [n_samples]

Methodology = bench.py's per-row protocol exactly: one warm run
(codegen compile), System.gc(), bench's own RESET_BEFORE_TIMING hook
(keys like text_bpe_train cache trained state — without the reset,
runs 2..N time a warm cache and the median adjudicates as a spurious
speedup against bench_history rows measured under the reset), then N
timed runs (median + middle range), unpersisting the result between
runs so CacheManager can't serve a settled result back to the next
sample. Fresh session, no concurrent jobs. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import RESET_BEFORE_TIMING
from db_loader_spark.queries import all_queries
from db_loader_spark.session import get_spark


def main() -> int:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("adjudicate")
    spec = all_queries()[key]
    reset = RESET_BEFORE_TIMING.get(key)
    # JVM/codegen warmup on an unrelated trivial query first
    all_queries()["a2_max_id"].spark(spark, sf_dir).collect()
    warm = spec.spark(spark, sf_dir)
    warm.count()
    warm.unpersist()
    runs = []
    for _ in range(n):
        spark._jvm.System.gc()
        if reset is not None:
            reset()
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.count()  # full plan; not an assert (python -O strips those)
        runs.append(time.perf_counter() - t0)
        df.unpersist()
    runs.sort()
    med = runs[(len(runs) - 1) // 2]
    # bench.py's spread statistic: 5+-sample rows report the TRIMMED
    # middle-3 range so spreads stay comparable with bench_history
    # rows regardless of sample count (bench.py's own trim rationale)
    if len(runs) >= 5:
        spread = (runs[-2] - runs[1]) / med if med else 0.0
    else:
        spread = (runs[-1] - runs[0]) / med if med else 0.0
    print(
        json.dumps(
            {
                "key": key,
                "sf_dir": sf_dir,
                "median": round(med, 4),
                "runs": [round(r, 4) for r in runs],
                "spread": round(spread, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
