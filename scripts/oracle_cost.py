"""Per-oracle DuckDB cost probe, DRIVER-CONDITIONS mirror.

The external correctness harness runs each oracle on ITS OWN DuckDB
connection with DEFAULT settings (no memory_limit, default threads)
next to a live Spark JVM. Two consecutive empty CORRECTNESS artifacts
(r7, r8) coincide with memory-heavy oracles entering the driver
window, and a malloc failure was once observed locally mid-sweep
(db_loader_spark/oracle.py:33-40). This probe measures, for each
registry oracle, wall time and peak RSS on an UNBOUNDED fresh
connection in a fresh subprocess — to find any oracle that could
plausibly OOM/stall the driver's harness at sf0.01.

Usage: python scripts/oracle_cost.py [sf_dir] [--window-only]
"""
import json
import os
import resource
import subprocess
import sys

sys.path.insert(0, "/root/repo")

CHILD = r"""
import json, os, resource, sys, time
import duckdb
sf_dir, name = sys.argv[1], sys.argv[2]
sys.path.insert(0, "/root/repo")
from db_loader_spark.queries import all_queries
sql = all_queries()[name].oracle
con = duckdb.connect()  # DRIVER CONDITIONS: no memory limit, default threads
from db_loader_spark.tables import TABLE_NAMES
for t in TABLE_NAMES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
t0 = time.time()
n = len(con.execute(sql).fetchall())
wall = time.time() - t0
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(json.dumps({"name": name, "wall_s": round(wall, 2), "peak_rss_mb": round(rss_mb), "rows": n}))
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
    window_only = "--window-only" in sys.argv
    from db_loader_spark.queries import WINDOW, all_queries

    registry = all_queries()
    names = [n for n in (WINDOW if window_only else registry) if registry[n].oracle]
    worst = []
    for name in names:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, sf_dir, name],
            capture_output=True, text=True, timeout=600,
        )
        if r.returncode != 0:
            print(json.dumps({"name": name, "error": r.stderr[-300:]}))
            worst.append((name, "CRASH"))
            continue
        line = r.stdout.strip().splitlines()[-1]
        print(line)
        d = json.loads(line)
        if d["wall_s"] > 20 or d["peak_rss_mb"] > 4096:
            worst.append((name, d))
    print("---")
    print("SUSPECTS:", json.dumps(worst) if worst else "none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
