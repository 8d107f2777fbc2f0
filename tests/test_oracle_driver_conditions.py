"""Regression pin for the r7/r8 empty-artifact root cause.

The external correctness harness runs each oracle on a DEFAULT DuckDB
connection (no memory_limit, threads = n_cpus — 32 on the driver box).
Every local sweep and the judge's re-runs used the BOUNDED connection
from db_loader_spark.oracle.duck_connection (16 GB + spill + 8
threads), which masked a fatal config-dependence: the dedup_semantic
and ann_ivfpq_topk oracles re-inlined the non-materialized k-means
trainer CTEs at every reference, and under 32 threads the resulting
plan nondeterministically died with std::bad_alloc (observed 2/2 and
3/3 under default config pre-fix, at only ~1.5 GB RSS on a 128 GB
box). A bad_alloc escaping a DuckDB worker thread can terminate() the
whole harness process — which is exactly how CORRECTNESS_r07/r08 came
back as literal `{}` while bench (no DuckDB) ran green in the same
session.

Fix: _KM_CELLS_CTES stages are MATERIALIZED (similarity.py). This test
replays the DRIVER's conditions — default connection via the shared
`python -m db_loader_spark.oracle` probe body, fresh SUBPROCESS so a
terminate() cannot take pytest down — for every trainer-CTE consumer
in the registry. scripts/oracle_cost.py sweeps the full registry the
same way; run it whenever an oracle gains a CTE.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every registry oracle embedding the shared _KM_CELLS_CTES trainer:
# the two that actually crashed the driver harness in r7/r8 first,
# then the remaining consumers of the identical SQL text — a future
# edit to the trainer (or a consumer's own CTEs) that reintroduces
# plan explosion must fail HERE, whichever consumer it bites.
_FRAGILE = [
    "dedup_semantic",
    "ann_ivfpq_topk",
    "ann_ivf_topk",
    "ann_ivf_disk_topk",
    "t_stream_ann_index",
]


@pytest.mark.parametrize("name", _FRAGILE)
def test_oracle_survives_default_duckdb_config(name, sf_dir):
    r = subprocess.run(
        [sys.executable, "-m", "db_loader_spark.oracle", name, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=_REPO,
    )
    assert r.returncode == 0, f"{name} oracle died under default config: {r.stderr[-500:]}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] > 0
    # generous bound: pre-fix these either crashed or (bounded) took
    # 13-35 s; post-fix all run in 1.5-8 s. 60 s flags a structural
    # regression without being timing-flaky.
    assert out["wall_s"] < 60, f"{name} oracle took {out['wall_s']}s under default config"
