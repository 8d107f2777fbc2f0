"""Double-run determinism: the driver hash-compares values, so any
run-to-run nondeterminism (unstable FP order reaching a rounded
boundary, partition-dependent sampling, cache effects) fails the gate
even when each single run 'looks right'. Run representative queries
twice in one session and require identical multisets of rows."""

from __future__ import annotations

import pytest

from db_loader_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

# One per mechanism family: two-phase FP sums, window sessionization,
# hash signatures + self-join, iterative fixpoint, IVF probe ranking,
# position-salted aggregation, mapInPandas.
REPRESENTATIVE = [
    "q1_pricing_summary",
    "t_session_window",
    "dedup_minhash_lsh",
    "dedup_components",
    "ann_ivf_topk",
    "a_salted_agg",
    "multimodal_features",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_double_run_identical(spark, name):
    spec = all_queries()[name]
    a = sorted(map(tuple, spec.spark(spark, SF).collect()))
    b = sorted(map(tuple, spec.spark(spark, SF).collect()))
    assert a == b, f"{name}: two runs disagree"
