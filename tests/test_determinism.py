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
# position-salted aggregation, mapInPandas, iterative argmax training
# (cache cleared between runs so the second run RETRAINS), rounded
# transcendental ranking, and the partition-pruned disk index.
REPRESENTATIVE = [
    "q1_pricing_summary",
    "t_session_window",
    "dedup_minhash_lsh",
    "dedup_components",
    "ann_ivf_topk",
    "a_salted_agg",
    "multimodal_features",
    "text_bpe_train",
    "curation_weighted_sample",
    "ann_ivf_disk_topk",
    # r7 mechanisms: the blocked prefix sum (block boundaries must not
    # perturb bin ids), the one-pass integer-moments rewrite, the full
    # CLI ingest (fresh csv dir per run — CSV append must not leak
    # across runs), and a full availableNow drain with fresh
    # checkpoints committing through the manifest layer
    "text_pack_bins",
    "a_moments",
    "e2e_cli_ingest",
    "t_stream_lakehouse",
]


def _reset_session_caches(name: str) -> None:
    """Clear any session cache the query would otherwise serve from, so
    the second run re-executes the full mechanism (text_bpe_train must
    be deterministic across genuine RETRAINS, not cache hits)."""
    if name == "text_bpe_train":
        from db_loader_spark.queries.textops import _BPE_TRAINED

        _BPE_TRAINED.clear()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_double_run_identical(spark, name):
    from db_loader_spark.queries import diagnostic_queries

    spec = {**all_queries(), **diagnostic_queries()}[name]
    _reset_session_caches(name)
    a = sorted(map(tuple, spec.spark(spark, SF).collect()))
    _reset_session_caches(name)
    b = sorted(map(tuple, spec.spark(spark, SF).collect()))
    assert a == b, f"{name}: two runs disagree"
