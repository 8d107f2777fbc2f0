"""Query registry: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle for DuckDB (or ``None`` for genuinely
non-SQL-expressible operators, which get a weaker rows-only check).

Determinism rules (the driver hash-compares values order-insensitively):
- every computed column is aliased identically in Spark and oracle SQL;
- floating-point aggregates are ROUNDed (2-4 dp) on BOTH sides so
  FP summation order can't flip the hash;
- no raw timestamp outputs — always formatted strings or dates;
- DuckDB ``SUM(int)`` returns HUGEINT → always CAST to BIGINT in oracles
  to match Spark's LongType.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """A named query: Spark impl + DuckDB oracle SQL (None = rows-only)."""

    spark: SparkQuery
    oracle: str | None
    doc: str = ""


def settle(result: DataFrame, *stages: DataFrame) -> DataFrame:
    """Cache-lifetime discipline for multi-stage queries: eagerly
    materialize a SMALL result while the staged caches are hot, then
    unpersist the corpus-sized intermediates before returning.

    Queries that persist big intermediates (funnel stages, encoder
    output) would otherwise pin MEMORY_AND_DISK blocks for the whole
    session — in a driver run executing 70+ queries those leaks
    accumulate and skew later timings. After ``settle`` the only block
    still pinned is the result itself (a few rows), and the caller's
    later ``.collect()`` reads that tiny cache instead of recomputing
    the released stages. Only use on results that are small by
    construction (counts, top-k); never on fact-sized frames.
    """
    out = result.persist()
    out.count()  # one cheap job: stages are hot, result is tiny
    for s in stages:
        s.unpersist()
    return out


def diagnostic_queries() -> dict[str, QuerySpec]:
    """Verifier/diagnostic specs value-checked by pytest
    (tests/test_oracle_queries.py) but NOT shipped in the driver
    registry — the r6 consolidation (VERDICT r5 #8): deliberately
    quadratic small-data verifiers (all-pairs Jaccard/cosine) and the
    LSH bucket-sizing diagnostic keep their DuckDB oracles locally
    without occupying rotation slots the scale-path operators need.
    r7 added the sibling-redundant demotions (ann_recall, the BMP
    codec arm, multimodal_embed_ann, a_quantiles) under the
    steady-state window math recorded at NEXT_UP."""
    from db_loader_spark.queries import dedup, multimodal, relational, similarity

    merged: dict[str, QuerySpec] = {}
    for mod in (similarity, dedup, multimodal, relational):
        for name, spec in getattr(mod, "DIAGNOSTICS", {}).items():
            if name in merged:
                raise ValueError(f"duplicate diagnostic name {name!r}")
            merged[name] = spec
    return merged


# DRIVER_WINDOW_SIZE entries of WINDOW are exactly what the external
# driver value-checks; test_registry_integrity pins len(WINDOW) == 50
# so a miscounted edit can't silently shift which keys get witnessed.
DRIVER_WINDOW_SIZE = 50

WINDOW = [
    # — rule 1 (oldest evidence): the 24 r6 NEXT_UP keys — queued in
    #   positions 51+ last round, so they have NEVER seen a driver row
    #   (r6's verdict re-verified all 24 locally; this round puts them
    #   under the external hash, exactly as the r6 prep note staged) —
    "text_bm25_topk",
    "curation_weighted_sample",
    "curation_dsir_weight",
    "ann_ivf_disk_topk",
    "t_stream_mview",
    "t_sliding_counts",
    "text_cms_topk",
    "jn_fuzzy_join",
    "w_moving_avg",
    "a_hll_distinct",
    "dedup_bloom_prefilter",
    "t_stream_sessions",  # r7: epoch-parquet publish (also rule 2)
    "cdc_snapshot_diff",  # r7: manifest replay/meta fixes (also rule 2)
    "a_profile_stats",
    "a_histogram",
    "a_table_fingerprint",
    "g_triangle_count",
    "g_pagerank",
    "a_quantile_sample",
    "scan_manifest_pruned",  # r7: manifest meta fixes (also rule 2)
    "t_snapshot_incremental",  # r7: manifest meta fixes (also rule 2)
    "t_snapshot_upsert",  # r7: merge persist + replay no-op (also rule 2)
    "t_sliding_hll",
    "a_moments",  # r7: exact-integer moments rewrite (also rule 2)
    # — rule 2 (touched this round, must be witnessed this round) —
    "e2e_cli_ingest",  # NEW r7: E1 CLI front door under the hash
    "text_pack_bins",  # r7: block-partitioned prefix-sum packing
    "curation_e2e",  # r7: same packing rewrite in stage 5
    "dedup_semantic",  # r7: hot-cell sign-bit sub-split
    # — rule 1 (oldest r5 evidence, out of window for two rounds) —
    "q1_pricing_summary", "q3_segment_revenue", "q5_region_revenue",
    "q10_returned_items", "q_top_customers",
    "a1_distinct_pairs", "a2_max_id", "a3_filtered_count",
    "a4_count_distinct", "a6_run_summary", "a7_id_assignment",
    "w_running_sum", "w_topk_per_group", "set_ops", "rollup_revenue",
    "eav_pivot", "p10_find_first", "dedup_exact",
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
    "ann_sq_rerank",
]

# WINDOW-OVERFLOW QUEUE (policy, r6): brand-new keys beyond window
# capacity queue HERE, in positions 51+, and MUST front the next
# round's window (rule-1-oldest by construction: no driver evidence
# yet). A queued key ships only with full local value verification at
# BOTH SFs recorded in the round notes. r7 adds SIX new keys against
# FOUR demotions (net +2, registry 115 ≤ 120): e2e_cli_ingest is
# windowed directly under rule 2; the five below are queued.
NEXT_UP: list[str] = [
    "t_stream_lakehouse",  # NEW r7 (stream ingest via manifest appends)
    "t_stream_ann_index",  # NEW r7 (incremental IVF list maintenance)
    "text_bpe_pack",  # NEW r7 (packing priced in subword tokens)
    "ann_pq_topk",  # NEW r7 (PQ-ADC: coded-corpus scan + exact rerank)
    "ann_ivfpq_topk",  # NEW r7 (IVF-PQ residual coding, probed ADC)
]
# R8 WINDOW PREP (execute at round-8 start): rule 1 fronts the
# NEXT_UP queue (zero driver evidence) and then these 13 r5-evidence
# keys — out of window for THREE rounds by then: dedup_embedding_lsh,
# dedup_embedding_components, multimodal_features,
# multimodal_frame_sample,
# jn1_dim_lookup_join, jn2_contains_join, jn4_anti_join_idempotence,
# jn7_fk_validation, a_salted_agg, a_hash_sample,
# text_decontaminate, text_kmv_vocab, text_lm_score (the cohort's
# other four members — ann_recall, multimodal_decode_bmp,
# multimodal_embed_ann, a_quantiles — were demoted to DIAGNOSTICS in
# r7, value checks retained in pytest; a_quantile_sample's windowed
# exact-alongside-sample scan already hashes the exact surface). The remaining 33
# slots go to the oldest r6-evidence keys (the r6 window's textops/
# curation/eventops/logshape families, CORRECTNESS_r06 rows), rule-2
# touches first. Every r7 WINDOW key rotates out on its fresh
# CORRECTNESS_r07 row; re-verify rotated-out keys locally at both SFs
# as always.
#
# STEADY-STATE MATH: a 50-slot window cycling every key within 2
# rounds supports AT MOST 100 keys. r7 started paying this down with
# FOUR sibling-redundant demotions (ann_recall, the BMP codec arm,
# multimodal_embed_ann, a_quantiles — registry ends r7 at 115); at r7
# every driver key is still ≤2 rounds old, but reaching a sustainable
# 100 needs ~15 more demotions or merges in r8. Remedy
# order: (1) demote keys whose scale path is fully represented by a
# windowed sibling to the pytest-oracle DIAGNOSTICS tier (value
# checks retained locally, slot freed); (2) merge union-compatible
# siblings into one hashed key; (3) only if neither reaches 100,
# write the longer cadence down as explicit policy with a per-cohort
# ledger. Net-new keys in r8 must be ≤ demotions that round.
# Also queued for r8 (touched-key rule kept it off this round): apply
# session.data_sized_shuffle to the OTHER multi-job settling wrappers
# (curation_funnel, dedup_components lineage, text_decontaminate)
# when they rotate into the window — curation_e2e measured 6.6 →
# 5.5 s from it in r7 and the sizing rule is scale-correct.


def all_queries() -> dict[str, QuerySpec]:
    """Union of every module's registry, insertion-ordered by theme."""
    from db_loader_spark.queries import (
        curation,
        dedup,
        ecj,
        eventops,
        logshape,
        multimodal,
        relational,
        similarity,
        streamingq,
        textops,
    )

    # ROTATION POLICY (deliberate, two-round cadence). The correctness
    # driver value-checks only the FIRST 50 registry entries in insertion
    # order; the registry holds more than 50 keys, so each round the
    # order is rotated by two rules, applied in priority order:
    #   1. Keys with the OLDEST driver evidence go first — no key may go
    #      two consecutive rounds without a green row.
    #   2. TOUCHED-KEY RULE (hard, added r5 after the r4 verdict showed
    #      perf commits landing after their keys rotated out): any key
    #      whose implementation changed this round — its wrapper, the
    #      operator functions it calls, or a shared helper in its lineage
    #      — MUST be inside this round's window. A change is witnessed by
    #      the external value-check the same round it lands, never only
    #      by local pytest.
    # Keys that rotate out are always re-verified locally against their
    # DuckDB oracles (scripts/check_oracle.py, both SFs) before shipping.
    # Since r6 the window is the EXPLICIT list below (module order was
    # the r5 mechanism; a named list keeps rule 2 auditable per-key).
    #
    # Round-7 window (50) =
    #  rule 1 — the 24 r6 NEXT_UP keys (zero driver rows ever; staged
    #  by the r6 prep note) + the 22 oldest r5-evidence keys
    #  (relational q1/q3/q5/q10/top-customers, a1-a7, w_running_sum /
    #  w_topk_per_group, set_ops/rollup/eav, p10, dedup_exact, the
    #  ANN quartet — out of window since r5);
    #  rule 2 — e2e_cli_ingest (new), text_pack_bins + curation_e2e
    #  (block-partitioned packing rewrite), dedup_semantic (hot-cell
    #  sub-split), plus the manifest-lineage and moments keys already
    #  fronted by rule 1 (t_snapshot_*, cdc_snapshot_diff,
    #  scan_manifest_pruned, t_stream_sessions, a_moments).
    # The 17 r5-evidence keys that did not fit (named in the R8 prep
    # note above) ride a third round on local both-SF re-verification
    # and MUST front the r8 window.
    window = WINDOW
    next_up = NEXT_UP
    merged: dict[str, QuerySpec] = {}
    for mod in (
        similarity,
        dedup,
        multimodal,
        relational,
        streamingq,
        textops,
        curation,
        eventops,
        ecj,
        logshape,
    ):
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = spec
    fronted = window + next_up
    missing = [k for k in fronted if k not in merged]
    if missing:
        raise ValueError(f"window names not in registry: {missing}")
    if len(fronted) != len(set(fronted)):
        raise ValueError("duplicate names in window/next_up")
    ordered = {k: merged[k] for k in fronted}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered
