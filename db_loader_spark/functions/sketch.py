"""Distinct-count sketching: deterministic KMV (k minimum values).

The training-pipeline question this answers at 100 TB: "how many
distinct tokens / urls / doc fingerprints does this corpus have, per
group, without holding the distinct set anywhere?" The classical KMV
estimator (Bar-Yossef et al., RANDOM'02; the ancestor of the theta
sketch) keeps only the k smallest hash values per group: if the k-th
smallest of n uniform hashes in [0,1) is h_k, then n ≈ (k-1)/h_k.

Why KMV and not HLL here: Spark's datasketches HLL is a black-box
binary whose estimate no other engine reproduces — a rows-only check
at best. KMV over a deterministic hash is ENGINE-PORTABLE: the k-th
smallest md5-prefix is the same value in any engine, so the DuckDB
oracle replays the whole sketch and the driver hash-checks the
estimate itself. Same design rule as md5-MinHash (functions/dedup.py).

Hash: first 13 hex chars of md5 = 52 bits, mapped to [0,1) by
dividing by 2^52. 52 bits fit a double's mantissa EXACTLY, so the
fraction is exact on every IEEE engine — no rounding skew between
Spark and the oracle (the reason for 13 and not 15/16 chars).

Scale shape: one map-side-combined shuffle for the global (group,
value) distinct — on token-like data the distinct set is Zipf-bounded
(vocabulary ≪ corpus) — then one window sort per group over only the
distinct hashes. The sketch is MERGEABLE (k smallest of a union = k
smallest of the per-shard k-smallest), which is what makes it a
fleet-wide statistic at deployment: shards ship k values each, the
coordinator merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

KMV_BITS = 52  # 13 hex chars — exact in an IEEE double mantissa
KMV_DENOM = float(1 << KMV_BITS)


def kmv_hash(col: str) -> F.Column:
    """Deterministic uniform fraction in [0,1): md5 52-bit prefix."""
    return (
        F.expr(
            f"CAST(conv(substring(md5({col}), 1, {KMV_BITS // 4}), 16, 10) AS BIGINT)"
        )
        / F.lit(KMV_DENOM)
    )


def kmv_distinct(
    pairs: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch, with the
    exact count alongside (the self-evaluation every estimator ships
    with — the ann_recall pattern): (group, n_exact, kmv_estimate,
    rel_err).

    Groups with fewer than k distinct values have no k-th hash; the
    estimator falls back to the exact count (which the sketch holds
    verbatim in that regime — standard KMV behavior)."""
    d = pairs.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val")).distinct()
    h = d.select("grp", kmv_hash("val").alias("h"))
    w = W.partitionBy("grp").orderBy("h")
    ranked = h.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("grp").agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("h_k").isNull(), F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(k - 1) / F.col("h_k")))
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_exact").cast("long").alias("n_exact"),
        est.cast("long").alias("kmv_estimate"),
        F.round(est.cast("double") / F.col("n_exact"), 3).alias("rel_err"),
    )
