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


# ---- Count-Min Sketch (Cormode & Muthukrishnan, 2005) ----
#
# The frequency twin of KMV's distinct counting: d independent hash
# rows of w counters; an item's estimate is the MIN over its d cells,
# an overestimate bounded by eps*N with probability 1-delta
# (w = ceil(e/eps), d = ceil(ln 1/delta)). Engine-portable for the
# same reason as KMV: the row hashes are md5-derived, so DuckDB can
# replay the whole sketch and the driver hash-checks the ESTIMATES.
# The sketch is mergeable (cell-wise sum), constant-memory (d*w
# cells), and builds with map-side combine — the standard fleet-wide
# heavy-hitter statistic at 100 TB, where a full exact vocabulary
# count is a luxury the sketch replaces.

CMS_D = 4
CMS_W = 256


def cms_bucket_sql(col: str, j: str, w: int = CMS_W) -> str:
    """Row-j bucket of a value: md5 32-bit prefix of ('cms<j>:'||x) % w."""
    return (
        f"pmod(CAST(conv(substring(md5(concat('cms', {j}, ':', {col})), 1, 8),"
        f" 16, 10) AS BIGINT), {w})"
    )


def cms_heavy_hitters(
    occurrences: DataFrame,
    value_col: str,
    k: int = 10,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Top-k heavy hitters with their CMS estimates next to exact
    counts — the self-evaluation shape (ann_recall / kmv_distinct):
    (value, true_count, cms_estimate). cms_estimate >= true_count
    always (CMS never undercounts); equality means no colliding mass
    in any of the d rows.

    Build cost: one map-side-combined count shuffle (Zipf-bounded
    vocabulary), then d x |vocab| tiny rows into the (j, bucket)
    aggregate — the sketch itself is d*w cells regardless of corpus
    size. The top-k side is broadcast into the estimate join."""
    counts = occurrences.groupBy(F.col(value_col).alias("val")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    rows = counts.select(
        "val",
        "cnt",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).withColumn("b", F.expr(cms_bucket_sql("val", "j", w)))
    sketch = rows.groupBy("j", "b").agg(F.sum("cnt").alias("cell"))
    top = (
        counts.orderBy(F.col("cnt").desc(), "val")
        .limit(k)
        .select("val", "cnt")
    )
    top_cells = top.select(
        "val",
        "cnt",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).withColumn("b", F.expr(cms_bucket_sql("val", "j", w)))
    return (
        sketch.join(F.broadcast(top_cells), ["j", "b"])
        .groupBy("val", "cnt")
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
        .select(
            F.col("val").alias(value_col),
            F.col("cnt").alias("true_count"),
            "cms_estimate",
        )
    )
