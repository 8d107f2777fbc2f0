"""Skew-resistant aggregation: two-phase salted groupBy.

When one group key carries a disproportionate share of rows (the
power-law reality of user/document keys at 100 TB), a plain groupBy
sends the whole hot key to one reducer. Salting splits each key into
``n_salts`` sub-groups for the first (map-heavy) aggregation, then
re-aggregates the tiny salted partials — the hot key's work spreads
across ``n_salts`` tasks and the second shuffle carries only
keys × n_salts rows.

Only associative-commutative aggregates (sum/count/min/max) decompose
this way; avg = salted sum / salted count. AQE's skew-join splitting
handles *join* skew automatically (session.py); this operator is the
equivalent for aggregation, where AQE cannot help because the skew is
inside a single group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    n_salts: int = 16,
    salt_src: Column | None = None,
) -> DataFrame:
    """GroupBy ``keys`` with salted two-phase sum/count.

    ``sum_cols`` maps input column → output alias. The default salt is
    row-position-based (``monotonically_increasing_id``), NOT value
    -based: a hot key whose rows all carry identical values would
    collapse a value hash into one salt bucket and silently defeat the
    mitigation. Position salting spreads any key's rows round-robin-ish
    over ``n_salts`` sub-groups; associative re-aggregation makes the
    result independent of which row got which salt — exactly a plain
    ``groupBy(keys).agg(sum…, count…)``.
    """
    if salt_src is None:
        salt_src = F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{a}") for c, a in sum_cols.items()],
        F.count("*").alias("_n"),
    )
    final_aggs = [F.sum(f"_s_{a}").alias(a) for a in sum_cols.values()]
    if count_alias:
        final_aggs.append(F.sum("_n").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Manual skew mitigation for a fact⋈dim equi-join that cannot
    broadcast: salt the fact side into ``n_salts`` sub-keys and
    replicate the dim side once per salt, so the hot key's rows spread
    over ``n_salts`` reducers instead of one.

    This is the HAND-ROLLED alternative to AQE's skew-join splitting
    (``spark.sql.adaptive.skewJoin.enabled``, on by default in
    session.get_spark). Measured head-to-head in SCALE.md: prefer AQE —
    it detects skew from runtime statistics, splits only the oversized
    partitions, and costs nothing when the data turns out balanced,
    while salting taxes EVERY row with a dim replication ×n_salts and
    a wider shuffle whether or not skew exists. Reach for this operator
    only where AQE cannot act: a skewed key feeding a non-last join
    stage whose output partitioning a later stage must reuse, an
    engine/runtime with AQE off, or join types AQE's splitter skips
    (it never splits the build side of a shuffled hash join it'd have
    to replicate anyway). Position-based salt (not value hash) for the
    same reason as salted_agg: identical-valued hot rows must not
    collapse into one salt bucket.

    Result equals ``fact.join(dim, key, how)`` for inner/left joins
    (every fact row keeps exactly its one salt; the replicated dim
    matches it exactly once)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full would duplicate unmatched dim rows per salt)"
        )
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")
