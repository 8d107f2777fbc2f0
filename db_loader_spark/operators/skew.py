"""Skew-resistant aggregation and joins: two-phase salted operators.

Scope — when salting an AGGREGATION actually matters. For algebraic
aggregates (sum/count/min/max) Spark's map-side partial aggregation
already defuses a hot group key: each map task emits ONE combined row
per key before the shuffle, so the hot key's reducer receives at most
``n_map_partitions`` rows no matter how many raw rows the key has.
Salting buys nothing there. It matters when the partial-agg defense
fails: aggregation state that grows with the group (``collect_list``/
``collect_set``, exact percentile buffers), hash-aggregate spill
fallback under huge per-partition key cardinality, or engines/paths
without a combiner. ``salted_agg`` exists for those cases — and as
the documented pattern — not as a blanket replacement for groupBy.

AQE's skew-join splitting handles *join* skew automatically
(session.py, measured head-to-head in SCALE.md — AQE first,
``salted_join`` only where it cannot act); it does nothing for
aggregation state, which is what the salted two-phase shape bounds:
each salted sub-group's state is ~1/n_salts of the hot key's.
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
    collect_cols: dict[str, str] | None = None,
) -> DataFrame:
    """GroupBy ``keys`` with salted two-phase sum/count.

    See the module docstring for when this beats a plain groupBy (state
    -heavy aggregates / combiner-less paths — for plain sum/count the
    built-in partial aggregation already handles hot keys). ``sum_cols``
    maps input column → output alias. The default salt is
    row-position-based (``monotonically_increasing_id``), NOT value
    -based: a hot key whose rows all carry identical values would
    collapse a value hash into one salt bucket and silently defeat the
    mitigation. Position salting spreads any key's rows round-robin-ish
    over ``n_salts`` sub-groups; associative re-aggregation makes the
    result independent of which row got which salt — exactly a plain
    ``groupBy(keys).agg(sum…, count…)``.

    ``collect_cols`` (input column → output alias) is the STATE-HEAVY
    case the module docstring describes — the one where salting
    actually beats a plain groupBy: per-(key, salt) partial
    ``collect_list`` buffers hold ~1/n_salts of a hot key's rows, and
    the final phase flattens the ≤ n_salts partial arrays. The result
    array is ``sort_array``-ed so it is deterministic (a multiset
    rendered canonically) regardless of salt routing.
    """
    if salt_src is None:
        salt_src = F.monotonically_increasing_id()
    collect_cols = collect_cols or {}
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{a}") for c, a in sum_cols.items()],
        *[F.collect_list(c).alias(f"_l_{a}") for c, a in collect_cols.items()],
        F.count("*").alias("_n"),
    )
    final_aggs = [F.sum(f"_s_{a}").alias(a) for a in sum_cols.values()]
    final_aggs += [
        F.sort_array(F.flatten(F.collect_list(f"_l_{a}"))).alias(a)
        for a in collect_cols.values()
    ]
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
