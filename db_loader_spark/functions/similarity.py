"""Vector similarity search over an embedding column (array<float>).

Two paths, as a 100 TB pipeline needs both:

- **brute-force top-k**: broadcast the (small) query set against the
  candidate corpus — exact, one pass over the data, no index. The right
  baseline and the verifier for any ANN variant.
- **sign-LSH bucketed ANN**: bucket vectors by the sign pattern of their
  leading dimensions (a degenerate random-hyperplane LSH whose
  hyperplanes are the axes — deterministic, no RNG, engine-portable),
  then search only within the query's bucket. Turns the all-pairs join
  into a per-bucket join; at scale you'd raise n_bits and OR several
  hash tables.

Dot products are *unrolled* fixed-order Column expressions (left-assoc
addition over dims), not aggregations, so results are bit-identical to
any engine evaluating the same expression order — which is what lets
DuckDB oracle-check a floating-point operator.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from db_loader_spark.functions import fan_out

EMBEDDING_DIM = 64  # driver testdata dimension (TESTDATA.md / embeddings.parquet)


def dot_unrolled(a: Column, b: Column, dim: int = EMBEDDING_DIM) -> Column:
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    ]
    return functools.reduce(operator.add, terms)


def norm_unrolled(a: Column, dim: int = EMBEDDING_DIM) -> Column:
    return F.sqrt(dot_unrolled(a, a, dim))


def with_norm(emb: DataFrame, vec_col: str = "embedding", dim: int = EMBEDDING_DIM) -> DataFrame:
    return emb.withColumn("nrm", norm_unrolled(F.col(vec_col), dim))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column, dim: int = EMBEDDING_DIM) -> Column:
    return dot_unrolled(a, b, dim) / (norm_a * norm_b)


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).

    O(n²) by design — the exact verifier; the LSH path is the scale
    route. Threshold compares the ROUNDed value so the cut is stable."""
    a = fan_out(emb).alias("a")
    b = emb.alias("b")
    cos = cosine(
        F.col(f"a.{vec_col}"),
        F.col(f"b.{vec_col}"),
        norm_unrolled(F.col(f"a.{vec_col}"), dim),
        norm_unrolled(F.col(f"b.{vec_col}"), dim),
        dim,
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(cos, 3).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def brute_force_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors for rows matching ``query_pred``.

    The query side is filtered then broadcast — the corpus is scanned
    once, never shuffled. Rank ties break on neighbor id (deterministic).
    """
    q = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(emb).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cos = cosine(
        F.col("q_vec"),
        F.col("c_vec"),
        norm_unrolled(F.col("q_vec"), dim),
        norm_unrolled(F.col("c_vec"), dim),
        dim,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the leading dimensions."""
    bits = [
        F.when(F.element_at(vec, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(1, n_bits + 1)
    ]
    return F.concat(*bits)


def lsh_bucket_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", n_bits: int = 8
) -> DataFrame:
    """Bucket histogram — the data you size an IVF/LSH index from."""
    return (
        emb.select(sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    The equi-join on bucket replaces the cross join — the scan fans out
    only within buckets (recall is tunable via n_bits / multiple tables).
    """
    bucketed = emb.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
    q = bucketed.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    c = fan_out(bucketed).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    cos = cosine(
        F.col("q_vec"),
        F.col("c_vec"),
        norm_unrolled(F.col("q_vec"), dim),
        norm_unrolled(F.col("c_vec"), dim),
        dim,
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
