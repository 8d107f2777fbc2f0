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

Dot products are *unrolled* fixed-order expressions (left-assoc
addition over dims), not aggregations, so results are bit-identical to
any engine evaluating the same expression order — which is what lets
DuckDB oracle-check a floating-point operator.

Implementation note: the unrolled trees are built as ONE SQL string per
expression (``F.expr``), not composed Column-by-Column — a 64-dim dot
product assembled from ~190 py4j calls costs ~1.5 s of *driver* time per
query construction; one parsed string costs ~1 ms and produces the
identical Catalyst expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from db_loader_spark.functions import fan_out

EMBEDDING_DIM = 64  # driver testdata dimension (TESTDATA.md / embeddings.parquet)


def dot_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Unrolled fixed-order dot product as a SQL fragment.

    ``a``/``b`` are SQL references to array<float> columns (may be
    alias-qualified, e.g. ``"a.embedding"``). Array subscript is
    0-based in Spark SQL."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(dim)
    )


def norm_sql(a: str, dim: int = EMBEDDING_DIM) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str, dim: int = EMBEDDING_DIM) -> Column:
    return F.expr(f"({dot_sql(a, b, dim)}) / ({norm_a} * {norm_b})")


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).

    O(n²) by design — the exact verifier; the LSH path is the scale
    route. Threshold compares the ROUNDed value so the cut is stable.
    Norms are stamped per row at scan time so the joined-row expression
    pays only the dot product."""
    a = fan_out(emb).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a_"),
        F.expr(norm_sql(vec_col, dim)).alias("nrm_a"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b_"),
        F.expr(norm_sql(vec_col, dim)).alias("nrm_b"),
    )
    cos = cosine_expr("vec_a_", "vec_b_", "nrm_a", "nrm_b", dim)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
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
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("q_nrm"),
    )
    # No fan_out here: the norm is 64 flops/row and the broadcast join
    # parallelizes with the scan splits — a shuffle would cost more
    # than the work it spreads.
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("c_nrm"),
    )
    cos = cosine_expr("q_vec", "c_vec", "q_nrm", "c_nrm", dim)
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def sign_bucket_sql(vec: str, n_bits: int = 8) -> str:
    """Deterministic LSH bucket: sign bits of the leading dimensions."""
    bits = ", ".join(
        f"CASE WHEN {vec}[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(n_bits)
    )
    return f"concat({bits})"


def lsh_bucket_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", n_bits: int = 8
) -> DataFrame:
    """Bucket histogram — the data you size an IVF/LSH index from."""
    return (
        emb.select(F.expr(sign_bucket_sql(vec_col, n_bits)).alias("bucket"))
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
    bucketed = emb.withColumn("bucket", F.expr(sign_bucket_sql(vec_col, n_bits)))
    q = bucketed.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("q_nrm"),
        "bucket",
    )
    # No fan_out: per-row work before the (broadcast) join is trivial;
    # parallelism comes from the scan splits.
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("c_nrm"),
        "bucket",
    )
    cos = cosine_expr("q_vec", "c_vec", "q_nrm", "c_nrm", dim)
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
