"""Vector similarity search over an embedding column (array<float>).

Two paths, as a 100 TB pipeline needs both:

- **brute-force top-k**: broadcast the (small) query set against the
  candidate corpus — exact, one pass over the data, no index. The right
  baseline and the verifier for any ANN variant.
- **sign-LSH bucketed ANN**: bucket vectors by the sign pattern of a
  dimension slice (a random-hyperplane LSH whose hyperplanes are the
  axes — deterministic, no RNG, engine-portable), with ``n_tables``
  hash tables over disjoint slices OR-ed together (candidate = bucket
  collision in ANY table). Turns the all-pairs join into a per-bucket
  join with amplified recall; n_bits trades candidate volume for
  per-table recall, n_tables buys recall at linear fan-out cost.

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


def lsh_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Embedding near-dup at scale: multi-table sign-LSH candidate pairs
    verified by exact cosine ≥ threshold.

    The scale twin of :func:`cosine_pairs` (the O(n²) verifier): the
    self-join keys on (tbl, bucket) so only same-bucket pairs are
    scored — candidate volume ~ Σ_bucket n_b², near-linear when buckets
    stay balanced (2^n_bits per table; raise n_bits as the corpus
    grows). The cosine filter runs INSIDE the join output before the
    distinct, so far pairs never reach the dedup shuffle; n_tables
    OR-amplifies recall exactly as in ann_lsh_topk, measured — not
    assumed — via comparison against cosine_pairs (see
    tests/test_empty_inputs.py::test_lsh_near_pairs_subset_of_exact).
    Approximate by construction: a qualifying pair colliding in NO
    table is missed; every emitted pair is exactly verified.
    """
    buckets = F.expr(multi_table_buckets_sql(vec_col, n_bits, n_tables, dim))

    def hashed(suffix: str) -> DataFrame:
        return emb.select(
            F.col(id_col).alias(f"id_{suffix}"),
            F.col(vec_col).alias(f"vec_{suffix}_"),
            F.expr(norm_sql(vec_col, dim)).alias(f"nrm_{suffix}"),
            F.explode(buckets).alias("tb"),
        ).select(
            f"id_{suffix}",
            f"vec_{suffix}_",
            f"nrm_{suffix}",
            F.col("tb.tbl").alias("tbl"),
            F.col("tb.bucket").alias("bucket"),
        )

    cos = cosine_expr("vec_a_", "vec_b_", "nrm_a", "nrm_b", dim)
    return (
        hashed("a")
        .join(hashed("b"), ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round(cos, 3).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        # collapse multi-table collisions (deterministic triple)
        .distinct()
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


def sign_bucket_sql(vec: str, n_bits: int = 8, offset: int = 0) -> str:
    """Deterministic LSH bucket: sign bits of ``n_bits`` dimensions
    starting at ``offset`` (a random-hyperplane LSH whose hyperplanes
    are the axes — no RNG, engine-portable)."""
    bits = ", ".join(
        f"CASE WHEN {vec}[{offset + i}] >= 0 THEN '1' ELSE '0' END"
        for i in range(n_bits)
    )
    return f"concat({bits})"


def multi_table_buckets_sql(
    vec: str, n_bits: int = 8, n_tables: int = 4, dim: int = EMBEDDING_DIM
) -> str:
    """Array of (tbl, bucket) structs — one sign-LSH hash table per
    disjoint dimension slice. Exploding this is the OR-amplification
    construction: a pair is a candidate if it collides in ANY table,
    which lifts per-table recall r to 1-(1-r)^n_tables while each
    table keeps its full 2^n_bits selectivity.

    The slices must fit the vector: an out-of-range subscript reads
    NULL, whose sign CASE emits a constant '0' bit — an overflow table
    would silently put the ENTIRE corpus in one bucket and turn the
    candidate join quadratic, so over-allocation fails loudly here."""
    if n_bits * n_tables > dim:
        raise ValueError(
            f"{n_tables} tables x {n_bits} bits need {n_bits * n_tables} dims "
            f"but vectors have {dim}"
        )
    structs = ", ".join(
        f"struct({t} AS tbl, {sign_bucket_sql(vec, n_bits, t * n_bits)} AS bucket)"
        for t in range(n_tables)
    )
    return f"array({structs})"


def lsh_bucket_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", n_bits: int = 8
) -> DataFrame:
    """Bucket histogram — the data you size an IVF/LSH index from."""
    return (
        emb.select(F.expr(sign_bucket_sql(vec_col, n_bits)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def ivf_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 4,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """IVF coarse-quantizer training: one centroid per cell.

    Cells are the 2^n_bits sign-pattern buckets (a deterministic,
    training-free coarse quantizer); the centroid is the per-dimension
    mean computed in EXACT integer arithmetic — each value is floored to
    micro-units, summed as BIGINT (order-independent, unlike FP
    addition), divided once at the end. That makes centroid coordinates
    bit-identical on any engine, so probe rankings (and therefore the
    whole IVF result) are deterministic and oracle-checkable.

    Scale shape: posexplode is dim× the corpus but aggregates map-side
    to (cells × dim) partial rows per task — the shuffle carries only
    2^n_bits × dim tiny rows, and the centroid table is broadcastable
    by construction.
    """
    cells = emb.withColumn("cell", F.expr(sign_bucket_sql(vec_col, n_bits)))
    longf = cells.select(
        "cell", F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    per_dim = longf.groupBy("cell", "pos").agg(
        F.expr("SUM(FLOOR(CAST(v AS DOUBLE) * 1000000))").alias("s"),
        F.count("*").alias("n"),
    )
    return (
        per_dim.withColumn("cval", F.expr("CAST(s AS DOUBLE) / (1000000.0 * n)"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)"
            ).alias("centroid")
        )
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
    nprobe: int = 2,
    dim: int = EMBEDDING_DIM,
    materialize: bool = True,
) -> DataFrame:
    """IVF-style ANN: rank cells by query↔centroid cosine, search the
    top ``nprobe`` inverted lists, exact-rescore, top-k.

    vs the sign-LSH path: probing is *adaptive* (nearest centroids, not
    just the query's own bucket), so recall degrades gracefully when a
    query sits near a cell boundary. The centroid table (2^n_bits rows)
    and the probed-cells frame (queries × nprobe rows) are both
    broadcast; the corpus is scanned once and only probed cells fan
    into the rescoring join.

    ``materialize`` persists the centroid table — an IVF index is
    trained once and probed by many queries, so the 2^n_bits-row
    "index" caches across query runs (Spark's CacheManager dedups by
    plan, one entry per corpus).
    """
    cells = emb.withColumn("cell", F.expr(sign_bucket_sql(vec_col, n_bits)))
    cents = ivf_centroids(emb, vec_col, n_bits, dim)
    if materialize:
        cents = cents.persist()
    q = cells.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("q_nrm"),
    )
    cent_sim = F.expr(
        f"({dot_sql('q_vec', 'centroid', dim)}) / (q_nrm * {norm_sql('centroid', dim)})"
    )
    probe_w = W.partitionBy("query_id").orderBy(cent_sim.desc(), F.col("cell"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("prk", F.row_number().over(probe_w))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "q_vec", "q_nrm", "cell")
    )
    c = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("c_nrm"),
        "cell",
    )
    cos = cosine_expr("q_vec", "c_vec", "q_nrm", "c_nrm", dim)
    scored = (
        c.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim"))
        # no distinct needed: cells partition the corpus, so a neighbor
        # matches at most one probed cell per query
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


SQ_SCALE = 127  # int8 scalar-quantization scale (embeddings are unit-norm)


def sq_codes_sql(vec: str, scale: int = SQ_SCALE) -> str:
    """int8 scalar quantization: floor(v * scale) per dimension.

    Exact integer codes on both engines (FLOOR of an IEEE-754 product is
    deterministic), so the surrogate dot product — pure BIGINT
    arithmetic — is bit-identical everywhere."""
    return f"transform({vec}, v -> CAST(FLOOR(CAST(v AS DOUBLE) * {scale}) AS BIGINT))"


def ann_sq_rerank_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    candidates: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Two-stage flat ANN: int8-quantized scan → exact rerank of the top
    ``candidates`` surrogate hits (FAISS IndexScalarQuantizer shape).

    Why this exists next to LSH/IVF: partition-pruning indexes only help
    when the corpus has cluster structure. On isotropic embeddings (this
    testdata; also common for whitened representations) ANY bucketing
    scheme needs near-linear probing to reach high recall — measured by
    ``ann_recall``: sign-LSH plateaus near 0.2 here while this path is
    ≈1.0. The scale story is a cheaper linear pass, not pruning:

    - pass 1 touches ONLY the int8 code column (4× smaller than float32
      — in a production layout the codes are a materialized column so
      the scan never reads the float vectors), integer MACs in codegen;
    - pass 2 fetches full vectors for queries × ``candidates`` rows via
      a broadcast join — a point-lookup, not a scan — and rescores
      exactly, so the final top-k ordering is float-exact.

    On clustered corpora compose with IVF: prune cells first, SQ-scan
    inside probed cells, rerank. Recall is governed by ``candidates``
    (surrogate ranking error is bounded by quantization error; C ≥ 4-5×k
    is plenty in practice).
    """
    codes = F.expr(sq_codes_sql(vec_col))
    c1 = emb.select(F.col(id_col).alias("neighbor_id"), codes.alias("c_z"))
    q1 = emb.filter(query_pred).select(F.col(id_col).alias("query_id"), codes.alias("q_z"))
    sq_score = F.expr(" + ".join(f"q_z[{i}] * c_z[{i}]" for i in range(dim)))
    wc = W.partitionBy("query_id").orderBy(F.col("sq_score").desc(), "neighbor_id")
    cand = (
        c1.join(F.broadcast(q1), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sq_score.alias("sq_score"))
        .withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= candidates)
        .select("query_id", "neighbor_id")
    )
    nvec = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("c_nrm"),
    )
    qvec = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col, dim)).alias("q_nrm"),
    )
    cos = cosine_expr("q_vec", "c_vec", "q_nrm", "c_nrm", dim)
    rer = (
        nvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        rer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Approximate top-k with OR-amplified sign-LSH: ``n_tables`` hash
    tables over disjoint dimension slices; a corpus vector is a
    candidate if it shares the query's bucket in ANY table.

    Scale shape: the corpus is scanned ONCE and exploded into
    ``n_tables`` (tbl, bucket) keys per row (rows ×n_tables, no extra
    scans); the query side explodes the same way and is broadcast, so
    the candidate join is a broadcast hash join on (tbl, bucket) — no
    corpus shuffle. Pairs colliding in several tables are collapsed by
    a distinct over (query, neighbor, score) — ≤ n_tables rows per
    pair — before ranking. Recall amplifies as 1-(1-r)^n_tables per
    neighbor while each table keeps 2^n_bits buckets of selectivity;
    n_bits trades candidate volume against per-table recall, n_tables
    buys recall linearly in join fan-out (the knobs ann_recall
    measures).
    """
    buckets = F.expr(multi_table_buckets_sql(vec_col, n_bits, n_tables, dim))

    def hashed(src: DataFrame, prefix: str, id_alias: str) -> DataFrame:
        return src.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.expr(norm_sql(vec_col, dim)).alias(f"{prefix}_nrm"),
            F.explode(buckets).alias("tb"),
        ).select(
            id_alias,
            f"{prefix}_vec",
            f"{prefix}_nrm",
            F.col("tb.tbl").alias("tbl"),
            F.col("tb.bucket").alias("bucket"),
        )

    q = hashed(emb.filter(query_pred), "q", "query_id")
    c = hashed(emb, "c", "neighbor_id")
    cos = cosine_expr("q_vec", "c_vec", "q_nrm", "c_nrm", dim)
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos_sim"))
        # Collapse multi-table collisions (cos_sim is deterministic, so
        # the triple is identical across tables for the same pair).
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
