"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_loader_spark.functions import similarity as S
from db_loader_spark.queries import QuerySpec
from db_loader_spark.tables import load_table


def _duck_dot(a: str, b: str, dim: int = S.EMBEDDING_DIM) -> str:
    return " + ".join(
        f"CAST({a}.embedding[{i}] AS DOUBLE) * CAST({b}.embedding[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


_DUCK_BUCKET = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, F.col("vec_id") < 8, k=3)


_BRUTE_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(({_duck_dot('q', 'c')})
               / (sqrt({_duck_dot('q', 'q')}) * sqrt({_duck_dot('c', 'c')})), 4)
           AS cos_sim
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 8
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 3
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, F.col("vec_id") < 8, k=3)


_LSH_TOPK_ORACLE = f"""
WITH bucketed AS (SELECT vec_id, embedding, {_DUCK_BUCKET} AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(({_duck_dot('q', 'c')})
               / (sqrt({_duck_dot('q', 'q')}) * sqrt({_duck_dot('c', 'c')})), 4)
           AS cos_sim
  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 8
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 3
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_ivf_topk(emb, F.col("vec_id") < 8, k=3, n_bits=4, nprobe=2)


_DUCK_CELL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 5)
) + ")"


def _duck_dot_name(a: str, b: str, dim: int = S.EMBEDDING_DIM) -> str:
    """Dot product between two named list columns (1-based in DuckDB)."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )


_IVF_CENT_NORM = "sqrt(" + _duck_dot_name("centroid", "centroid") + ")"

_IVF_ORACLE = f"""
WITH cells AS (
  SELECT vec_id, embedding, {_DUCK_CELL} AS cell FROM embeddings
),
longf AS (
  SELECT cell, t.pos AS pos,
         CAST(FLOOR(CAST(embedding[t.pos + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM cells, (SELECT unnest(range(64)) AS pos) t
),
sums AS (
  SELECT cell, pos, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
  FROM longf GROUP BY cell, pos
),
cents AS (
  SELECT cell, list(CAST(s AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS centroid
  FROM sums GROUP BY cell
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec,
         sqrt({_duck_dot_name('embedding', 'embedding')}) AS q_nrm
  FROM cells WHERE vec_id < 8
),
probed AS (
  SELECT query_id, q_vec, q_nrm, cell FROM (
    SELECT q.query_id, q.q_vec, q.q_nrm, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ({_duck_dot_name('q_vec', 'centroid')}) / (q_nrm * {_IVF_CENT_NORM}) DESC,
                      c.cell
           ) AS prk
    FROM q CROSS JOIN cents c
  ) WHERE prk <= 2
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         ROUND(({_duck_dot_name('p.q_vec', 'c.embedding')})
               / (p.q_nrm * sqrt({_duck_dot_name('c.embedding', 'c.embedding')})), 4)
           AS cos_sim
  FROM probed p JOIN cells c ON c.cell = p.cell
  WHERE c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 3
"""


def ann_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_bucket_stats(load_table(spark, sf_dir, "embeddings"))


_BUCKET_ORACLE = f"""
SELECT {_DUCK_BUCKET} AS bucket, COUNT(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the sign-LSH ANN path against exact brute force —
    the self-evaluation loop every production ANN index needs (tune
    n_bits / nprobe against measured recall, not vibes).

    Both arms reuse the registered operators; the comparison is a
    3-rows-per-query join, so the whole evaluation costs one extra
    broadcast join over running the two searches."""
    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 8
    bf = S.brute_force_topk(emb, pred, k=3).select("query_id", "neighbor_id")
    lsh = S.ann_lsh_topk(emb, pred, k=3).select("query_id", "neighbor_id")
    hits = (
        bf.join(lsh, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        bf.groupBy("query_id")
        .agg(F.count("*").alias("n_true"))
        .join(hits, "query_id", "left")
        .na.fill({"n_hits": 0})
        .select(
            "query_id",
            F.col("n_hits").cast("int").alias("n_hits"),
            F.round(F.col("n_hits").cast("double") / F.col("n_true"), 4).alias(
                "recall_at_3"
            ),
        )
    )


_RECALL_ORACLE = f"""
WITH bf AS ({_BRUTE_ORACLE}),
lshq AS ({_LSH_TOPK_ORACLE}),
hits AS (
  SELECT bf.query_id, COUNT(*) AS n_hits
  FROM bf JOIN lshq USING (query_id, neighbor_id)
  GROUP BY bf.query_id
),
tot AS (SELECT query_id, COUNT(*) AS n_true FROM bf GROUP BY query_id)
SELECT t.query_id,
       CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_true, 4) AS recall_at_3
FROM tot t LEFT JOIN hits h ON t.query_id = h.query_id
"""


QUERIES: dict[str, QuerySpec] = {
    "ann_recall": QuerySpec(
        ann_recall, _RECALL_ORACLE, "recall@3 of LSH ANN vs brute force"
    ),
    "ann_bruteforce_topk": QuerySpec(
        ann_bruteforce_topk, _BRUTE_ORACLE, "exact cosine top-k"
    ),
    "ann_lsh_topk": QuerySpec(ann_lsh_topk, _LSH_TOPK_ORACLE, "sign-LSH bucketed ANN"),
    "ann_ivf_topk": QuerySpec(
        ann_ivf_topk, _IVF_ORACLE, "IVF centroid-probed ANN (nprobe=2)"
    ),
    "ann_bucket_stats": QuerySpec(ann_bucket_stats, _BUCKET_ORACLE, "LSH bucket sizing"),
}
