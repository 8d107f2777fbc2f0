"""Corpus-curation composition queries: canonical-doc selection per
near-dup cluster and deterministic training-shard assignment.

Both are compositions of already-verified building blocks (MinHash
components, quality scoring, md5 hash-bucket determinism) — the "last
mile" of an LLM data pipeline where clusters/scores turn into the rows
that actually ship to training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from db_loader_spark.queries import QuerySpec
from db_loader_spark.tables import load_table

N_SHARDS = 8
_HEX = "0123456789abcdef"


def curation_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the BEST doc per near-dup cluster, not the first: near-dup
    components (MinHash est_sim ≥ 0.5 → connected components) joined to
    the quality score, ranked inside each cluster by (quality DESC,
    doc_id) — the selection policy real pipelines want, since the
    lowest doc_id is usually not the best-written duplicate.

    Scale shape: components and quality are each already-audited
    operators; the selection adds ONE window partitioned by
    component_id (clusters are small by construction — no skewed
    partition) and one size aggregate reusing the same partitioning.
    """
    from db_loader_spark.queries.dedup import dedup_components
    from db_loader_spark.queries.textops import text_quality_score

    comps = dedup_components(spark, sf_dir)
    qual = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    j = comps.join(qual, "doc_id")
    w = W.partitionBy("component_id").orderBy(F.col("quality").desc(), F.col("doc_id"))
    sizes = j.groupBy("component_id").agg(F.count("*").alias("n_docs"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(sizes, "component_id")
        .select("component_id", F.col("doc_id").alias("keep_id"), "n_docs", "quality")
    )


def _curation_select_oracle() -> str:
    from db_loader_spark.queries.dedup import _COMPONENTS_ORACLE
    from db_loader_spark.queries.textops import _QUALITY_ORACLE

    return f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
qual AS (SELECT doc_id, quality FROM ({_QUALITY_ORACLE}) q),
j AS (
  SELECT c.component_id, c.doc_id, qual.quality
  FROM comp c JOIN qual ON c.doc_id = qual.doc_id
),
ranked AS (
  SELECT component_id, doc_id, quality,
         ROW_NUMBER() OVER (PARTITION BY component_id
                            ORDER BY quality DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY component_id) AS n_docs
  FROM j
)
SELECT component_id, doc_id AS keep_id,
       CAST(n_docs AS BIGINT) AS n_docs, quality
FROM ranked WHERE rk = 1
"""


def _shard_expr_spark() -> F.Column:
    # 2 hex chars of md5(doc_id) → 0..255 → mod N_SHARDS: deterministic,
    # scan-side (no global sort/NTILE — a global window is exactly what
    # a 100 TB shard assignment must avoid), engine-portable via
    # position-in-alphabet arithmetic instead of hex casts.
    h = "md5(CAST(doc_id AS STRING))"
    v = (
        f"(locate(substring({h}, 1, 1), '{_HEX}') - 1) * 16 + "
        f"(locate(substring({h}, 2, 1), '{_HEX}') - 1)"
    )
    return F.expr(f"CAST(({v}) % {N_SHARDS} AS INT)")


def curation_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + balance report: every
    doc hashes to one of N_SHARDS shards (md5-bucket, seed-free,
    reproducible on any engine), aggregated to per-shard doc and token
    counts — the check that shards are balanced enough to stripe across
    training workers.

    Scale shape: the shard id is a pure projection on the scan (no
    shuffle to ASSIGN); the report is one map-side-combined aggregate
    to N_SHARDS rows. Writing the shards themselves would be
    ``write.partitionBy(shard_id)`` on the same expression —
    sinks/ddl.write_partitioned's layout with a hash instead of a date.
    """
    from db_loader_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            _shard_expr_spark().alias("shard_id"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


_DUCK_TOKENS = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'), t -> t <> '')"
)

_SHARD_ORACLE = f"""
WITH s AS (
  SELECT ((strpos('{_HEX}', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('{_HEX}', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
           % {N_SHARDS} AS shard_id,
         len({_DUCK_TOKENS}) AS n_tokens
  FROM documents
)
SELECT CAST(shard_id AS INT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY shard_id
"""


QUERIES: dict[str, QuerySpec] = {
    "curation_select": QuerySpec(
        curation_select,
        _curation_select_oracle(),
        "quality-weighted canonical doc per near-dup cluster",
    ),
    "curation_shard_assign": QuerySpec(
        curation_shard_assign,
        _SHARD_ORACLE,
        "deterministic hash sharding + balance report",
    ),
}
