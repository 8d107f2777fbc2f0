"""Multimodal-column query: binary payload plumbing through mapInPandas.

The Spark side runs the REAL multimodal path (binary column → Arrow
batches → pandas feature extraction); the oracle reproduces the stub's
byte arithmetic in SQL, so the whole Python/Arrow plumbing is
value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_loader_spark.functions.multimodal import attach_binary, extract_features
from db_loader_spark.queries import QuerySpec
from db_loader_spark.tables import load_table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary(docs))


# Testdata text is ASCII, so per-char ascii() == per-byte value.
_MM_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT)
         AS first_byte,
       CAST(list_sum(list_transform(range(1, strlen(text) + 1),
                                    i -> ascii(substr(text, i, 1)))) % 997 AS INT)
         AS checksum
FROM documents
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_features": QuerySpec(
        multimodal_features, _MM_ORACLE, "binary payload mapInPandas features"
    ),
}
