"""Multimodal-column query: binary payload plumbing through mapInPandas.

The Spark side runs the REAL multimodal path (binary column → Arrow
batches → pandas feature extraction); the oracle reproduces the stub's
byte arithmetic in SQL, so the whole Python/Arrow plumbing is
value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_loader_spark.functions.multimodal import attach_binary, extract_features
from db_loader_spark.queries import QuerySpec
from db_loader_spark.tables import load_table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL payloads are filtered identically on both engines (a NULL
    # would crash pandas len() executor-side and diverge from the
    # oracle's NULL row anyway).
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return extract_features(attach_binary(docs))


# Testdata text is ASCII, so per-char ascii() == per-byte value (the
# stub hashes UTF-8 bytes; a non-ASCII corpus would need a byte-wise
# oracle). COALESCE: DuckDB list_sum over an empty list is NULL while
# the stub computes sum(b'') % 997 = 0.
_MM_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT)
         AS first_byte,
       CAST(COALESCE(list_sum(list_transform(range(1, strlen(text) + 1),
                                             i -> ascii(substr(text, i, 1)))), 0) % 997
            AS INT) AS checksum
FROM documents
WHERE text IS NOT NULL
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode one frame marker per 10 payload
    bytes (the deterministic stand-in for a video frame sampler), then
    re-aggregate per doc — exercises the explode fan-out shape and its
    row accounting end-to-end."""
    from db_loader_spark.functions.multimodal import frame_sample

    # NULL text would silently vanish from the explode side while the
    # oracle's direct arithmetic kept the row — filter identically.
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    frames = frame_sample(attach_binary(docs), every_n=10)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_idx").alias("last_frame")
    )


_FRAME_ORACLE = """
SELECT doc_id,
       CAST(FLOOR(strlen(text) / 10.0) + 1 AS BIGINT) AS n_frames,
       CAST(FLOOR(strlen(text) / 10.0) AS INT) AS last_frame
FROM documents
WHERE text IS NOT NULL
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_features": QuerySpec(
        multimodal_features, _MM_ORACLE, "binary payload mapInPandas features"
    ),
    "multimodal_frame_sample": QuerySpec(
        multimodal_frame_sample, _FRAME_ORACLE, "frame-sample explode plumbing"
    ),
}
