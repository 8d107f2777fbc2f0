"""Column-level / document-level functions for large-scale data pipelines.

- ``text``       — tokenization, language-ID, quality scoring, fingerprints
- ``dedup``      — exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity`` — brute-force cosine top-k, sign-LSH bucketed ANN
- ``multimodal`` — binary-column plumbing with stubbed decoders

All hot-path logic stays JVM-side (built-in ``pyspark.sql.functions`` /
SQL lambda expressions inside whole-stage codegen); Python appears only
in the multimodal mapInPandas stubs where a real decoder library would
sit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row derivation.

    Small dimension-sized inputs often arrive as ONE file = ONE input
    split, serializing all downstream hashing / unrolled-vector math
    onto a single core. One narrow shuffle of the compact source rows
    buys full-cluster parallelism for the expensive expressions that
    follow. At real scale inputs span many splits and this approaches a
    no-op."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
