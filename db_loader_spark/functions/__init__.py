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
    """Round-robin repartition before work that EXPLODES per input row
    (shingling ×~tokens, k-column hashing, quadratic pair joins).

    Small dimension-sized inputs often arrive as ONE file = ONE input
    split, serializing all downstream hashing / unrolled-vector math
    onto a single core. One narrow shuffle of the compact source rows
    buys full-cluster parallelism for the expensive expressions that
    follow.

    Scale guard: if the input scans at least the target number of files
    (the normal case for a 100 TB table with thousands of splits),
    return it untouched — re-shuffling an entire corpus to obtain
    parallelism it already has would be the dominant cost of the job.
    The probe is ``inputFiles()``, which only walks the analyzed plan;
    ``rdd.getNumPartitions()`` would MATERIALIZE upstream shuffle
    stages under AQE (it runs the job to learn the final partitioning),
    executing the lineage once at plan-construction time and again at
    query time."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= n:
        return df
    return df.repartition(n)
