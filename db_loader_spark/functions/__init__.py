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
