"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each algorithm at 100 TB):

- **exact**: one hash-partitioned groupBy on the text (or its md5) —
  Spark's map-side partial agg means each executor emits one row per
  distinct key before the shuffle.
- **n-gram Jaccard**: exact pairwise similarity *after* candidate
  generation. Never run it all-pairs at scale — it exists as the
  verifier behind MinHash/LSH candidates and as the small-data oracle.
- **MinHash+LSH**: the scale path. Cost is linear in corpus size:
  explode shingles → one groupBy for signatures → band self-join whose
  output is only colliding pairs. Hash = md5 (lexicographic MIN over
  hex strings is a valid minhash since md5 is uniform); md5 was chosen
  because every engine implements it identically, making results
  engine-portable (and DuckDB-oracle-checkable).
- **SimHash**: near-dup via Hamming distance on a 32-bit signature;
  banded on 4×8-bit substrings so the self-join only sees candidate
  pairs sharing a band (standard Manku et al., WWW'07 trick).

All of it is Column-expression work — no Python UDFs — so the whole
pipeline stays inside whole-stage codegen. Wide unrolled expressions
(k hash columns, 32 bit-votes, Hamming sums) are assembled as single
``F.expr`` SQL strings: one py4j call instead of hundreds, which takes
plan construction from ~1 s of driver time to ~1 ms with an identical
Catalyst tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_loader_spark.functions import fan_out
from db_loader_spark.functions.text import tokens

HEX_DIGITS = "0123456789abcdef"


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (empty if < n tokens)."""
    toks = tokens(text)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + off) for off in range(n)]
    )
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs — the input to Jaccard and MinHash."""
    return (
        fan_out(docs)
        .select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text with the
    canonical (minimum) id and the copy count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold.

    Jaccard is exact integer arithmetic (|A∩B| / (|A|+|B|-|A∩B|)) so the
    comparison against the threshold is engine-deterministic.
    """
    sh = shingle_frame(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature columns h0..h{k-1} (32-bit longs).

    h_i(doc) = MIN over shingles of the first 32 bits of
    md5(i || '|' || shingle) — a valid minhash family (md5 is uniform),
    and numerically equal to the lexicographic min of the 8-char hex
    prefix, which is what the DuckDB oracle computes.

    Perf shape (measured at sf0.1): the k hashes are parallel *columns*
    on the exploded shingle rows, not a k× row explosion, and min(long)
    keeps the aggregate in HashAggregate with map-side partial combine —
    the shuffle carries only one 8-long row per doc. No distinct on
    shingles: MIN is idempotent under duplicates.
    """
    toks = shingles(F.col(text_col), n)
    sh = fan_out(docs).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("shingle")
    )
    hcols = [
        F.expr(
            f"CAST(conv(substring(md5(concat('{i}|', shingle)), 1, 8), 16, 10) AS BIGINT)"
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.select("id", *hcols).groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Band the signature and self-join per band: (doc_a, doc_b, est_sim).

    est_sim = fraction of matching signature components (exact rational).
    The join key is (band_idx, band_key) so only same-band collisions
    shuffle — the LSH guarantee that makes this linear-ish at scale.

    The full signature rides along through the band explode, so est_sim
    comes straight off the joined rows — no second join back to the
    signature frame (which would recompute its whole lineage twice).
    ``materialize`` persists the (tiny: one row per doc) signature frame
    so the self-join's two branches share one computation. The entry
    stays cached for the session (Spark's CacheManager dedups by plan,
    so repeated builds of the same query share ONE entry rather than
    leaking per call); pass ``materialize=False`` or call
    ``spark.catalog.clearCache()`` in long-lived sessions that cycle
    many distinct corpora.
    """
    if materialize:
        signatures = signatures.persist()
    n_bands = num_hashes // band_size
    sig_cols = [f"h{i}" for i in range(num_hashes)]
    band_structs = ", ".join(
        "struct({b} AS band_idx, concat_ws('|', {keys}) AS band_key)".format(
            b=b,
            keys=", ".join(f"h{b * band_size + j}" for j in range(band_size)),
        )
        for b in range(n_bands)
    )
    bands = F.expr(f"array({band_structs})")
    banded = signatures.select("id", *sig_cols, F.explode(bands).alias("band")).select(
        "id",
        *sig_cols,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    matches = F.expr(
        " + ".join(
            f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.round(matches.cast("double") / num_hashes, 4).alias("est_sim"),
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over a pair
    graph by iterative min-label propagation → (id, component_id).

    The iterative algorithm the dedup pipeline needs after candidate
    generation: every doc in a near-dup cluster gets the cluster's
    minimum id, so "keep one per cluster" is a trivial filter.

    Scale shape: each iteration is one hash join (labels ⋈ edges) + one
    min-aggregate — all distributed; the driver only checks the
    converged flag. Iterations ≤ graph diameter (near-dup clusters are
    shallow in practice); ``localCheckpoint`` truncates lineage so plans
    don't grow with iterations. This is the one operator family
    (iterative fixpoint) that SQL can't express — the oracle uses a
    recursive CTE instead.
    """
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component_id", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges.dst == labels.id, "inner"
        ).select(F.col("src").alias("id"), "component_id")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component_id").alias("component_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component_id", "old"), "id"
            )
            .filter(F.col("component_id") < F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # Non-converged labels are silently WRONG (far ends of a long
        # chain keep non-minimal ids) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (graph diameter exceeds it)"
        )
    return labels.select(F.col("id").alias("doc_id"), "component_id")


def _bit_sql(h: str, p: int) -> str:
    """SQL for bit p (0 = MSB) of the 32-bit value in the first 8 hex
    chars of column ``h`` — nibble decode via instr on the hex alphabet,
    then floor-shift-mod (mirrored exactly by the DuckDB oracle)."""
    shift = 3 - (p % 4)
    nibble = f"(instr('{HEX_DIGITS}', substring({h}, {p // 4 + 1}, 1)) - 1)"
    return f"(FLOOR({nibble} / {2 ** shift}) % 2)"


def simhash_bits(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash as a '0'/'1' string of length ``bits``.

    Each distinct token votes ±1 per bit position (from the first 8 hex
    chars of md5(token)); the signature bit is 1 iff the vote sum ≥ 0.
    Expression-only — one explode + one groupBy with 32 conditional
    aggregates, all inside codegen.
    """
    tok = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
        )
        .distinct()
        .withColumn("h8", F.substring(F.md5("tok"), 1, 8))
    )
    vote_aggs = [
        F.expr(f"sum({_bit_sql('h8', p)} * 2 - 1)").alias(f"v{p}") for p in range(bits)
    ]
    votes = tok.groupBy("id").agg(*vote_aggs)
    bit_chars = ", ".join(
        f"CASE WHEN v{p} >= 0 THEN '1' ELSE '0' END" for p in range(bits)
    )
    return votes.select("id", F.expr(f"concat({bit_chars})").alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, bits: int = 32, n_bands: int = 4, max_hamming: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: band join (any shared band of
    ``bits/n_bands`` consecutive signature chars) then exact Hamming
    filter — the Manku-et-al banded Hamming search."""
    band_w = bits // n_bands
    band_structs = ", ".join(
        f"struct({b} AS band_idx, substring(simhash, {b * band_w + 1}, {band_w}) AS band_key)"
        for b in range(n_bands)
    )
    bands = F.expr(f"array({band_structs})")
    banded = sig.select("id", "simhash", F.explode(bands).alias("band")).select(
        "id", "simhash", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.expr(
        " + ".join(
            f"(CASE WHEN substring(a.simhash, {p + 1}, 1) <> substring(b.simhash, {p + 1}, 1)"
            " THEN 1 ELSE 0 END)"
            for p in range(bits)
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
