"""Empty-input hardening: every custom operator must return an EMPTY
frame with the right schema (never throw) when its input is empty —
the behavior partition-pruned or heavily-filtered production runs hit
constantly."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_loader_spark.functions import dedup as D
from db_loader_spark.functions import similarity as S
from db_loader_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _empty_docs(spark):
    return load_table(spark, SF, "documents").filter(F.lit(False))


def _empty_emb(spark):
    return load_table(spark, SF, "embeddings").filter(F.lit(False))


def test_minhash_lsh_empty(spark):
    sig = D.minhash_signatures(_empty_docs(spark))
    assert sig.count() == 0
    assert D.lsh_candidate_pairs(sig).count() == 0


def test_simhash_empty(spark):
    sig = D.simhash_bits(_empty_docs(spark))
    assert sig.count() == 0
    assert D.simhash_near_pairs(sig).count() == 0


def test_components_empty(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = D.connected_components(pairs)
    assert out.columns == ["doc_id", "component_id"]
    assert out.count() == 0


def test_ann_empty_corpus(spark):
    e = _empty_emb(spark)
    assert S.brute_force_topk(e, F.col("vec_id") < 8).count() == 0
    assert S.ann_lsh_topk(e, F.col("vec_id") < 8).count() == 0
    assert S.ann_ivf_topk(e, F.col("vec_id") < 8).count() == 0
    assert S.ann_sq_rerank_topk(e, F.col("vec_id") < 8).count() == 0


def test_ann_empty_query_set(spark):
    emb = load_table(spark, SF, "embeddings")
    assert S.brute_force_topk(emb, F.lit(False)).count() == 0
    assert S.ann_ivf_topk(emb, F.lit(False)).count() == 0
    assert S.ann_sq_rerank_topk(emb, F.lit(False)).count() == 0


def test_lsh_near_pairs_subset_of_exact(spark):
    """Every LSH-emitted near-pair must appear in the exact all-pairs
    verifier with the SAME cosine (no false positives, exact scores);
    recall is whatever the tables give and is measured, not asserted."""
    emb = load_table(spark, SF, "embeddings")
    exact = {tuple(r) for r in S.cosine_pairs(emb, threshold=0.4).collect()}
    lsh = {tuple(r) for r in S.lsh_near_pairs(emb, threshold=0.4).collect()}
    assert lsh <= exact
    assert len(lsh) > 0  # sanity: the candidate generator finds pairs


def test_lsh_near_pairs_empty_corpus(spark):
    e = _empty_emb(spark)
    assert S.lsh_near_pairs(e).count() == 0


def test_sq_rerank_matches_bruteforce(spark):
    """SQ surrogate + rerank returns the exact brute-force top-k here
    (C=16 candidate margin over k=3 absorbs all quantization error)."""
    emb = load_table(spark, SF, "embeddings")
    pred = F.col("vec_id") < 8
    bf = {tuple(r) for r in S.brute_force_topk(emb, pred, k=3).collect()}
    sq = {tuple(r) for r in S.ann_sq_rerank_topk(emb, pred, k=3).collect()}
    assert sq == bf


def test_short_docs_drop_from_shingles(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d")], "doc_id long, text string"
    )
    sh = D.shingle_frame(docs)
    # doc 1 has <3 tokens → no shingles; doc 2 has exactly 2
    assert {r.id for r in sh.select("id").distinct().collect()} == {2}
    assert D.minhash_signatures(docs).count() == 1


def test_decontaminate_empty_sides(spark):
    docs = load_table(spark, SF, "documents")
    empty = _empty_docs(spark)
    # empty corpus → nothing to flag; empty benchmark → nothing matches
    assert D.decontaminate(empty, docs).count() == 0
    out = D.decontaminate(docs, empty)
    assert out.columns == ["doc_id", "n_hits", "n_shingles", "contamination"]
    assert out.count() == 0


def test_pack_doc_bins_empty(spark):
    from db_loader_spark import cache
    from db_loader_spark.queries.textops import pack_doc_bins

    empty = spark.createDataFrame([], "doc_id long, lang string, n_tok int")
    out = pack_doc_bins(empty, 256)
    assert out.columns == ["lang", "blk", "doc_id", "n_tok", "bin_id"] or set(
        out.columns
    ) == {"lang", "doc_id", "n_tok", "bin_id"}
    assert out.count() == 0
    cache.release()


def test_subsplit_cells_empty(spark):
    from db_loader_spark.queries.similarity import _subsplit_cells

    empty = spark.createDataFrame(
        [], "cell string, neighbor_id long, c_vec array<double>, c_nrm double"
    )
    out = _subsplit_cells(empty, cap=8)
    assert out.columns == ["cell", "neighbor_id", "c_vec", "c_nrm"]
    assert out.count() == 0
