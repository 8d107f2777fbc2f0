"""functions.bpe: the distributed BPE trainer vs a pure-Python
reference implementation of the same algorithm (Sennrich et al. 2016 —
greedy left-to-right non-overlapping merge, count-desc/lexicographic
tie-break), plus the edge semantics the oracle can't exercise."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _py_bpe(texts: list[str], n: int):
    vocab: Counter = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                vocab[w] += 1
    segs = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for rank in range(n):
        pc: Counter = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        lhs, rhs = min(k for k, v in pc.items() if v == m)
        merges.append((rank, lhs, rhs, lhs + rhs, m))
        for w, s in segs.items():
            out: list[str] = []
            pend: str | None = None
            for sym in s:
                if pend is None:
                    pend = sym
                elif pend == lhs and sym == rhs:
                    out.append(lhs + rhs)
                    pend = None
                else:
                    out.append(pend)
                    pend = sym
            if pend is not None:
                out.append(pend)
            segs[w] = out
    return merges, segs


def test_bpe_train_matches_python_reference(spark):
    from db_loader_spark.functions.bpe import bpe_train
    from db_loader_spark.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    merges, final_vocab = bpe_train(docs, n_merges=12)
    ref_merges, ref_segs = _py_bpe(
        [r["text"] for r in docs.select("text").collect()], 12
    )
    assert [tuple(r) for r in merges.orderBy("merge_rank").collect()] == ref_merges
    got_segs = {r["word"]: list(r["syms"]) for r in final_vocab.collect()}
    assert got_segs == ref_segs


def test_bpe_train_frees_superseded_round_checkpoints(spark):
    """r16 storage bound (guide §5; VERDICT r15 #3): round k's argmax
    materializes vocab_k's checkpoint, after which vocab_{k-1}'s
    blocks are freed explicitly instead of accumulating O(n_merges)
    vocab tables until the ContextCleaner reaps them. At most TWO
    loop frames' blocks may remain on return: the last materialized
    vocab (the lazy returned frame computes from it) and nothing
    older."""
    from db_loader_spark.functions.bpe import bpe_train
    from db_loader_spark.tables import load_table

    def persisted():
        return len([
            i
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0
        ])

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    before = persisted()
    merges, final_vocab = bpe_train(docs, n_merges=12)
    assert merges.count() == 12
    after = persisted()
    assert after - before <= 2, (
        f"superseded BPE round checkpoints leaked: {before} persisted "
        f"RDDs before, {after} after (expected at most +2: the last "
        "materialized round + the returned lazy frame's parent)"
    )


def test_bpe_segmentation_roundtrips_words(spark):
    """Concatenating a word's final symbols (marker stripped) must give
    back the word — merges recombine, never lose or duplicate chars."""
    from db_loader_spark.functions.bpe import bpe_train
    from db_loader_spark.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 60)
    _, final_vocab = bpe_train(docs, n_merges=8)
    bad = final_vocab.filter(
        F.replace(F.concat_ws("", "syms"), F.lit("</w>"), F.lit("")) != F.col("word")
    )
    assert bad.count() == 0


def test_bpe_adjacent_repeat_merges_greedy_left_to_right(spark):
    """'aaaa' + merge (a,a) → ['aa','aa','</w>'], and 'aaa' leaves the
    odd tail — the non-overlap rule the string-replace formulation gets
    wrong (why the oracle uses the list_reduce fold)."""
    from db_loader_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa")], ["doc_id", "text"]
    )
    merges, vocab = bpe_train(docs, n_merges=1)
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert [tuple(r)[:4] for r in merges.collect()] == [(0, "a", "a", "aa")]
    assert got["aaaa"] == ["aa", "aa", "</w>"]
    assert got["aaa"] == ["aa", "a", "</w>"]


def test_bpe_empty_corpus_yields_empty_tables(spark):
    """No words → no merges and an empty vocab, with the declared
    schemas intact (empty-partition discipline: downstream joins must
    not crash)."""
    from db_loader_spark.functions.bpe import MERGE_SCHEMA, bpe_train

    docs = spark.createDataFrame([(0, "12345 !!!")], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, n_merges=4)
    assert merges.count() == 0
    assert merges.schema == MERGE_SCHEMA
    assert vocab.count() == 0


def test_weighted_sample_prefers_heavy_docs(spark):
    """A-ES sanity: selection probability rises with weight, so the
    sampled docs' mean weight must exceed the stratum mean (pinned on
    the deterministic corpus, not asserted statistically)."""
    from db_loader_spark.queries import all_queries
    from db_loader_spark.tables import load_table

    sampled = all_queries()["curation_weighted_sample"].spark(
        spark, "/root/testdata/sf0.001"
    )
    mean_sampled = sampled.agg(F.avg("weight")).first()[0]
    mean_all = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert mean_sampled > mean_all


def test_dsir_weight_separates_target_lang(spark):
    """DSIR sanity: documents FROM the target distribution must score a
    higher mean importance weight than the rest — the separation the
    resampling step relies on (deterministic corpus, exact pin)."""
    from db_loader_spark.queries import all_queries
    from db_loader_spark.queries.curation import DSIR_TARGET_LANG

    w = all_queries()["curation_dsir_weight"].spark(spark, "/root/testdata/sf0.001")
    means = {
        r["is_tgt"]: r["m"]
        for r in w.groupBy((F.col("lang") == DSIR_TARGET_LANG).alias("is_tgt"))
        .agg(F.avg("dsir_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_bpe_oracles_match_spark_on_exhausted_corpus(spark):
    """When the corpus runs out of learnable merges before n_merges,
    the unrolled oracle must mirror bpe_train's early break: the merge
    chain stops and the vocab chain PASSES THROUGH the empty
    generations (LEFT JOIN ON TRUE) instead of emptying — the failure
    mode the review caught (a CROSS JOIN zeroed the tokenize oracle on
    any corpus that exhausts early)."""
    import duckdb

    from db_loader_spark.functions.bpe import bpe_train
    from db_loader_spark.queries.textops import (
        _bpe_tokenize_oracle,
        _bpe_train_oracle,
    )

    docs = spark.createDataFrame([(0, "ab ab ab"), (1, "ab cd")], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, n_merges=16)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT 0 AS doc_id, 'ab ab ab' AS text UNION ALL SELECT 1, 'ab cd'"
    )
    oracle_merges = con.execute(
        _bpe_train_oracle(16) + " ORDER BY merge_rank"
    ).fetchall()
    assert [tuple(r) for r in merges.orderBy("merge_rank").collect()] == oracle_merges
    assert 0 < len(oracle_merges) < 16  # the early break actually happened

    spark_toks = {
        (r["doc_id"], r["n_bpe_tokens"])
        for r in docs.select("doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.col("word") != "")
        .join(vocab.select("word", F.size("syms").alias("n")), "word")
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("n_bpe_tokens"))
        .collect()
    }
    assert spark_toks == set(con.execute(_bpe_tokenize_oracle(16)).fetchall())


def test_bpe_stops_early_when_fully_merged(spark):
    """A corpus whose every word collapses before n_merges rounds stops
    learning instead of looping on an empty argmax."""
    from db_loader_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame([(0, "ab ab ab")], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, n_merges=10)
    rows = merges.orderBy("merge_rank").collect()
    assert [r["merged"] for r in rows] == ["ab", "ab</w>"]
    assert [list(r["syms"]) for r in vocab.collect()] == [["ab</w>"]]
