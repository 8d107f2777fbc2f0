"""Streaming dedup-index maintenance (t_stream_signatures +
functions.dedup.lsh_pairs_against): the incremental stream ≡ batch
theorem, multi-batch witness, and re-run idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_loader_spark.functions import dedup as D
from db_loader_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_incremental_pairs_equal_batch_pairs(spark):
    """Union over arrival batches of new-vs-accumulated-index pairs ==
    the full-corpus self-join LSH — each pair found exactly once, by
    the batch in which its later member arrives. This is the identity
    the streaming index maintenance rests on, checked directly on the
    operators (no stream machinery)."""
    docs = load_table(spark, SF, "documents")
    sigs = D.minhash_signatures(docs, num_hashes=8).persist()
    batch = [sigs.filter(F.col("id") % 3 == k).persist() for k in range(3)]
    incremental = None
    for k in range(3):
        # index as of batch k = batches 0..k (including the new one)
        index = batch[0]
        for j in range(1, k + 1):
            index = index.unionByName(batch[j])
        p = D.lsh_pairs_against(
            batch[k], index, num_hashes=8, band_size=2, min_est_sim=0.375
        )
        incremental = p if incremental is None else incremental.unionByName(p)
    incremental = incremental.distinct()
    full = D.lsh_candidate_pairs(
        sigs, num_hashes=8, band_size=2, min_est_sim=0.375, materialize=False
    )
    assert incremental.exceptAll(full).count() == 0
    assert full.exceptAll(incremental).count() == 0
    assert full.count() > 0  # the theorem isn't vacuous on this corpus
    for f in (sigs, *batch):
        f.unpersist()


def test_pairs_against_normalizes_order(spark):
    """(least, greatest) normalization: swapping which side is 'new'
    yields the identical pair rows — arrival order cannot change the
    index's output."""
    docs = load_table(spark, SF, "documents").limit(80)
    sigs = D.minhash_signatures(docs, num_hashes=8).persist()
    a = sigs.filter(F.col("id") % 2 == 0)
    b = sigs.filter(F.col("id") % 2 == 1)
    ab = D.lsh_pairs_against(a, b, band_size=2)
    ba = D.lsh_pairs_against(b, a, band_size=2)
    assert ab.exceptAll(ba).count() == 0
    assert ba.exceptAll(ab).count() == 0
    sigs.unpersist()


def test_stream_signatures_is_multibatch_and_rerun_stable(spark, monkeypatch):
    """The registry query must (1) genuinely run multiple micro-batches
    (one incremental join per staged shard — a one-shot drain would
    call it once) and (2) produce identical rows on a fresh re-run
    (per-call run dir + epoch-overwrite publishes: idempotent)."""
    calls = []
    orig = D.lsh_pairs_against

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(D, "lsh_pairs_against", counting)
    from db_loader_spark.queries.streamingq import t_stream_signatures

    r1 = sorted(map(tuple, t_stream_signatures(spark, SF).collect()))
    n_first = len(calls)
    assert n_first >= 2, "availableNow drain ran as a single batch"
    r2 = sorted(map(tuple, t_stream_signatures(spark, SF).collect()))
    assert r1 == r2
    assert r1  # non-empty on this corpus


def test_index_maintenance_survives_stop_and_resume(spark, tmp_path):
    """T2 crash-resume for the dedup index: stop the stream after ≥1
    published epoch, restart on the SAME checkpoint with an
    availableNow drain, and the resumed run processes only the
    remaining files (epoch-overwrite absorbs any replayed torn batch).
    The final union of incremental pairs still equals the batch LSH,
    and the signature table holds each doc exactly once."""
    import os
    import time as _time

    from db_loader_spark.queries.streamingq import make_index_maintainer

    src = str(tmp_path / "docs")
    sig_dir = str(tmp_path / "sigs")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF, "documents")
    docs.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)
    maintainer = make_index_maintainer(spark, sig_dir, pairs_dir)

    def start(available_now: bool):
        w = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(maintainer)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        else:
            w = w.trigger(processingTime="0 seconds")
        return w.start()

    # phase 1: run until at least one epoch published, then stop mid-way
    q = start(available_now=False)
    deadline = _time.time() + 120
    while _time.time() < deadline:
        done = len(os.listdir(pairs_dir)) if os.path.isdir(pairs_dir) else 0
        if done >= 1:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    interrupted_epochs = len(os.listdir(pairs_dir))
    assert interrupted_epochs >= 1

    # phase 2: resume on the same checkpoint; drain the rest
    q2 = start(available_now=True)
    q2.awaitTermination()
    final_epochs = len(os.listdir(pairs_dir))
    assert final_epochs >= max(2, interrupted_epochs)

    # each doc signed exactly once across epochs (no double ingestion)
    sigs = spark.read.parquet(os.path.join(sig_dir, "epoch=*"))
    assert sigs.count() == sigs.select("id").distinct().count()
    assert sigs.count() == docs.count()

    # stream ≡ batch after the interruption
    incremental = (
        spark.read.parquet(os.path.join(pairs_dir, "epoch=*"))
        .select("doc_a", "doc_b", "est_sim")
        .distinct()
    )
    full_sigs = D.minhash_signatures(docs, num_hashes=8)
    full = D.lsh_candidate_pairs(
        full_sigs, num_hashes=8, band_size=2, min_est_sim=0.375, materialize=False
    )
    assert incremental.exceptAll(full).count() == 0
    assert full.exceptAll(incremental).count() == 0
