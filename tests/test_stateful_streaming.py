"""Stateful streaming sessionization vs the batch session_window query.

The stream replays the events table in four time-ordered chunks
(micro-batch per file), so the watermark advances between batches and
closed sessions flush through the EventTimeTimeout path. Every emitted
session must EXACTLY match a session the batch query computes on the
same data — the streaming operator may only lag (sessions still open or
not yet past the watermark), never disagree.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from db_loader_spark.queries.eventops import t_session_window
from db_loader_spark.streaming.stateful import sessionize_stream
from db_loader_spark.tables import load_table


@pytest.fixture(scope="module")
def chunked_events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 4 single-file parquet chunks by time quartile,
    mtimes ascending so the file source processes them in time order."""
    out = str(tmp_path_factory.mktemp("evchunks"))
    e = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    ts_q = [
        r[0]
        for r in e.selectExpr(
            "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS q"
        ).collect()
    ][0]
    lo, mid, hi = [int(x) for x in ts_q]
    conds = [
        F.unix_micros("ts") <= lo,
        (F.unix_micros("ts") > lo) & (F.unix_micros("ts") <= mid),
        (F.unix_micros("ts") > mid) & (F.unix_micros("ts") <= hi),
        F.unix_micros("ts") > hi,
    ]
    for i, cond in enumerate(conds):
        chunk_dir = os.path.join(out, f"tmp{i}")
        e.filter(cond).coalesce(1).write.parquet(chunk_dir)
        part = [f for f in os.listdir(chunk_dir) if f.endswith(".parquet")][0]
        final = os.path.join(out, f"chunk_{i}.parquet")
        os.rename(os.path.join(chunk_dir, part), final)
        os.utime(final, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return out


def test_late_events_fold_correctly(spark, tmp_path):
    """A batch-2 event EARLIER than the open session (but inside the
    watermark) must min-merge or form its own earlier session — never
    corrupt the open session's span."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)

    def mk(minute_offsets, name):
        rows = [
            (base + dt.timedelta(minutes=m), 1, 1.0) for m in minute_offsets
        ]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
        chunk_dir = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(chunk_dir)
        part = [f for f in os.listdir(chunk_dir) if f.endswith(".parquet")][0]
        final = str(tmp_path / f"chunk_{name}.parquet")
        os.rename(os.path.join(chunk_dir, part), final)
        return final

    # batch 0: events at t=100,101min (open session A)
    # batch 1: LATE event at t=99min (inside watermark → must extend A's
    #          start), plus t=200min (new session B forces A's flush via
    #          gap) and t=0min (its own, long-closed session C)
    f0 = mk([100, 101], "0")
    f1 = mk([99, 0, 200], "1")
    os.utime(f0, (1_700_000_000, 1_700_000_000))
    os.utime(f1, (1_700_000_010, 1_700_000_010))

    static = spark.read.parquet(f0)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "chunk_*.parquet")
        .parquet(str(tmp_path))
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="10 hours")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.session_start, r.n_events): r.duration_min
        for r in spark.table("late_sessions").collect()
    }
    # session C (t=0) closed: singleton; session A closed when B opened:
    # events 99,100,101 → start=12:00+99min=13:39:00, span 2.0 min
    assert ("2024-06-01 12:00:00", 1) in got
    assert ("2024-06-01 13:39:00", 3) in got, got
    assert got[("2024-06-01 13:39:00", 3)] == 2.0


def test_stateful_sessions_match_batch(spark, sf_dir, chunked_events_dir, tmp_path):
    static = spark.read.parquet(chunked_events_dir + "/chunk_0.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "chunk_*.parquet")
        .parquet(chunked_events_dir)
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="5 seconds")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.table("stateful_sessions")
    batch = t_session_window(spark, sf_dir)

    n_streamed = streamed.count()
    n_batch = batch.count()
    assert n_streamed > 0, "stream emitted nothing — watermark never advanced"
    # Every streamed session matches a batch session exactly (all columns).
    cols = ["user_id", "session_start", "n_events", "total_value", "duration_min"]
    mismatched = streamed.select(cols).exceptAll(batch.select(cols)).count()
    assert mismatched == 0, f"{mismatched} streamed sessions disagree with batch"
    # No duplicate emissions.
    assert streamed.select(cols).distinct().count() == n_streamed
    # The stream may only lag the batch answer, and not by much: all but
    # the final (still-open / past-watermark) sessions flushed.
    assert n_streamed >= n_batch * 0.3
    assert n_streamed <= n_batch


def test_registry_stream_sessions_equals_batch_exactly(spark, sf_dir):
    """The registry key's sentinel-flush protocol upgrades the subset
    relation (test above) to EQUALITY: after the past-horizon
    sentinels drain (r15 layout: the +2h sentinel rides in the last
    data chunk and only the +4h sentinel gets its own file — 3
    micro-batches), every real session has flushed, so the streamed
    set must match the native-operator batch answer row for row."""
    from db_loader_spark.queries.eventops import t_session_window
    from db_loader_spark.queries.streamingq import t_stream_sessions

    streamed = t_stream_sessions(spark, sf_dir)
    batch = t_session_window(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "total_value", "duration_min"]
    assert streamed.count() == batch.count()
    assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0


def test_stream_sessions_result_is_published_not_collected(spark, sf_dir):
    """Driver-memory contract (VERDICT r6 #2): the wrapper's result is
    a lazy read of the foreachBatch-published epoch parquet — never a
    collect()/createDataFrame round trip through the driver, whose
    footprint would scale with session count. A parquet-backed frame
    reports its input files; a driver-localized one reports none."""
    from db_loader_spark.queries.streamingq import t_stream_sessions

    streamed = t_stream_sessions(spark, sf_dir)
    files = streamed.inputFiles()
    assert files, "session result is not file-backed (driver-resident?)"
    assert all("epoch=" in f for f in files)
