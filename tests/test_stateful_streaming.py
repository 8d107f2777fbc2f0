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
