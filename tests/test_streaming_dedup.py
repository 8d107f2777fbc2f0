"""Streaming dedup + stream-stream interval join vs their batch twins.

Same discipline as test_stateful_streaming: replay data in time-ordered
micro-batches; everything the stream emits must agree with the batch
computation on the same data (the stream may only lag, never disagree).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from db_loader_spark.streaming.dedup import (
    content_hash,
    stream_exact_dedup,
    stream_interval_join,
)

BASE = dt.datetime(2024, 6, 1, 12, 0, 0)


def _docs_chunks(spark, tmp_path):
    """Three single-file parquet chunks, mtime-ordered; duplicates both
    inside one chunk and across chunks (within the watermark horizon)."""
    rows = [
        # chunk 0: a, b, duplicate a (same content, later ts)
        [(BASE, "doc a"), (BASE + dt.timedelta(minutes=1), "doc b"),
         (BASE + dt.timedelta(minutes=2), "doc a")],
        # chunk 1: c, cross-chunk duplicate of b
        [(BASE + dt.timedelta(minutes=3), "doc c"),
         (BASE + dt.timedelta(minutes=4), "doc b")],
        # chunk 2: d, cross-chunk duplicate of a
        [(BASE + dt.timedelta(minutes=5), "doc d"),
         (BASE + dt.timedelta(minutes=6), "doc a")],
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for i, chunk in enumerate(rows):
        df = spark.createDataFrame(chunk, "ts timestamp, text string").coalesce(1)
        chunk_dir = str(tmp_path / f"tmp{i}")
        df.write.parquet(chunk_dir)
        import os

        part = [f for f in os.listdir(chunk_dir) if f.endswith(".parquet")][0]
        final = str(src / f"chunk_{i}.parquet")
        os.rename(os.path.join(chunk_dir, part), final)
        os.utime(final, (1_700_000_000 + 10 * i, 1_700_000_000 + 10 * i))
    return str(src)


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    src = _docs_chunks(spark, tmp_path)
    schema = "ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text, count(*) AS n FROM dedup_stream GROUP BY text")
    counts = {r.text: r.n for r in got.collect()}
    # every distinct content exactly once — duplicates dropped within a
    # batch AND across micro-batches (state carried via the watermark)
    assert counts == {"doc a": 1, "doc b": 1, "doc c": 1, "doc d": 1}

    # stream agrees with the batch dedup on the same files
    batch = spark.read.parquet(src)
    batch_n = batch.withColumn("h", content_hash()).select("h").distinct().count()
    assert sum(counts.values()) == batch_n


def test_stream_interval_join_subset_of_batch(spark, tmp_path):
    """Clicks joined to views within [0s, 5min] per user: every emitted
    streaming pair must appear in the batch interval join."""
    views = [
        (1, BASE, "v1"),
        (1, BASE + dt.timedelta(minutes=10), "v2"),
        (2, BASE, "v3"),
    ]
    clicks = [
        (1, BASE + dt.timedelta(minutes=2), "c1"),   # joins v1
        (1, BASE + dt.timedelta(minutes=11), "c2"),  # joins v2
        (2, BASE + dt.timedelta(minutes=9), "c3"),   # joins nothing
    ]
    import os

    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(
        views, "user_id long, ts timestamp, view_id string"
    ).coalesce(1).write.parquet(vdir)
    spark.createDataFrame(
        clicks, "user_id long, cts timestamp, click_id string"
    ).coalesce(1).write.parquet(cdir)

    vschema = "user_id long, ts timestamp, view_id string"
    cschema = "user_id long, cts timestamp, click_id string"
    vs = spark.readStream.schema(vschema).parquet(vdir)
    cs = (
        spark.readStream.schema(cschema)
        .parquet(cdir)
        .withColumnRenamed("user_id", "c_user_id")
    )
    joined = stream_interval_join(
        vs.withColumnRenamed("user_id", "uid"),
        cs.withColumnRenamed("c_user_id", "uid"),
        on="uid",
        left_ts="ts",
        right_ts="cts",
        upper="5 minutes",
    ).select("view_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.view_id, r.click_id) for r in spark.sql("SELECT * FROM sjoin").collect()}

    bv = spark.read.parquet(vdir).withColumnRenamed("user_id", "uid")
    bc = spark.read.parquet(cdir).withColumnRenamed("user_id", "uid")
    expected = {
        (r.view_id, r.click_id)
        for r in bv.join(
            bc,
            (bv.uid == bc.uid)
            & (bc.cts >= bv.ts)
            & (bc.cts <= bv.ts + F.expr("INTERVAL 5 minutes")),
        ).collect()
    }
    assert expected == {("v1", "c1"), ("v2", "c2")}
    assert got == expected  # availableNow drains fully → equality here


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """The production bounded-state dedup mode (referenced by
    t_stream_dedup's docstring): duplicates arriving within the
    watermark delay are dropped, and — the part that bounds state at
    100 TB — a key whose state the watermark has expired is ADMITTED
    AGAIN. Four single-file micro-batches; eviction commits in the
    spacer batch, so the re-arrival in the last batch re-emits."""
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    src = str(tmp_path / "wmk_src")

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write("f0", [(1, t(12))])
    write("f1", [(1, t(12, 5)), (2, t(14))])  # in-watermark dupe + advance
    write("f2", [(3, t(16))])  # spacer: id=1 state evicted at this commit
    write("f3", [(1, t(17))])  # same key, fresh ts → re-admitted
    for i, n in enumerate(["f0", "f1", "f2", "f3"]):
        os.utime(os.path.join(src, n), (1000 + i, 1000 + i))  # listing order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wmk_bounded_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["id"], str(r["ts"])) for r in spark.table("wmk_bounded_out").collect()
    )
    assert rows == [
        (1, "2024-01-01 12:00:00"),  # first arrival kept
        (1, "2024-01-01 17:00:00"),  # re-admitted after state eviction
        (2, "2024-01-01 14:00:00"),
        (3, "2024-01-01 16:00:00"),
    ]  # and (1, 12:05) — the within-watermark duplicate — was dropped


def test_chained_stateful_dedup_then_window_agg(spark, tmp_path):
    """TWO stateful operators in one streaming query (Spark ≥ 3.4
    append-mode chaining): dropDuplicatesWithinWatermark feeding a
    windowed aggregate. Pins all the composition semantics at once:
    the duplicate is removed BEFORE aggregation (12:00 window counts
    it once), windows emit exactly once after the watermark passes
    their end, and the still-open final window is NOT emitted."""
    import os

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "chain_src")

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write("f0", [(1, t(12, 10), 1.0), (2, t(12, 20), 2.0)])
    write("f1", [(1, t(12, 10), 1.0), (3, t(13, 10), 3.0)])  # dupe + next hour
    write("f2", [(4, t(16), 4.0)])  # advances watermark past both windows
    for i, n in enumerate(["f0", "f1", "f2"]):
        os.utime(os.path.join(src, n), (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["id"])
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("sv"))
        .select(F.date_format("window.start", "HH:mm").alias("w"), "n", "sv")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("chain_stateful_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(tuple(r) for r in spark.table("chain_stateful_out").collect())
    # duplicate counted ONCE; 16:00 window still open → absent
    assert rows == [("12:00", 2, 3.0), ("13:00", 1, 3.0)]
