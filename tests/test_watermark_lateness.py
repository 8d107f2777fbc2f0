"""Watermark-lateness witness (VERDICT r10 #9 — the most scale-relevant
gap in the streaming story): a file arriving AFTER the watermark passed
its events' windows is provably DROPPED, and the stream's final answer
equals the batch aggregate over everything-minus-the-late-rows.

Every other stream ≡ batch proof in this repo deliberately sets the
watermark delay to cover the corpus's full span, so nothing is ever
late and equality is exact. That witnesses the happy path but says
nothing about the eviction contract production relies on: at 100 TB,
the watermark is what BOUNDS state (windows close, their state is
freed, and a straggler file cannot reopen them). This test drives the
other side: an ordered multi-batch availableNow drain where a late
file lands strictly after the watermark crossed its window, in APPEND
mode (the unbounded-sink mode where closed windows emit exactly once).

The assertions are three-way, so the drop is witnessed, not vacuous:
  1. the stream result equals batch-minus-late exactly (value-level);
  2. the late rows ARE in the batch-over-everything aggregate, which
     therefore differs — the late file genuinely carried weight;
  3. the late rows' window emitted BEFORE the late file's batch ran
     (append mode: once per window), so the drop is the watermark
     contract, not an accident of grouping.

Determinism: files drain one per micro-batch in mtime order (the
_stage_time_chunks technique — coalesce(1), rename, ascending utime);
the watermark advances only at batch ends, so "late" is a property of
the schedule, not a race. The sentinel protocol (two far-future files)
flushes the final windows, same as t_stream_sessions.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

GAP = dt.timedelta(hours=1)
T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write_ordered_files(spark, stage: str, parts: list[list[tuple]]) -> None:
    """One single-file parquet per part, mtimes ascending so the file
    source drains them in order, one per micro-batch."""
    os.makedirs(stage, exist_ok=True)
    for i, rows in enumerate(parts):
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        tmp = os.path.join(stage, f"tmp{i}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = os.path.join(stage, f"chunk_{i}.parquet")
        os.rename(os.path.join(tmp, part), final)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(final, (1_700_000_000 + i * 10,) * 2)


def test_late_file_past_watermark_is_provably_dropped(spark, tmp_path):
    on_time = [
        (T0 + dt.timedelta(minutes=m), "on_time") for m in (0, 5, 30, 59)
    ]
    # late rows fall inside the SAME 10:00 window but arrive well after
    # the watermark crossed it
    late = [(T0 + dt.timedelta(minutes=m), "late") for m in (7, 42)]
    # sentinels: far-future events whose arrival advances the watermark
    # (1h delay) past everything before them; the last flushes the
    # others' windows. The SPACER batch between the advance and the
    # late file matters: the watermark a batch filters with reflects
    # event time through batch N-2 (one-batch propagation lag — the
    # engine plans batch N with the watermark committed at N-1, which
    # was computed from N-2's max event time; measured here, and the
    # same lag the sessionize sentinel protocol's SECOND sentinel
    # absorbs). A late file exactly one batch after the advance still
    # lands in the open window — that schedule is "within allowance"
    # from the engine's view, not a drop failure.
    s1 = [(T0 + dt.timedelta(hours=20), "sentinel")]
    spacer = [(T0 + dt.timedelta(hours=21), "sentinel2")]
    s2 = [(T0 + dt.timedelta(hours=40), "sentinel3")]

    stage = str(tmp_path / "stage")
    _write_ordered_files(spark, stage, [on_time, s1, spacer, late, s2])

    static = spark.read.parquet(stage)
    windowed = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
        )
    )
    run_dir = str(tmp_path / "run")
    emitted_per_batch: dict[int, list] = {}

    def publish(batch_df, epoch_id: int) -> None:
        emitted_per_batch[epoch_id] = batch_df.collect()

    q = (
        windowed.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
        .foreachBatch(publish)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["window_start"], r["event_type"], r["n"])
        for rows in emitted_per_batch.values()
        for r in rows
    )

    def batch_agg(rows):
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        return sorted(
            (r["window_start"], r["event_type"], r["n"])
            for r in df.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm").alias(
                    "window_start"
                ),
                "event_type",
                "n",
            )
            .collect()
        )

    # 1. stream ≡ batch-minus-late, value-level (sentinels included
    #    identically on both sides; s2's own window never closes and
    #    never emits, matching batch-minus-open-tail is NOT claimed —
    #    so compare against the batch agg over exactly the rows whose
    #    windows closed: everything except late and s2)
    assert got == batch_agg(on_time + s1 + spacer)
    # 2. the late rows carried weight: batch-over-everything differs,
    #    and specifically by the late rows' own group
    with_late = batch_agg(on_time + s1 + spacer + late)
    assert got != with_late
    assert ("2024-01-01 10:00", "late", 2) in with_late
    assert not any(t == "late" for _, t, _ in got)
    # 3. append-mode schedule: the on-time 10:00 window emitted
    #    strictly BEFORE the late file's batch (epoch 3) could have
    #    contributed — the drop is the watermark contract, not
    #    grouping coincidence
    late_epoch = 3  # files drain in mtime order, one per micro-batch
    emitted_10 = [
        e
        for e, rows in emitted_per_batch.items()
        if any(r["window_start"] == "2024-01-01 10:00" for r in rows)
    ]
    assert emitted_10 and all(e < late_epoch for e in emitted_10)
    # and nothing emitted for 10:00 again at or after the late batch
    assert not any(
        r["window_start"] == "2024-01-01 10:00" and r["event_type"] == "late"
        for rows in emitted_per_batch.values()
        for r in rows
    )


def test_within_watermark_straggler_is_kept(spark, tmp_path):
    """The dual witness: a straggler INSIDE the lateness allowance
    (window still open — the watermark has not passed window_end) is
    aggregated normally, so the drop above is the contract firing, not
    the engine discarding any out-of-order input."""
    on_time = [(T0 + dt.timedelta(minutes=m), "on_time") for m in (0, 30)]
    # advances the watermark to 10:30 (delay 1h): the 10:00 window
    # [10:00, 11:00) is NOT yet closed
    nudge = [(T0 + dt.timedelta(minutes=90), "nudge")]
    straggler = [(T0 + dt.timedelta(minutes=10), "straggler")]
    s1 = [(T0 + dt.timedelta(hours=20), "sentinel")]
    s2 = [(T0 + dt.timedelta(hours=40), "sentinel")]

    stage = str(tmp_path / "stage")
    _write_ordered_files(spark, stage, [on_time, nudge, straggler, s1, s2])

    static = spark.read.parquet(stage)
    windowed = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
        )
    )
    run_dir = str(tmp_path / "run")
    out: list = []

    q = (
        windowed.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
        .foreachBatch(lambda b, e: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted((r["window_start"], r["event_type"], r["n"]) for r in out)
    assert ("2024-01-01 10:00", "straggler", 1) in got
    assert ("2024-01-01 10:00", "on_time", 2) in got


def test_state_rows_bounded_under_long_drain(spark, tmp_path):
    """The EVICTION half of the watermark contract, size-witnessed
    (VERDICT r11 #7): across a LONG ordered drain, the streaming
    aggregation's state store holds only the windows still inside the
    watermark horizon — old windows are freed, so state is O(open
    windows x keys), not O(all windows ever seen). This is the claim
    100 TB streaming rests on: without eviction a day-long drain would
    accumulate every window it ever opened and the state store would
    grow linearly with stream lifetime.

    Witness shape: 24 hourly files (one per micro-batch, mtime-ordered)
    x 3 keys, 1-hour tumbling windows, 2-hour watermark. Unbounded
    state would end at 24 windows x 3 keys = 72 rows; the bound
    asserted is 8 windows x 3 keys = 24 (2h allowance + window width +
    the engine's N-2 watermark propagation lag, with slack), read from
    the engine's own per-batch stateOperators metrics — not inferred
    from output."""
    n_hours, keys = 24, ["a", "b", "c"]
    parts = [
        [
            (T0 + dt.timedelta(hours=h, minutes=m), k)
            for k in keys
            for m in (0, 30)
        ]
        for h in range(n_hours)
    ]
    stage = str(tmp_path / "stage")
    _write_ordered_files(spark, stage, parts)

    static = spark.read.parquet(stage)
    windowed = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
        )
    )
    emitted: list = []

    def publish(batch_df, epoch_id: int) -> None:
        emitted.extend(batch_df.collect())

    q = (
        windowed.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(publish)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    # genuinely long drain: one batch per hourly file
    assert len(state_rows) >= n_hours
    unbounded = n_hours * len(keys)  # what no-eviction would end at (72)
    bound = 8 * len(keys)  # open-horizon windows x keys, with slack (24)
    assert max(state_rows) <= bound, (max(state_rows), state_rows)
    assert bound < unbounded  # the bound itself is a real claim
    # eviction observably fired: state SHRANK at least once mid-drain
    assert any(b < a for a, b in zip(state_rows, state_rows[1:])), state_rows
    # and the plateau is flat, not slow growth: the max over the last
    # third of the drain is no higher than the max over the middle third
    third = len(state_rows) // 3
    assert max(state_rows[-third:]) <= max(state_rows[third:-third])
    # value-level: append mode emitted every CLOSED window exactly once,
    # with the right count (6 rows per window-key pair -> n=2 per key)
    per_wk: dict = {}
    for r in emitted:
        per_wk[(r["window_start"], r["event_type"])] = (
            per_wk.get((r["window_start"], r["event_type"]), 0) + 1
        )
    assert all(v == 1 for v in per_wk.values())  # exactly-once per window
    assert all(r["n"] == 2 for r in emitted)
    # every window old enough to have closed under the 2h watermark
    # (plus propagation lag) emitted; the open tail never does
    emitted_hours = {
        int(
            (
                dt.datetime.strptime(ws, "%Y-%m-%d %H:%M") - T0
            ).total_seconds()
            // 3600
        )
        for ws, _ in per_wk
    }
    assert set(range(n_hours - 6)) <= emitted_hours
    assert n_hours - 1 not in emitted_hours  # the final window stays open
