"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 — the stateful shape the
reference's batch-emulated incremental loop never had).

Semantics match the batch ``queries.eventops.t_session_window``
(native ``session_window``): events of one user belong to one session
while consecutive gaps stay < gap; a session is emitted when the event
-time watermark passes its close (last event + gap). Output rows are
bit-compatible with the batch query so the two can be equi-joined in
tests — the streaming answer must be a subset (open sessions not yet
flushed) of the batch answer.

Scale design: state is 4 numbers per active user key — an
executor-partitioned hash map keyed by user_id, so the operator scales
horizontally with key cardinality; watermark-driven timeouts bound
state size (idle keys are evicted as they flush). Arrow batches carry
the per-key rows, so the Python boundary is vectorized, not per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw operator output: integers + an unrounded sum. Formatting and
# rounding happen JVM-SIDE in sessionize_stream's post-projection: the
# flushed session stream is large (95k rows at sf0.1) and grows with
# users × time, so per-session Python strftime/round work belongs in
# codegen. Honest accounting: at THIS corpus the bench row is
# machinery-bound — a no-op state function costs the same ~9 s (6
# micro-batches × state store + Arrow + worker round-trips) — so the
# local timing is unchanged; the projection removes the per-session
# Python term that would otherwise dominate once batches carry
# millions of sessions. The Python boundary now carries only the
# state fold, which is the part Spark can't express.
SESSION_RAW_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_raw", DoubleType()),
    ]
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("duration_min", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _make_session_fn(gap_us: int):
    """Build the per-key state-update function as a CLOSURE so it pickles
    by value — executors must not need this package importable."""

    def update(key, pdfs, state):
        import pandas as pd

        def finish(start_us, last_us, n, total):
            # raw integers + unrounded sum: formatting/rounding is the
            # JVM projection's job (see SESSION_RAW_SCHEMA note)
            return (key[0], start_us, last_us, n, total)

        out = []
        if state.hasTimedOut:
            # Watermark passed last+gap with no new data: flush and evict.
            start_us, last_us, n, total = state.get
            out.append(finish(start_us, last_us, n, total))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts_us = (
                (rows["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
            ).astype("int64")
            # Each event is a singleton interval; the carried state is an
            # interval too. Folding them SORTED BY START handles late
            # rows inside the watermark correctly — an event before the
            # open session's start min-merges or forms its own earlier
            # session, instead of corrupting the open one's span.
            items = [
                (int(t), int(t), 1, float(v))
                for t, v in zip(ts_us, rows["value"])
            ]
            if state.exists:
                items.append(tuple(state.get))
            items.sort(key=lambda it: (it[0], it[1]))
            acc = None
            for s, l, n, tot in items:
                if acc is None:
                    acc = (s, l, n, tot)
                elif s - acc[1] >= gap_us:
                    out.append(finish(*acc))
                    acc = (s, l, n, tot)
                else:
                    acc = (acc[0], max(acc[1], l), acc[2] + n, acc[3] + tot)
            state.update(acc)
            # Event-time timeout fires when the watermark passes this (ms).
            state.setTimeoutTimestamp(acc[1] // 1000 + gap_us // 1000)
        yield pd.DataFrame(
            out,
            columns=["user_id", "start_us", "last_us", "n_events", "total_raw"],
        )

    return update


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "5 seconds",
) -> DataFrame:
    """Stateful gap sessionization of a streaming events frame.

    ``events`` must carry ``ts TIMESTAMP, user_id LONG, value DOUBLE``.
    Returns the streaming DataFrame of closed sessions (append mode).
    Per key and micro-batch, events and the carried open-session
    interval fold in start order, so late rows inside the watermark
    merge correctly (extending the open session's start, or forming
    their own earlier session). Inherent append-mode limit: a session
    emitted mid-stream cannot retroactively absorb a row that arrives
    even later — the watermark is the contract bounding that disorder.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    raw = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_us),
            SESSION_RAW_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    # JVM-side epilogue (stateless projection on the stream): session
    # timezone is pinned UTC (session.py), so timestamp_micros +
    # date_format renders the same UTC string the operator used to
    # build in Python — at codegen speed instead of one
    # datetime/strftime/round call chain per flushed session.
    return raw.select(
        "user_id",
        F.date_format(F.timestamp_micros(F.col("start_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        F.round(F.col("total_raw"), 2).alias("total_value"),
        F.round(
            (F.col("last_us") - F.col("start_us")) / F.lit(60_000_000.0), 2
        ).alias("duration_min"),
    )
