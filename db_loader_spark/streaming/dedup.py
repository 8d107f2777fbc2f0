"""Streaming deduplication + stream-stream joins (the incremental faces
of the batch dedup/join operators).

A 100 TB training-data pipeline ingests continuously; dedup and joins
must run incrementally or the batch job becomes a daily full rescan.
Two operators:

- ``stream_exact_dedup``: the streaming twin of ``dedup_exact``
  (functions/dedup.py) — drop re-arrivals of the same content hash.
  ``dropDuplicatesWithinWatermark`` keys state by the hash and evicts
  entries once the event-time watermark passes, so state tracks the
  de-dup horizon (delay window), not history. Exactly the semantics a
  crawler feed needs: the same document re-fetched within the horizon
  is dropped; a re-fetch months later is (by design) a new version.
- ``stream_interval_join``: watermarked stream-stream equi+interval
  join (the streaming face of the batch range join,
  queries/eventops.jn_range_join). Both sides carry watermarks and the
  time-range predicate bounds how long either side's rows stay in
  state — without the interval bound Spark would have to keep every
  left row forever.

Both are pure DataFrame/Structured-Streaming compositions — no Python
in the stream, state lives JVM-side in the state store, scaling with
keys-in-horizon per executor.

The reference has no streaming story (its incremental loop is a shell
``while`` over files, scripts/load_csv_to_cloud.sh:107-141); these are
Spark-native extensions in the same spirit as streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash(text_col: str = "text") -> Column:
    """The dedup key: md5 of the exact content (same key the batch
    ``dedup_exact`` groups on — stream and batch agree on identity)."""
    return F.md5(F.col(text_col))


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup: first arrival of each content hash within
    the watermark horizon wins; later duplicates are dropped.

    State = one entry per distinct hash seen within ``delay`` of the
    watermark, evicted automatically — bounded by arrival rate × delay,
    never by corpus size.
    """
    return (
        docs.withColumn("content_hash", content_hash(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
) -> DataFrame:
    """Stream⋈stream: equi-join on ``on`` with ``right_ts`` constrained
    to [left_ts + lower, left_ts + upper].

    The watermarks + interval bound let Spark expire state on both
    sides: a left row can stop waiting once the watermark passes
    ``left_ts + upper``, a right row once it passes ``right_ts`` —
    state is O(rows in the join horizon).
    """
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return lw.join(rw, cond)
