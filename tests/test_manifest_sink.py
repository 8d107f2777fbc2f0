"""Manifest-committed table layout (sinks/manifest.py): snapshot
atomicity, idempotent retries, crash-residue invisibility, time
travel, concurrent-publish detection, and vacuum — the object-store
-safe commit protocol the rename-based sinks document as out of scope."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_loader_spark.sinks import manifest as M


def test_publish_read_roundtrip_and_lineage(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s1 = M.publish(spark.range(100).withColumn("v", F.col("id") * 2), root)
    assert M.current_snapshot(root) == s1
    assert M.read_current(spark, root).count() == 100
    s2 = M.publish(spark.range(40), root)
    assert M.snapshots(root) == [s1, s2]
    # time travel: old snapshot intact after the new one published
    assert M.read_snapshot(spark, root, s1).count() == 100
    assert M.read_current(spark, root).count() == 40


def test_crashed_writer_is_invisible(spark, tmp_path):
    """A writer that dies after staging data but BEFORE the pointer
    moves leaves zero reader-visible effect: the current snapshot
    still serves the old file list (manifest-driven scan, never a
    directory listing)."""
    root = str(tmp_path / "tbl")
    M.publish(spark.range(10), root)
    # simulate a crashed writer: staged files + manifest, no pointer move
    staged = os.path.join(root, "data", "deadbeef-crashed")
    spark.range(9999).write.parquet(staged)
    with open(os.path.join(root, "_manifests", "deadbeef-crashed.json"), "w") as fh:
        fh.write('{"snapshot_id": "deadbeef-crashed", "parent": null, "files": []}')
    assert M.read_current(spark, root).count() == 10
    # vacuum reclaims the orphaned prefix
    removed = M.vacuum(root, keep=1)
    assert "deadbeef-crashed" in removed
    assert not os.path.exists(staged)
    assert M.read_current(spark, root).count() == 10


def test_retry_with_same_snapshot_id_is_idempotent(spark, tmp_path):
    """The foreachBatch at-least-once contract: replaying a publish
    with the same snapshot id (epoch token) re-stages over its own
    files and re-points — one snapshot, same rows, no duplicates."""
    root = str(tmp_path / "tbl")
    df = spark.range(50)
    M.publish(df, root, snapshot_id="epoch-7")
    M.publish(df, root, snapshot_id="epoch-7")
    assert M.current_snapshot(root) == "epoch-7"
    assert M.read_current(spark, root).count() == 50
    assert len([s for s in M.snapshots(root) if s == "epoch-7"]) == 1


def test_concurrent_publish_detected(spark, tmp_path, monkeypatch):
    """Optimistic concurrency through publish's OWN code path: the
    loser captured its parent before the winner's pointer moved; its
    pre-point recheck must raise and leave the pointer untouched."""
    root = str(tmp_path / "tbl")
    s1 = M.publish(spark.range(5), root)
    s2 = M.publish(spark.range(6), root)  # the winner lands

    orig = M.current_snapshot
    state = {"first": True}

    def stale_then_real(r):
        if state["first"]:
            state["first"] = False
            return s1  # the loser's stale parent capture
        return orig(r)

    monkeypatch.setattr(M, "current_snapshot", stale_then_real)
    with pytest.raises(RuntimeError, match="concurrent publish"):
        M.publish(spark.range(7), root)
    monkeypatch.undo()
    assert M.current_snapshot(root) == s2  # failed publish never pointed


def test_vacuum_keeps_recent_lineage(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sids = [M.publish(spark.range(i + 1), root) for i in range(4)]
    removed = M.vacuum(root, keep=2)
    assert set(removed) == set(sids[:2])
    # survivors still readable, pruned ones gone
    assert M.read_snapshot(spark, root, sids[2]).count() == 3
    assert M.read_current(spark, root).count() == 4
    with pytest.raises(Exception):
        M.read_snapshot(spark, root, sids[0])
