"""Commit-log consumer: stream-consumed commits must equal the batch
snapshot diffs across every DML verb (VERDICT r12 #4's done-bar:
>=2 commits including a DELETE and a RESTORE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_loader_spark.sinks import manifest as M
from db_loader_spark.streaming.commit_log import (
    CommitLogConsumer,
    CommitLogTruncated,
    read_event_appended,
    read_event_mor_deleted,
)


def _base(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    M.publish(
        spark.range(500)
        .select("id", (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "id"),
        root, snapshot_id="v1", stats_cols=["id"],
    )
    return root


def test_tail_equals_batch_diff_across_full_dml_sequence(spark, tmp_path):
    """One consumer follows append → MOR delete → merge → COW delete →
    compact → restore; every event's file sets must equal the batch
    diff of the two manifests, replaying the events over a file-set +
    mask state must reproduce every snapshot's manifest, and the final
    state must equal read_current."""
    root = _base(spark, tmp_path)
    consumer = CommitLogConsumer(root)
    (first,) = consumer.poll()
    assert first.snapshot_id == "v1" and first.parent is None
    assert first.added_files == M._manifest(root, "v1")["files"]
    assert consumer.poll() == []  # pointer unmoved

    M.publish(
        spark.range(9_000, 9_050).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a1", stats_cols=["id"],
    )
    M.delete_where(spark, root, "id % 50 = 3", mode="mor", snapshot_id="d1")
    M.merge_upsert(
        spark,
        spark.createDataFrame([(10, -1), (7_777, -2)], "id long, v long"),
        root, "id", snapshot_id="m1",
    )
    M.delete_where(spark, root, "id >= 9000", mode="cow", snapshot_id="d2")
    M.compact_snapshot(spark, root, 2, snapshot_id="c1")
    M.restore_snapshot(root, "d1", snapshot_id="r1")

    events = consumer.poll()
    assert [e.snapshot_id for e in events] == ["a1", "d1", "m1", "d2", "c1", "r1"]

    # every event == the batch manifest diff, and replaying the events
    # over (files, masked-rows) state reproduces each manifest exactly
    state_files: set = set(M._manifest(root, "v1")["files"])
    masked: dict = {}
    for e in events:
        man = M._manifest(root, e.snapshot_id)
        pm = M._manifest(root, e.parent)
        assert sorted(e.added_files) == sorted(
            set(man["files"]) - set(pm["files"])
        )
        assert e.removed_files == sorted(set(pm["files"]) - set(man["files"]))
        state_files = (state_files - set(e.removed_files)) | set(e.added_files)
        assert state_files == set(man["files"])
        masked = {
            f: n for f, n in masked.items() if f in state_files
        }
        for f, n in e.dv_added.items():
            masked[f] = masked.get(f, 0) + n
        assert masked == {
            f: entry["rows"]
            for f, entry in man.get("deletes", {}).items()
        }

    # MOR delete event: vectors only, zero file movement
    d1 = events[1]
    assert d1.added_files == [] and d1.removed_files == []
    assert sum(d1.dv_added.values()) == 11  # ids 3,53,...,503... within live set
    # restore event: pure metadata, file sets revert
    r1 = events[5]
    assert set(M._manifest(root, "r1")["files"]) == set(
        M._manifest(root, "d1")["files"]
    )

    # row-level reads: appended rows of a1, deleted rows of d1
    a1_rows = read_event_appended(spark, root, events[0])
    assert sorted(r.id for r in a1_rows.collect()) == list(range(9_000, 9_050))
    d1_rows = read_event_mor_deleted(spark, root, d1)
    assert sorted(r.id for r in d1_rows.collect()) == [
        i for i in list(range(500)) + list(range(9_000, 9_050)) if i % 50 == 3
    ]
    assert consumer.poll() == []


def test_resume_from_persisted_cursor(spark, tmp_path):
    root = _base(spark, tmp_path)
    c1 = CommitLogConsumer(root)
    c1.poll()
    cursor = c1.cursor  # persist...
    M.publish(spark.range(5).select("id", F.lit(0).cast("long").alias("v")),
              root, append=True, snapshot_id="a1")
    c2 = CommitLogConsumer(root, start_after=cursor)  # ...restart
    events = c2.poll()
    assert [e.snapshot_id for e in events] == ["a1"]


def test_vacuum_horizon_is_a_typed_refusal(spark, tmp_path):
    """A consumer behind the vacuum horizon must get
    CommitLogTruncated — never silently skipped commits."""
    root = _base(spark, tmp_path)
    stale = CommitLogConsumer(root)
    stale.poll()
    for i in range(3):
        M.publish(
            spark.range(i * 10, i * 10 + 5).select(
                "id", F.lit(0).cast("long").alias("v")
            ),
            root, append=True, snapshot_id=f"a{i}",
        )
    M.vacuum(root, keep=1)
    with pytest.raises(CommitLogTruncated, match="bootstrap"):
        stale.poll()
    # fresh consumer from genesis also refuses (history below horizon)
    with pytest.raises(CommitLogTruncated):
        CommitLogConsumer(root).poll()
    # the documented recovery: bootstrap from current, resume after it
    sid = M.current_snapshot(root)
    c = CommitLogConsumer(root, start_after=sid)
    assert c.poll() == []
    M.publish(spark.range(2).select("id", F.lit(0).cast("long").alias("v")),
              root, append=True, snapshot_id="post")
    assert [e.snapshot_id for e in c.poll()] == ["post"]


def test_foreign_cursor_refused(spark, tmp_path):
    root = _base(spark, tmp_path)
    c = CommitLogConsumer(root, start_after="never-existed")
    with pytest.raises(CommitLogTruncated, match="not in the live lineage"):
        c.poll()


def test_tail_generator_drains(spark, tmp_path):
    root = _base(spark, tmp_path)
    M.publish(spark.range(3).select("id", F.lit(0).cast("long").alias("v")),
              root, append=True, snapshot_id="a1")
    got = [e.snapshot_id for e in CommitLogConsumer(root).tail(
        poll_interval_s=0.01, max_polls=2)]
    assert got == ["v1", "a1"]


def test_empty_root_polls_empty(spark, tmp_path):
    assert CommitLogConsumer(str(tmp_path / "none")).poll() == []


def test_mor_deleted_rows_readable_when_columns_shadow_dv_names(spark, tmp_path):
    """A data table with columns literally named f/pos must not lose
    them to the DV-side drop in read_event_mor_deleted."""
    root = str(tmp_path / "tbl")
    M.publish(
        spark.range(100).select(
            "id", F.col("id").alias("f"), (F.col("id") * 3).alias("pos")
        ),
        root, snapshot_id="v1", stats_cols=["id"],
    )
    c = CommitLogConsumer(root)
    c.poll()
    M.delete_where(spark, root, "id < 5", mode="mor", snapshot_id="d1")
    (ev,) = c.poll()
    rows = read_event_mor_deleted(spark, root, ev)
    assert sorted(rows.columns) == ["f", "id", "pos"]
    assert sorted((r.id, r.f, r.pos) for r in rows.collect()) == [
        (i, i, 3 * i) for i in range(5)
    ]


def test_restore_that_unmasks_emits_dv_removed(spark, tmp_path):
    """r13 review #3: a RESTORE to a less-masked snapshot resurrects
    rows with IDENTICAL file sets — the event must carry dv_removed so
    a folding consumer's mask state tracks the manifest exactly."""
    root = _base(spark, tmp_path)
    c = CommitLogConsumer(root)
    c.poll()
    M.delete_where(spark, root, "id < 50", mode="mor", snapshot_id="d1")
    M.delete_where(spark, root, "id < 80", mode="mor", snapshot_id="d2")
    M.restore_snapshot(root, "d1", snapshot_id="r1")  # un-masks 50..79
    M.restore_snapshot(root, "v1", snapshot_id="r2")  # un-masks the rest
    events = c.poll()
    assert [e.snapshot_id for e in events] == ["d1", "d2", "r1", "r2"]
    masked: dict = {}
    for e in events:
        assert e.added_files == [] and e.removed_files == []
        for f, n in e.dv_added.items():
            masked[f] = masked.get(f, 0) + n
        for f, n in e.dv_removed.items():
            masked[f] = masked[f] - n
            if masked[f] == 0:
                del masked[f]
        man = M._manifest(root, e.snapshot_id)
        assert masked == {
            f: entry["rows"]
            for f, entry in man.get("deletes", {}).items()
        }
    assert masked == {}  # back to fully unmasked
    assert sum(n for e in events for n in e.dv_removed.values()) == 80


def test_restore_reintroducing_masked_files_is_not_mor_deleted(spark, tmp_path):
    """ADVICE r13 #3: a RESTORE can emit dv_added for files the PARENT
    snapshot had dropped (compaction absorbed them; the restore brings
    them back mask-and-all). Those rows were never visible in the
    parent, so read_event_mor_deleted must NOT label them deleted —
    and must not scan files outside the parent snapshot at all."""
    root = _base(spark, tmp_path)
    c = CommitLogConsumer(root)
    c.poll()
    M.delete_where(spark, root, "id < 50", mode="mor", snapshot_id="d1")
    M.compact_snapshot(spark, root, 2, snapshot_id="c1")  # absorbs vectors
    M.restore_snapshot(root, "d1", snapshot_id="r1")  # re-adds masked files
    d1, c1, r1 = c.poll()
    # the restore event really does carry vectors on parent-absent files
    assert r1.dv_added and all(
        f not in set(M._manifest(root, "c1")["files"]) for f in r1.dv_added
    )
    assert read_event_mor_deleted(spark, root, r1).count() == 0
    # the genuine MOR delete still reads its masked rows
    got = sorted(r.id for r in read_event_mor_deleted(spark, root, d1).collect())
    assert got == list(range(50))


def test_row_changes_equal_full_snapshot_diff_per_commit(spark, tmp_path):
    """read_event_row_changes over only the commit's changed files must
    equal the FULL snapshot_diff of parent vs child for every DML verb
    — and a compaction (maximal file churn, zero logical change) must
    emit ZERO rows."""
    from db_loader_spark.operators.cdc import snapshot_diff
    from db_loader_spark.streaming.commit_log import read_event_row_changes

    root = _base(spark, tmp_path)
    c = CommitLogConsumer(root)
    c.poll()
    M.publish(
        spark.range(9_000, 9_010).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a1", stats_cols=["id"],
    )
    M.delete_where(spark, root, "id % 50 = 3", mode="mor", snapshot_id="d1")
    M.merge_upsert(
        spark,
        spark.createDataFrame([(10, -1), (7_777, -2)], "id long, v long"),
        root, "id", snapshot_id="m1",
    )
    M.merge_upsert(
        spark,
        spark.createDataFrame([(20, -4), (8_888, -5)], "id long, v long"),
        root, "id", snapshot_id="m2", mode="mor",
    )
    M.update_where(spark, root, "id between 30 and 35", {"v": "v + 1"},
                   snapshot_id="u1")
    M.compact_snapshot(spark, root, 2, snapshot_id="c1")
    M.restore_snapshot(root, "m2", snapshot_id="r1")
    events = {e.snapshot_id: e for e in c.poll()}
    assert set(events) == {"a1", "d1", "m1", "m2", "u1", "c1", "r1"}

    def norm(df):
        return sorted(tuple(r) for r in df.collect())

    for sid, e in events.items():
        got = read_event_row_changes(spark, root, e, ["id"], ["v"])
        want = snapshot_diff(
            M.read_snapshot(spark, root, e.parent),
            M.read_snapshot(spark, root, sid),
            ["id"], ["v"],
        )
        assert norm(got) == norm(want), sid
    # the spot meanings: compaction is logically silent; the MOR merge
    # shows one update + one insert; the restore undoes c1+u1 exactly
    assert norm(read_event_row_changes(spark, root, events["c1"], ["id"], ["v"])) == []
    m2_ops = {r.change_op for r in read_event_row_changes(
        spark, root, events["m2"], ["id"], ["v"]).collect()}
    assert m2_ops == {"update", "insert"}


def test_position_swap_with_equal_mask_counts_is_visible(spark, tmp_path):
    """Fourth r13 review: a restore sequence can leave a file's mask
    COUNT unchanged while swapping WHICH positions are masked — the
    event must still surface the change (full un-mask + re-mask) and
    row-level CDC must equal the full snapshot diff."""
    from db_loader_spark.operators.cdc import snapshot_diff
    from db_loader_spark.streaming.commit_log import read_event_row_changes

    root = str(tmp_path / "tbl")
    M.publish(
        spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root, snapshot_id="v1", stats_cols=["id"],
    )  # single-partition range: positions 0..9 in one file
    c = CommitLogConsumer(root)
    M.delete_where(spark, root, "id = 2", mode="mor", snapshot_id="dA")
    M.restore_snapshot(root, "v1", snapshot_id="rA")
    M.delete_where(spark, root, "id = 7", mode="mor", snapshot_id="dB")
    c.cursor = "dB"  # consumer positioned just before the swap commit
    M.restore_snapshot(root, "dA", snapshot_id="rB")  # count 1 -> 1, swapped
    (ev,) = c.poll()
    assert ev.snapshot_id == "rB"
    # the swap is visible: one file fully un-masked and re-masked
    assert sum(ev.dv_removed.values()) == 1
    assert sum(ev.dv_added.values()) == 1
    got = sorted(
        tuple(r) for r in read_event_row_changes(
            spark, root, ev, ["id"], ["v"]).collect()
    )
    want = sorted(
        tuple(r) for r in snapshot_diff(
            M.read_snapshot(spark, root, "dB"),
            M.read_snapshot(spark, root, "rB"),
            ["id"], ["v"],
        ).collect()
    )
    assert got == want
    ops = {r[0] for r in got}
    assert ops == {"insert", "delete"}  # 7 resurrects, 2 re-deleted


def test_row_change_feed_checkpointed_exactly_once(spark, tmp_path):
    """VERDICT r13 #2's done-bar: a CHECKPOINTED row-level change feed
    (manifest_cdc ∘ row_changes_for_batch via start_row_change_feed)
    over a multi-verb history — append → MOR delete → MOR merge →
    UPDATE → OPTIMIZE → RESTORE — emits exactly the per-commit
    snapshot_diff rows exactly once (restart-and-drain picks up only
    new commits; a third drain emits nothing), with the compaction
    emitting zero rows."""
    from db_loader_spark.operators.cdc import snapshot_diff
    from db_loader_spark.streaming.commit_log import start_row_change_feed

    root = _base(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    got: dict[str, list] = {}

    def sink(changes, epoch_id):
        for r in changes.collect():
            got.setdefault(r["_commit_snapshot_id"], []).append(
                (r["_change_type"], r["id"], r["old_v"], r["new_v"])
            )

    def drain():
        q = start_row_change_feed(
            spark, root, ["id"], ["v"], ckpt, sink, available_now=True
        )
        q.awaitTermination()

    drain()  # backlog = the genesis publish only
    assert set(got) == {"v1"}
    assert sorted(got["v1"]) == [
        ("insert", i, None, 2 * i) for i in range(500)
    ]

    M.publish(
        spark.range(1_000, 1_010).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a1", stats_cols=["id"],
    )
    M.delete_where(spark, root, "id < 10", mode="mor", snapshot_id="d1")
    M.merge_upsert(
        spark,
        spark.createDataFrame([(20, -1), (5_000, -2)], "id long, v long"),
        root, "id", snapshot_id="m1", mode="mor",
    )
    M.update_where(spark, root, "id between 30 and 34", {"v": "-v"},
                   snapshot_id="u1", mode="mor")
    M.compact_snapshot(spark, root, 2, snapshot_id="c1")
    M.restore_snapshot(root, "u1", snapshot_id="r1")

    drain()  # restart from the checkpoint: only the new commits
    # the compaction and the restore-to-equivalent-state are LOGICAL
    # no-ops: their row diffs are empty, so they never reach the sink
    # (the done-bar's "compaction emits zero")
    assert set(got) == {"v1", "a1", "d1", "m1", "u1"}
    # every commit's rows == the full batch snapshot_diff of its pair
    for sid, parent in [("a1", "v1"), ("d1", "a1"), ("m1", "d1"),
                        ("u1", "m1"), ("c1", "u1"), ("r1", "c1")]:
        want = sorted(
            (r["change_op"], r["id"], r["old_v"], r["new_v"])
            for r in snapshot_diff(
                M.read_snapshot(spark, root, parent),
                M.read_snapshot(spark, root, sid),
                ["id"], ["v"],
            ).collect()
        )
        assert sorted(got.get(sid, [])) == want, sid
    assert sorted(got["d1"]) == [("delete", i, 2 * i, None) for i in range(10)]
    assert ("update", 20, 40, -1) in got["m1"]
    assert ("insert", 5_000, None, -2) in got["m1"]

    before = {k: list(v) for k, v in got.items()}
    drain()  # third drain: nothing new, nothing re-emitted
    assert got == before


def test_read_table_changes_batch_cdf(spark, tmp_path):
    """The batch twin of the feed: read_table_changes over a commit
    range returns exactly the per-commit snapshot_diff rows in commit
    order; start_after/end bound the range; empty range is None; a
    fold by last-change-per-key reproduces the final table."""
    from db_loader_spark.operators.cdc import snapshot_diff
    from db_loader_spark.streaming.commit_log import read_table_changes

    root = _base(spark, tmp_path)
    M.delete_where(spark, root, "id < 100", mode="mor", snapshot_id="d1")
    M.update_where(spark, root, "id between 100 and 104", {"v": "-v"},
                   mode="mor", snapshot_id="u1")

    full = read_table_changes(spark, root, ["id"], ["v"])
    per_commit = {
        sid: sorted(
            (r["_change_type"], r["id"], r["old_v"], r["new_v"])
            for r in full.where(
                F.col("_commit_snapshot_id") == sid
            ).collect()
        )
        for sid in ("v1", "d1", "u1")
    }
    assert per_commit["v1"] == [("insert", i, None, 2 * i) for i in range(500)]
    assert per_commit["d1"] == [("delete", i, 2 * i, None) for i in range(100)]
    assert per_commit["u1"] == sorted(
        (r["change_op"], r["id"], r["old_v"], r["new_v"])
        for r in snapshot_diff(
            M.read_snapshot(spark, root, "d1"),
            M.read_snapshot(spark, root, "u1"),
            ["id"], ["v"],
        ).collect()
    )
    assert full.count() == 605

    # range bounds: (v1, u1] excludes genesis; end=d1 stops early
    ranged = read_table_changes(spark, root, ["id"], ["v"],
                                start_after="v1", end="d1")
    assert {r["_commit_snapshot_id"] for r in ranged.collect()} == {"d1"}
    assert read_table_changes(spark, root, ["id"], ["v"],
                              start_after="u1") is None
    with pytest.raises(ValueError, match="not after"):
        read_table_changes(spark, root, ["id"], ["v"],
                           start_after="d1", end="v1")

    # the CDF fold reproduces the final table
    from pyspark.sql import Window as W
    last = W.partitionBy("id").orderBy(
        F.desc("_seq")
    )
    seq = F.when(F.col("_commit_snapshot_id") == "v1", 0).when(
        F.col("_commit_snapshot_id") == "d1", 1
    ).otherwise(2)
    folded = (
        full.withColumn("_seq", seq)
        .withColumn("_rn", F.row_number().over(last))
        .where("_rn = 1 AND _change_type <> 'delete'")
        .select("id", F.col("new_v").alias("v"))
    )
    want = sorted((r.id, r.v) for r in M.read_current(spark, root).collect())
    assert sorted((r.id, r.v) for r in folded.collect()) == want


def test_row_change_feed_bridges_zero_change_commits(spark, tmp_path):
    """Second r14 review: a commit whose manifest is IDENTICAL to its
    parent's (a repeated RESTORE) emits zero manifest_cdc rows while
    the offset advances past it — the chain reconstruction must bridge
    the gap through parent links instead of wedging the checkpointed
    stream on a contiguity error."""
    from db_loader_spark.streaming.commit_log import start_row_change_feed

    root = _base(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    got: dict[str, list] = {}

    def sink(changes, epoch_id):
        for r in changes.collect():
            got.setdefault(r["_commit_snapshot_id"], []).append(
                (r["_change_type"], r["id"], r["old_v"], r["new_v"])
            )

    def drain():
        q = start_row_change_feed(
            spark, root, ["id"], ["v"], ckpt, sink, available_now=True
        )
        q.awaitTermination()

    drain()  # consume genesis
    M.publish(
        spark.range(9_000, 9_010).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a1", stats_cols=["id"],
    )
    M.restore_snapshot(root, "v1", snapshot_id="r1")  # drops a1's rows
    M.restore_snapshot(root, "v1", snapshot_id="r2")  # ZERO-change commit
    M.merge_upsert(
        spark, spark.createDataFrame([(1, -1)], "id long, v long"),
        root, "id", snapshot_id="m1",
    )
    # batch pairs: a1->v1, r1->a1, m1->r2 — r2 is the invisible gap
    drain()
    assert set(got) == {"v1", "a1", "r1", "m1"}  # r2: zero rows
    assert sorted(got["a1"]) == [
        ("insert", i, None, 2 * i) for i in range(9_000, 9_010)
    ]
    assert sorted(got["r1"]) == [
        ("delete", i, 2 * i, None) for i in range(9_000, 9_010)
    ]
    assert got["m1"] == [("update", 1, 2, -1)]
    before = {k: list(v) for k, v in got.items()}
    drain()  # and the stream is NOT wedged: third drain is clean
    assert got == before


def test_gap_batch_with_vacuumed_history_below_does_not_wedge(spark, tmp_path):
    """Third r14 review: a STALE head candidate's walk legitimately
    descends into already-consumed history, which vacuum may have
    reaped — that must fail the CANDIDATE (the true head still
    resolves the chain), not raise through and wedge the checkpointed
    stream. Scenario: consumed history vacuumed away, then a gap batch
    (zero-change double restore) whose stale candidate sorts first and
    walks straight into the reaped region."""
    from db_loader_spark.streaming.commit_log import start_row_change_feed

    root = _base(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    got: dict[str, list] = {}

    def sink(changes, epoch_id):
        for r in changes.collect():
            got.setdefault(r["_commit_snapshot_id"], []).append(
                (r["_change_type"], r["id"], r["old_v"], r["new_v"])
            )

    def drain():
        q = start_row_change_feed(
            spark, root, ["id"], ["v"], ckpt, sink, available_now=True
        )
        q.awaitTermination()

    M.publish(
        spark.range(9_000, 9_005).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a1", stats_cols=["id"],
    )
    drain()  # consume v1 + a1; cursor = a1
    M.vacuum(root, keep=1)  # reap v1's manifest (consumed history)
    with pytest.raises(FileNotFoundError):
        M._manifest(root, "v1")  # the horizon is real, not hypothetical
    M.publish(
        spark.range(9_100, 9_103).select("id", (F.col("id") * 2).alias("v")),
        root, append=True, snapshot_id="a2", stats_cols=["id"],
    )
    M.restore_snapshot(root, "a1", snapshot_id="r1")  # drops a2's rows
    M.restore_snapshot(root, "a1", snapshot_id="r2")  # ZERO-change gap
    M.merge_upsert(
        spark, spark.createDataFrame([(2, -2)], "id long, v long"),
        root, "id", snapshot_id="m1",
    )
    # batch pairs {a2: a1, r1: a2, m1: r2}; candidates sorted
    # newest-first = [r1, m1]: r1 is STALE and its walk descends
    # a1 -> v1 (reaped). Must fail over to m1, not raise.
    drain()
    assert {"a2", "r1", "m1"} <= set(got) and "r2" not in got
    assert sorted(got["a2"]) == [
        ("insert", i, None, 2 * i) for i in range(9_100, 9_103)
    ]
    assert sorted(got["r1"]) == [
        ("delete", i, 2 * i, None) for i in range(9_100, 9_103)
    ]
    assert got["m1"] == [("update", 2, 4, -2)]


def test_apply_table_changes_syncs_a_replica(spark, tmp_path):
    """The full CDC circle: source table → read_table_changes →
    apply_table_changes → replica, each hop priced by the change set.
    The replica must equal the source after every sync round, a
    replayed apply must be a no-op (token idempotence), and a key
    changed MULTIPLE times inside one range must fold to its last
    state."""
    from db_loader_spark.streaming.commit_log import (
        apply_table_changes,
        read_table_changes,
    )

    src = _base(spark, tmp_path, name="src")
    replica = str(tmp_path / "replica")
    # bootstrap the replica from the source genesis snapshot
    M.publish(
        M.read_snapshot(spark, src, "v1"), replica,
        snapshot_id="boot-v1", stats_cols=["id"],
    )

    def synced():
        a = sorted((r.id, r.v) for r in M.read_current(spark, src).collect())
        b = sorted(
            (r.id, r.v) for r in M.read_current(spark, replica).collect()
        )
        return a == b

    # round 1: multi-verb history with a multi-change key (id 7:
    # updated by u1 then deleted by d1; id 3 deleted then re-merged)
    M.update_where(spark, src, "id in (7, 8)", {"v": "v + 1"},
                   mode="mor", snapshot_id="u1")
    M.delete_where(spark, src, "id in (3, 7)", mode="mor", snapshot_id="d1")
    M.merge_upsert(
        spark, spark.createDataFrame([(3, -3), (9_000, 1)], "id long, v long"),
        src, "id", snapshot_id="m1", mode="mor",
    )
    cdf = read_table_changes(spark, src, ["id"], ["v"], start_after="v1")
    out = apply_table_changes(spark, cdf, replica, "id", ["v"],
                              snapshot_id="sync-m1")
    assert out == "sync-m1" and synced()
    # replay of the same applied range: manifest-token no-op
    apply_table_changes(spark, cdf, replica, "id", ["v"],
                        snapshot_id="sync-m1")
    assert M.snapshots(replica) == ["boot-v1", "sync-m1"] and synced()

    # round 2: incremental — only the new commits travel
    M.delete_where(spark, src, "id < 5", mode="cow", snapshot_id="d2")
    M.update_where(spark, src, "id = 9000", {"v": "42"}, snapshot_id="u2")
    cdf2 = read_table_changes(spark, src, ["id"], ["v"], start_after="m1")
    apply_table_changes(spark, cdf2, replica, "id", ["v"],
                        snapshot_id="sync-u2")
    assert synced()
    assert M.snapshots(replica) == ["boot-v1", "sync-m1", "sync-u2"]

    # empty range: None in, no-op out
    assert read_table_changes(spark, src, ["id"], ["v"],
                              start_after="u2") is None
    assert apply_table_changes(spark, None, replica, "id", ["v"]) is None


def test_apply_table_changes_return_contract(spark, tmp_path):
    """Fourth r14 review: a range that nets to zero on the replica
    must return None — never the replica's previous head, which a
    caller would book as this range's commit."""
    from db_loader_spark.streaming.commit_log import (
        apply_table_changes,
        read_table_changes,
    )

    src = _base(spark, tmp_path, name="src")
    replica = str(tmp_path / "replica")
    M.publish(M.read_snapshot(spark, src, "v1"), replica,
              snapshot_id="boot", stats_cols=["id"])
    # source change: a compaction only — zero row changes
    M.compact_snapshot(spark, src, 2, snapshot_id="c1")
    cdf = read_table_changes(spark, src, ["id"], ["v"], start_after="v1")
    assert cdf is not None and cdf.count() == 0
    assert apply_table_changes(spark, cdf, replica, "id", ["v"],
                               snapshot_id="sync-c1") is None
    assert M.snapshots(replica) == ["boot"]  # nothing minted
    # a real change returns its token; the replay returns it again
    M.delete_where(spark, src, "id < 3", mode="mor", snapshot_id="d1")
    cdf2 = read_table_changes(spark, src, ["id"], ["v"], start_after="c1")
    assert apply_table_changes(spark, cdf2, replica, "id", ["v"],
                               snapshot_id="sync-d1") == "sync-d1"
    assert apply_table_changes(spark, cdf2, replica, "id", ["v"],
                               snapshot_id="sync-d1") == "sync-d1"
    assert M.snapshots(replica) == ["boot", "sync-d1"]


def test_merge_apply_return_status_flags_minted_commits(spark, tmp_path):
    """ADVICE r14 #1: merge_apply's return_status=(sid, committed)
    states explicitly whether THIS call minted a snapshot — the
    signal apply_table_changes' untokened path needs instead of
    inferring from a head read before the call (which races a
    concurrent writer committing between the read and a net-zero
    apply, booking the OTHER writer's head as this range's commit)."""
    root = _base(spark, tmp_path)
    # a real change mints: committed=True
    batch = spark.createDataFrame([(1, -1, False)],
                                  "id long, v long, _delete boolean")
    out, committed = M.merge_apply(spark, batch, root, "id",
                                   snapshot_id="x1", return_status=True)
    assert (out, committed) == ("x1", True)
    # tokened replay: the commit exists but is not minted NOW
    out, committed = M.merge_apply(spark, batch, root, "id",
                                   snapshot_id="x1", return_status=True)
    assert (out, committed) == ("x1", False)
    # empty batch: parent id back, nothing minted
    empty = batch.where("id < 0")
    out, committed = M.merge_apply(spark, empty, root, "id",
                                   return_status=True)
    assert (out, committed) == ("x1", False)
    # net-zero batch (absent-key deletes only): nothing minted
    ghosts = spark.createDataFrame([(777_777, 0, True)],
                                   "id long, v long, _delete boolean")
    out, committed = M.merge_apply(spark, ghosts, root, "id",
                                   return_status=True)
    assert (out, committed) == ("x1", False)
    assert M.snapshots(root) == ["v1", "x1"]


def test_apply_untokened_net_zero_is_none_despite_foreign_head(spark, tmp_path):
    """ADVICE r14 #1, the caller side: the UNTOKENED apply of a
    net-zero range returns None even when the replica's head is not
    what it was when the range was read — the verdict comes from
    merge_apply's committed flag, never from head comparison, so a
    foreign commit landing at ANY point around the apply can no
    longer be handed back as this range's commit id."""
    from db_loader_spark.streaming.commit_log import (
        apply_table_changes,
        read_table_changes,
    )

    src = _base(spark, tmp_path, name="src")
    replica = str(tmp_path / "replica")
    M.publish(M.read_snapshot(spark, src, "v1"), replica,
              snapshot_id="boot", stats_cols=["id"])
    M.compact_snapshot(spark, src, 2, snapshot_id="c1")  # zero row change
    cdf = read_table_changes(spark, src, ["id"], ["v"], start_after="v1")
    # a FOREIGN writer commits to the replica after the range is read
    M.merge_upsert(
        spark, spark.createDataFrame([(0, 99)], "id long, v long"),
        replica, "id", snapshot_id="foreign-1", mode="mor",
    )
    assert apply_table_changes(spark, cdf, replica, "id", ["v"]) is None
    assert M.snapshots(replica) == ["boot", "foreign-1"]
    # and a real untokened apply returns the commit it actually minted
    M.delete_where(spark, src, "id = 5", mode="mor", snapshot_id="d1")
    cdf2 = read_table_changes(spark, src, ["id"], ["v"], start_after="c1")
    minted = apply_table_changes(spark, cdf2, replica, "id", ["v"])
    assert minted is not None and M.snapshots(replica)[-1] == minted


def test_gap_run_exceeding_walk_bound_is_actionable(spark, tmp_path):
    """ADVICE r14 #2: a run of zero-change gap commits longer than the
    walk bound cuts every head candidate's walk short of the chain —
    that must surface as a typed, actionable bootstrap error naming
    the WALK BOUND, not RuntimeError('corrupted batch') on an intact
    lineage."""
    from db_loader_spark.streaming.commit_log import row_changes_for_batch

    root = _base(spark, tmp_path)
    M.merge_upsert(
        spark, spark.createDataFrame([(1, -1)], "id long, v long"),
        root, "id", snapshot_id="m1", mode="mor",
    )
    # g000 restores m1-state back to v1-state (a REAL, batch-visible
    # change); g001..g089 restore to v1 AGAIN — 89 consecutive
    # zero-change commits, each minted because the current SID moved
    # even though the state did not (restore-to-current-sid would
    # no-op). hop_cap for a 2-commit batch is 10*2+64 = 84, so the
    # walk from m2 down to g000 (90 hops) out-runs every candidate.
    for i in range(90):
        M.restore_snapshot(root, "v1", snapshot_id=f"g{i:03d}")
    M.merge_upsert(
        spark, spark.createDataFrame([(2, -2)], "id long, v long"),
        root, "id", snapshot_id="m2", mode="mor",
    )
    batch = spark.createDataFrame(
        [("g000", "m1"), ("m2", "g089")], "snapshot_id string, parent string"
    )
    with pytest.raises(CommitLogTruncated, match="walk bound"):
        row_changes_for_batch(spark, root, batch, ["id"], ["v"])


def test_cdf_union_plan_depth_is_logarithmic(spark, tmp_path):
    """ADVICE r14 #3: read_table_changes unions one diff sub-plan per
    commit — as a balanced pairwise tree, so a long-range batch replay
    grows the ANALYZED plan's depth by O(log n), not O(n). Pinned as a
    depth delta: 16 extra commits may add at most ~log2-many levels
    over a single-commit read (a left-deep chain would add 16)."""
    from db_loader_spark.streaming.commit_log import read_table_changes

    root = _base(spark, tmp_path)
    for i in range(16):
        M.publish(
            spark.range(10_000 + 10 * i, 10_010 + 10 * i)
            .select("id", (F.col("id") * 2).alias("v")),
            root, append=True, snapshot_id=f"a{i:02d}", stats_cols=["id"],
        )

    def depth(df) -> int:
        def d(jp):
            ch = jp.children()
            return 1 + max(
                (d(ch.apply(i)) for i in range(ch.size())), default=0
            )
        return d(df._jdf.queryExecution().analyzed())

    one = read_table_changes(spark, root, ["id"], ["v"],
                             start_after="a14", end="a15")
    many = read_table_changes(spark, root, ["id"], ["v"],
                              start_after="v1", end="a15")
    assert depth(many) - depth(one) <= 8  # left-deep would be >= 15
    # and the union is still value-correct across the whole range
    assert many.where("_change_type <> 'insert'").count() == 0
    assert many.count() == 160
    seqs = {
        r["_commit_snapshot_id"]: r["_commit_seq"]
        for r in many.select("_commit_snapshot_id", "_commit_seq")
        .distinct().collect()
    }
    assert seqs == {f"a{i:02d}": i for i in range(16)}


def test_change_feed_across_schema_evolution(spark, tmp_path):
    """VERDICT r14 #3: a read_table_changes range spanning a
    merge_schema=True append whose new column is in compare_cols must
    surface NULL for pre-evolution commits (Delta-CDF semantics), not
    raise — for the evolution commit itself AND for commits entirely
    before it, on both the batch surface and the checkpointed feed."""
    from db_loader_spark.streaming.commit_log import (
        read_table_changes,
        start_row_change_feed,
    )

    root = _base(spark, tmp_path)
    M.delete_where(spark, root, "id >= 10", mode="mor", snapshot_id="d0")
    M.publish(
        spark.range(9_100, 9_103).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("w")
        ),
        root, append=True, snapshot_id="e1", merge_schema=True,
        stats_cols=["id"],
    )
    M.update_where(spark, root, "id = 3", {"w": "'y'"},
                   mode="mor", snapshot_id="u1")
    M.delete_where(spark, root, "id = 1", mode="mor", snapshot_id="d1")

    cdf = read_table_changes(spark, root, ["id"], ["v", "w"])
    rows = {
        (r["_commit_snapshot_id"], r["_change_type"], r["id"]):
            (r["old_v"], r["old_w"], r["new_v"], r["new_w"])
        for r in cdf.collect()
    }
    # pre-evolution commits: w is NULL on both sides
    assert rows[("v1", "insert", 3)] == (None, None, 6, None)
    assert rows[("d0", "delete", 10)] == (20, None, None, None)
    # the evolution commit's inserts carry the new column
    assert rows[("e1", "insert", 9_100)] == (None, None, 18_200, "x")
    # an update ON the new column for a pre-evolution row
    assert rows[("u1", "update", 3)] == (6, None, 6, "y")
    assert rows[("d1", "delete", 1)] == (2, None, None, None)

    # the checkpointed FEED crosses the evolution identically
    got: dict[tuple, tuple] = {}

    def sink(changes, epoch_id):
        for r in changes.collect():
            got[(r["_commit_snapshot_id"], r["_change_type"], r["id"])] = (
                r["old_v"], r["old_w"], r["new_v"], r["new_w"]
            )

    q = start_row_change_feed(
        spark, root, ["id"], ["v", "w"], str(tmp_path / "ckpt"), sink,
        available_now=True,
    )
    q.awaitTermination()
    assert got[("u1", "update", 3)] == (6, None, 6, "y")
    assert got[("v1", "insert", 3)] == (None, None, 6, None)
    assert got[("e1", "insert", 9_102)] == (None, None, 18_204, "x")

    # a CHUNKED replay (the long-history recipe) crosses the
    # evolution too: a chunk wholly BEFORE the evolution types the
    # backfill from the table's CURRENT schema (the Delta convention,
    # review r15 pass 2) — NULL columns, never a raise — and its rows
    # equal the whole-range read restricted to those commits
    chunk = read_table_changes(spark, root, ["id"], ["v", "w"],
                               start_after="v1", end="d0")
    chunk_rows = {
        (r["_commit_snapshot_id"], r["_change_type"], r["id"]):
            (r["old_v"], r["old_w"], r["new_v"], r["new_w"])
        for r in chunk.collect()
    }
    assert chunk_rows == {
        k: v for k, v in rows.items() if k[0] == "d0"
    }
    # a column in NO schema (not current, not range) still raises
    with pytest.raises(Exception, match="nope"):
        read_table_changes(spark, root, ["id"], ["v", "nope"]).collect()


def test_evolve_schema_metadata_commit(spark, tmp_path):
    """evolve_schema: ALTER TABLE ADD COLUMNS as a metadata-only
    commit — old rows read the new column as NULL, zero data files
    written; idempotent on already-present columns and on its token;
    type conflicts and legacy lineages are loud errors."""
    from pyspark.sql.types import LongType, StringType, StructField

    root = _base(spark, tmp_path)
    out = M.evolve_schema(root, [StructField("w", StringType())],
                          snapshot_id="ev1")
    assert out == "ev1" and M.snapshots(root) == ["v1", "ev1"]
    man = M._manifest(root, "ev1")
    pm = M._manifest(root, "v1")
    assert man["files"] == pm["files"]  # zero data movement
    df = M.read_current(spark, root)
    assert df.columns == ["id", "v", "w"]
    assert df.where("w IS NOT NULL").count() == 0
    # and the evolved column is writable by later DML
    M.update_where(spark, root, "id = 2", {"w": "'set'"},
                   mode="mor", snapshot_id="u1")
    got = {(r.id, r.w) for r in M.read_current(spark, root)
           .where("w IS NOT NULL").collect()}
    assert got == {(2, "set")}
    # idempotence: already-present column is a no-op (current sid back)
    assert M.evolve_schema(root, [StructField("w", StringType())]) == "u1"
    assert M.snapshots(root) == ["v1", "ev1", "u1"]
    # replayed token: no second commit
    assert M.evolve_schema(root, [StructField("z", LongType())],
                           snapshot_id="ev2") == "ev2"
    assert M.evolve_schema(root, [StructField("z", LongType())],
                           snapshot_id="ev2") == "ev2"
    assert M.snapshots(root).count("ev2") == 1
    # type conflict: loud error, never a cast
    with pytest.raises(ValueError, match="conflict"):
        M.evolve_schema(root, [StructField("v", StringType())])
    # legacy lineage (no recorded schema): refused with guidance
    legacy = str(tmp_path / "legacy")
    M.publish(spark.range(3).select("id"), legacy, snapshot_id="l1",
              _record_schema=False)
    with pytest.raises(ValueError, match="merge_schema"):
        M.evolve_schema(legacy, [StructField("w", StringType())])


def test_apply_table_changes_follows_source_evolution(spark, tmp_path):
    """VERDICT r14 #3, apply side: merge_schema=True lets the replica
    follow the source's evolution (metadata-only widen, then the
    fold); the default stays the strict contract and fails loudly."""
    from db_loader_spark.streaming.commit_log import (
        apply_table_changes,
        read_table_changes,
    )

    src = _base(spark, tmp_path, name="src")
    rep = str(tmp_path / "rep")
    M.publish(M.read_snapshot(spark, src, "v1"), rep,
              snapshot_id="boot", stats_cols=["id"])
    M.publish(
        spark.range(9_100, 9_103).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("w")
        ),
        src, append=True, snapshot_id="e1", merge_schema=True,
        stats_cols=["id"],
    )
    M.update_where(spark, src, "id = 3", {"w": "'y'"},
                   mode="mor", snapshot_id="u1")
    M.delete_where(spark, src, "id = 1", mode="mor", snapshot_id="d1")
    cdf = read_table_changes(spark, src, ["id"], ["v", "w"],
                             start_after="v1")
    # strict default: evolved range against an unevolved replica fails
    with pytest.raises(ValueError):
        apply_table_changes(spark, cdf, rep, "id", ["v", "w"],
                            snapshot_id="strict")
    out = apply_table_changes(spark, cdf, rep, "id", ["v", "w"],
                              snapshot_id="sync-d1", merge_schema=True)
    assert out == "sync-d1"
    assert M.snapshots(rep) == ["boot", "evolve-sync-d1", "sync-d1"]

    def state(root):
        return sorted(
            (r.id, r.v, r.w or "") for r in M.read_current(spark, root).collect()
        )

    assert state(rep) == state(src)
    # replay: both the evolution and the apply are token no-ops
    assert apply_table_changes(spark, cdf, rep, "id", ["v", "w"],
                               snapshot_id="sync-d1",
                               merge_schema=True) == "sync-d1"
    assert M.snapshots(rep) == ["boot", "evolve-sync-d1", "sync-d1"]


def test_evolve_schema_concurrency_semantics(spark, tmp_path):
    """evolve_schema under concurrency: (1) racing APPENDS all land —
    an append of a SUBSET of the evolved schema is always legal, so
    neither order loses — and the final table carries the new column
    with NULL for every pre-evolution row; (2) two concurrent
    evolutions of DIFFERENT columns both land (the loser re-merges on
    the fresh parent); (3) a strict-schema MERGE against an evolved
    table fails LOUDLY with the schema contract error (the Delta
    MetadataChangedException analog) — never a silent cast."""
    import threading

    from pyspark.sql.types import LongType, StringType, StructField

    root = _base(spark, tmp_path)
    errors = []

    def run(fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 - collected for assert
            errors.append(repr(e))

    threads = [
        threading.Thread(target=run, args=(lambda: M.publish(
            spark.range(9_000, 9_005).select(
                "id", (F.col("id") * 2).alias("v")
            ),
            root, append=True, snapshot_id="a1", stats_cols=["id"],
        ),)),
        threading.Thread(target=run, args=(lambda: M.evolve_schema(
            root, [StructField("w", StringType())], snapshot_id="ev-w",
        ),)),
        threading.Thread(target=run, args=(lambda: M.evolve_schema(
            root, [StructField("z", LongType())], snapshot_id="ev-z",
        ),)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    chain = M.snapshots(root)
    assert sorted(chain[1:]) == ["a1", "ev-w", "ev-z"]
    df = M.read_current(spark, root)
    assert set(df.columns) == {"id", "v", "w", "z"}
    assert df.count() == 505
    assert df.where("w IS NOT NULL OR z IS NOT NULL").count() == 0
    # (3) strict-schema writers fail loudly against the evolved table
    with pytest.raises(ValueError, match="schema"):
        M.merge_upsert(
            spark, spark.createDataFrame([(1, -1)], "id long, v long"),
            root, "id", snapshot_id="m1",
        )
    # the evolved-width batch is the remedy, and it lands
    M.merge_upsert(
        spark,
        spark.createDataFrame([(1, -1, "x", 9)],
                              "id long, v long, w string, z long"),
        root, "id", snapshot_id="m2", mode="mor",
    )
    assert [(r.w, r.z) for r in
            M.read_current(spark, root).where("id = 1").collect()] == [
        ("x", 9)
    ]
