"""Model-based randomized DML sequences (r14): every manifest verb —
append, COW/MOR delete, COW/MOR update, COW/MOR merge, delete-flagged
merge_apply, REORG PURGE, OPTIMIZE, RESTORE — interleaved by a seeded
RNG against a plain
Python dict model applying the same logic. After EVERY commit the
logical table must equal the model; at the end, the row-level
changelog (read_table_changes) folded by last-change-per-key must
reproduce it too. The storm test pins concurrency; this pins the
VERB ALGEBRA — any composition bug the hand-written pairwise tests
missed (a vector lost through a particular verb order, a restore
landing on a purged lineage, an update reading through a stale mask)
diverges the model within one step of the op that caused it."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from db_loader_spark.sinks import manifest as M


def _read(spark, root):
    return sorted(
        (r.id, r.v) for r in M.read_current(spark, root).collect()
    )


def _apply_random_op(spark, root, rng, model, snapshots, next_id, sid):
    """Pick one verb, apply it to BOTH the table and the model.
    Returns the new next_id. ``snapshots`` maps committed sid → model
    state for restore targets."""
    verb = rng.choice(
        ["append", "delete", "delete", "update", "update",
         "merge", "merge", "apply", "purge", "compact", "restore"]
    )
    if verb == "append":
        n = rng.randint(3, 20)
        rows = [(next_id + i, rng.randint(-50, 50)) for i in range(n)]
        M.publish(
            spark.createDataFrame(rows, "id long, v long"),
            root, append=True, snapshot_id=sid, stats_cols=["id"],
        )
        model.update(dict(rows))
        return next_id + n
    if verb == "delete":
        mode = rng.choice(["cow", "mor"])
        p, r = rng.randint(3, 9), rng.randint(0, 2)
        M.delete_where(
            spark, root, f"id % {p} = {r}", mode=mode, snapshot_id=sid
        )
        for k in [k for k in model if k % p == r]:
            del model[k]
        return next_id
    if verb == "update":
        mode = rng.choice(["cow", "mor"])
        p, r, c = rng.randint(3, 9), rng.randint(0, 2), rng.randint(1, 100)
        M.update_where(
            spark, root, f"id % {p} = {r}", {"v": f"v + {c}"},
            mode=mode, snapshot_id=sid,
        )
        for k in model:
            if k % p == r:
                model[k] += c
        return next_id
    if verb == "merge":
        mode = rng.choice(["cow", "mor"])
        hits = rng.sample(sorted(model), min(len(model), rng.randint(1, 8)))
        n_ins = rng.randint(1, 5)
        batch = [(k, rng.randint(-50, 50)) for k in hits] + [
            (next_id + i, rng.randint(-50, 50)) for i in range(n_ins)
        ]
        M.merge_upsert(
            spark, spark.createDataFrame(batch, "id long, v long"),
            root, "id", snapshot_id=sid, mode=mode,
        )
        model.update(dict(batch))
        return next_id + n_ins
    if verb == "apply":
        hits = rng.sample(sorted(model), min(len(model), rng.randint(0, 6)))
        dels, ups = hits[: len(hits) // 2], hits[len(hits) // 2:]
        n_ins = rng.randint(0, 3)
        rows = (
            [(k, rng.randint(-50, 50), False) for k in ups]
            + [(next_id + i, rng.randint(-50, 50), False)
               for i in range(n_ins)]
            + [(k, 0, True) for k in dels]
        )
        M.merge_apply(
            spark,
            spark.createDataFrame(rows, "id long, v long, _delete boolean"),
            root, "id", snapshot_id=sid,
        )
        for k, v, is_del in rows:
            if is_del:
                model.pop(k, None)
            else:
                model[k] = v
        return next_id + n_ins
    if verb == "purge":
        # threshold 0 purges every masked file; a clean table no-ops
        # (returns the parent, no commit — the caller's
        # current_snapshot check then skips recording sid)
        M.purge_deletes(spark, root, snapshot_id=sid)
        return next_id
    if verb == "compact":
        M.compact_snapshot(spark, root, rng.randint(1, 4), snapshot_id=sid)
        return next_id
    # restore: to any committed snapshot (linear-forward commit)
    target = rng.choice(sorted(snapshots))
    M.restore_snapshot(root, target, snapshot_id=sid)
    model.clear()
    model.update(snapshots[target])
    return next_id


@pytest.mark.parametrize("seed", [7, 23])
def test_random_dml_sequence_tracks_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"tbl{seed}")
    base = [(i, rng.randint(-50, 50)) for i in range(300)]
    M.publish(
        spark.createDataFrame(base, "id long, v long")
        .repartitionByRange(3, "id"),
        root, snapshot_id="s0", stats_cols=["id"],
    )
    model = dict(base)
    snapshots = {"s0": dict(model)}
    next_id = 10_000
    for step in range(14):
        sid = f"s{step + 1}"
        next_id = _apply_random_op(
            spark, root, rng, model, snapshots, next_id, sid
        )
        if M.current_snapshot(root) == sid:  # no-op verbs keep parent
            snapshots[sid] = dict(model)
        got = _read(spark, root)
        assert got == sorted(model.items()), f"seed {seed} diverged at {sid}"

    # the changelog agrees end-to-end: fold every commit's row changes
    from pyspark.sql import Window as W

    from db_loader_spark.streaming.commit_log import read_table_changes

    full = read_table_changes(spark, root, ["id"], ["v"])
    omap = spark.createDataFrame(
        [(s, i) for i, s in enumerate(M.snapshots(root))],
        "_commit_snapshot_id string, _seq int",
    )
    folded = (
        full.join(F.broadcast(omap), "_commit_snapshot_id")
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.desc("_seq"))
            ),
        )
        .where("_rn = 1 AND _change_type <> 'delete'")
        .select("id", F.col("new_v").alias("v"))
    )
    assert sorted((r.id, r.v) for r in folded.collect()) == sorted(
        model.items()
    )
