"""Manifest-committed table layout: snapshot-atomic publish over any
filesystem, including object stores where directory rename is not
atomic.

The rename-based swaps elsewhere in this package (``ddl.
compact_partitions_if_needed``, the epoch-overwrite streaming sinks)
are atomic on POSIX/HDFS but explicitly NOT on S3-class stores, whose
"rename" is copy+delete with visible intermediate states. The industry
answer (Iceberg/Delta/Hudi, in miniature here) is to never let readers
list directories at all: data files are immutable and write-once under
``data/``, a MANIFEST file enumerates exactly which files constitute a
snapshot, and publishing a new snapshot is ONE small-object write plus
ONE pointer update. Readers resolve pointer → manifest → file list, so
they see a complete old snapshot or a complete new one — never a mix,
regardless of how non-atomic the underlying store's directory
operations are. Old snapshots stay readable (time travel) until
vacuumed.

Mapped onto the reference's transactional-load semantics: ``publish``
is K6's staging+atomic-publish and T5's transactional flush;
``vacuum`` is K8's clean; snapshot ids are the retry token (a replayed
publish of a fully committed writer epoch is a pure no-op; one that
crashed pre-commit restages invisibly and re-points — idempotent
either way). file:line parity: the reference's
closest analog is the CSV flush-then-load loop in
scripts/load_csv_to_cloud.sh:107-149.

Commit protocol details that carry the correctness weight:
- Data files are written under ``data/`` with a snapshot-unique
  prefix, so a crashed writer leaves only unreferenced files —
  invisible to every reader, reclaimed by ``vacuum``.
- The manifest (one JSON object per snapshot) is written COMPLETE
  before the pointer moves; a crash between the two leaves the old
  pointer valid.
- The pointer (``_CURRENT``) is a single small file updated via
  write-temp + ``os.replace`` — atomic on POSIX; on an object store
  it maps to a single-key conditional PUT (the one primitive such
  stores do provide). It contains only the snapshot id.
- Readers never list ``data/``: ``read_current`` loads the manifest's
  explicit file list, so partial uploads and stale files cannot leak
  into a scan.
- CONCURRENCY CONTRACT: single writer per table root. The protocol is
  lock-free (no O_EXCL serialization of pointer flips), so two
  writers racing commits against one root have read-then-flip windows
  — in the normal path and, narrowed but not eliminated, in the
  torn-commit recovery re-check — in which one writer's freshly
  committed child can be orphaned from the current lineage (its
  manifest and files persist; it is not torn, just not current).
  Every caller in this package honors the contract (each stream owns
  its per-checkpoint root; batch publishes are sequential). A
  multi-writer deployment must add a commit lock or CAS pointer (the
  conditional-PUT primitive object stores provide) rather than rely
  on the re-checks.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_DATA = "data"
_MANIFESTS = "_manifests"
_CURRENT = "_CURRENT"


def _paths(root: str) -> tuple[str, str, str]:
    return (
        os.path.join(root, _DATA),
        os.path.join(root, _MANIFESTS),
        os.path.join(root, _CURRENT),
    )


def _file_stats(path: str, cols: list[str]) -> dict:
    """Per-file zone-map entry from the parquet FOOTER (no data read):
    row count + min/max per requested column, aggregated across row
    groups. Values come back as plain JSON-able Python scalars."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}

    def jsonable(v):
        # pyarrow surfaces BYTE_ARRAY (string/binary) stats as bytes in
        # some versions; decode or drop — a stat that can't serialize
        # must not kill the commit (absent stats only cost pruning)
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        if isinstance(v, (int, float, str, bool)):
            return v
        return None

    stats: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[c]).statistics
            if s is None or not s.has_min_max:
                lo = hi = None
                break  # any stats-less group poisons the file's entry
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        lo, hi = jsonable(lo), jsonable(hi)
        if lo is not None and hi is not None:
            stats[c] = [lo, hi]
    return {"rows": md.num_rows, "stats": stats}


def publish(
    df: DataFrame,
    root: str,
    snapshot_id: str | None = None,
    parent_check: bool = True,
    stats_cols: list[str] | None = None,
    append: bool = False,
    _inherit_files: list[str] | None = None,
    _inherit_meta: dict | None = None,
) -> str:
    """Write ``df`` as a new snapshot of the table at ``root`` and
    atomically make it current. Returns the snapshot id.

    ``snapshot_id`` doubles as the idempotent retry token (the
    at-least-once foreachBatch contract): a replay of a snapshot that
    fully committed is a pure no-op — restaging would transiently
    delete live files out from under concurrent readers — while a
    replay after a pre-commit crash overwrites its own (unreferenced,
    reader-invisible) staged files and re-points. With ``parent_check`` (default), the manifest records the
    snapshot it superseded; a concurrent publish that lost the race
    fails loudly instead of silently clobbering (single-writer
    optimistic concurrency — multi-writer needs the store's
    conditional-PUT on the pointer, same as every table format).

    ``stats_cols`` adds per-file ZONE MAPS to the manifest (rows +
    min/max per column, harvested from the parquet footers already
    written — no second data pass): the Delta/Iceberg data-skipping
    design in miniature. ``read_pruned`` then drops whole files from
    the scan before Spark ever lists them — at 100 TB the win over
    row-group skipping is METADATA-scale: files that can't match never
    become tasks, never have their footers fetched. The footer walk
    here is a driver-side loop over the snapshot's own staged files
    (bounded by files-per-snapshot); a cluster writer records the same
    stats executor-side at write time, as Delta's add-file actions do.

    ``append=True`` makes this an APPEND commit: the new manifest lists
    the parent's files PLUS the newly staged ones (data files stay
    immutable — appending writes only the delta, exactly Delta's
    add-only commit). ``added_files``/``read_added`` then give the
    incremental scan between two snapshots — downstream stages process
    the delta files only, never rescanning the corpus (the Iceberg
    incremental-scan design operators/cdc.py argues from)."""
    data_dir, man_dir, cur = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    observed = current_snapshot(root)
    if observed == sid:
        # Idempotent replay of the CURRENT snapshot (same epoch token):
        # the pointer move is the LAST step of the protocol, so the
        # pointer reading ``sid`` proves the staged files and manifest
        # are complete. Restaging here would delete the very directory
        # the live manifest's file list points to — a concurrent reader
        # resolving the pointer mid-restage would hit missing files,
        # violating the "complete old snapshot or complete new one"
        # contract. The correct idempotent behavior is a pure no-op
        # (same-token replays carry the same batch by the foreachBatch
        # epoch contract). A crash BEFORE the pointer moved leaves
        # observed != sid and takes the normal path, where overwriting
        # the staged prefix is safe: no reader can reference it yet.
        return sid
    if os.path.exists(os.path.join(man_dir, f"{sid}.json")):
        # A manifest for this token exists but the pointer is elsewhere:
        # either the token committed earlier and was since SUPERSEDED
        # (e.g. foreachBatch restarted with a fresh checkpoint against
        # an existing table root), or a crash hit the one-instruction
        # window between manifest write and pointer flip. In the
        # superseded case the LIVE lineage inherits data/<sid> files by
        # reference — restaging would delete files concurrent readers
        # resolve (torn reads) and an append would list data/<sid>
        # twice (inherited from parent + new_files), double-counting
        # rows. The two cases ARE locally distinguishable (r9, ADVICE
        # r8): the on-disk manifest records the snapshot it superseded,
        # and no operation ever moves the pointer BACKWARD (every
        # publish/merge/compact commits a child of the observed
        # current; vacuum keeps manifests), so
        #   manifest.parent == observed  ⇔  the pointer never flipped —
        # the crash case. Manifest and staged data are complete (the
        # manifest is written AFTER its data files, both atomically),
        # so the correct recovery is to FINISH the commit: flip the
        # pointer and return. Treating this as unretryable made a
        # persistent-checkpoint stream permanently wedged — foreachBatch
        # derives sid from the epoch id and cannot mint a fresh token,
        # so the restart re-raised forever until manual cleanup.
        # Any other parent means the token committed earlier and was
        # since superseded — replaying it would tear the live lineage,
        # so the caller must retry with a FRESH token on the new
        # current. (If a rollback/restore op is ever added, it must
        # tombstone rolled-back manifests so this test stays sound.)
        if _manifest(root, sid).get("parent") == observed:
            # Same re-read the normal path does before ITS flip (r9
            # review): between reading `observed` and deciding to
            # recover, a concurrent writer may have committed a child
            # of `observed` and moved the pointer — blind-flipping to
            # sid would silently orphan that snapshot from the current
            # lineage. Two benign outcomes of the re-read: the pointer
            # is unmoved (finish the commit), or a CONCURRENT REPLAY OF
            # THIS SAME TOKEN finished the flip first (current == sid —
            # the commit is done; raising would spuriously crash an
            # at-least-once restart that cannot mint a fresh token).
            # Anything else means a different child committed: fall
            # through to the unretryable error.
            rechecked = current_snapshot(root)
            if rechecked == sid:
                return sid  # a same-token replay completed the commit
            if rechecked == observed:
                # RESIDUAL WINDOW (ADVICE r9, acknowledged): between
                # this re-check and the os.replace below, a concurrent
                # writer could still commit a child of `observed` and
                # be orphaned by our flip. The window is NARROWED by
                # the re-check (one instruction gap vs the whole
                # recovery path), not eliminated — identical in kind
                # to the normal path's read-then-flip gap, which is
                # inherent to this lock-free file protocol. True
                # mutual exclusion would need an O_EXCL lock file
                # serializing all flips; no current caller runs
                # concurrent writers against one table root (streams
                # own their roots per-checkpoint), so the honest
                # contract is single-writer-per-root, stated in the
                # module docstring.
                with open(cur + ".tmp", "w") as fh:
                    fh.write(sid)
                os.replace(cur + ".tmp", cur)  # finish the torn commit
                return sid
        raise RuntimeError(
            f"snapshot token {sid!r} already has a committed manifest at "
            f"{root!r} but is not the current snapshot "
            f"({observed!r}); replaying a superseded token would tear "
            f"the live lineage — retry with a fresh snapshot_id"
        )
    parent = observed
    staged = os.path.join(data_dir, sid)
    # stage: snapshot-unique prefix; overwrite = idempotent retry
    df.write.mode("overwrite").parquet(staged)
    files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    new_files = [os.path.join(_DATA, sid, f) for f in files]
    # carried-by-reference files: append inherits the whole parent;
    # merge_upsert passes the untouched subset explicitly
    inherited = list(_inherit_files or [])
    inherited_meta = dict(_inherit_meta or {})
    if append and parent is not None:
        pm = _manifest(root, parent)
        inherited = pm["files"] + inherited
        inherited_meta = {**pm.get("files_meta", {}), **inherited_meta}
    manifest = {
        "snapshot_id": sid,
        "parent": parent,
        "files": inherited + new_files,
        "row_count": None,  # filled below when stats are requested
    }
    # files_meta is written whenever ANY stats exist — harvested for
    # this commit's files OR inherited from the parent. Gating on
    # stats_cols alone would let one stats-less append silently strip
    # the parent's zone maps from the whole lineage, permanently
    # degrading read_pruned to full scans and merge_upsert to full
    # rewrites (later stats appends re-inherit from the already-
    # stripped parent). Inherited-only meta keeps the old files
    # prunable; the new stats-less files are conservatively kept by
    # every consumer, and row_count stays None unless every file has
    # an entry.
    meta = dict(inherited_meta)
    if stats_cols:
        meta.update(
            {
                os.path.join(_DATA, sid, f): _file_stats(
                    os.path.join(staged, f), stats_cols
                )
                for f in files
            }
        )
    if meta:
        manifest["files_meta"] = meta
        if len(meta) == len(manifest["files"]):
            manifest["row_count"] = sum(m["rows"] for m in meta.values())
    man_path = os.path.join(man_dir, f"{sid}.json")
    with open(man_path + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(man_path + ".tmp", man_path)
    if parent_check and current_snapshot(root) != observed:
        raise RuntimeError(
            f"concurrent publish detected at {root!r}: current moved from "
            f"{observed!r}; retry on top of the new current snapshot"
        )
    with open(cur + ".tmp", "w") as fh:
        fh.write(sid)
    os.replace(cur + ".tmp", cur)  # THE commit point: one atomic pointer
    return sid


def current_snapshot(root: str) -> str | None:
    try:
        with open(os.path.join(root, _CURRENT)) as fh:
            return fh.read().strip() or None
    except OSError:
        return None


def _manifest(root: str, sid: str) -> dict:
    with open(os.path.join(root, _MANIFESTS, f"{sid}.json")) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession, root: str, sid: str, merge_schema: bool = False
) -> DataFrame:
    """Read an explicit snapshot (time travel). The scan is built from
    the manifest's file list — never a directory listing.

    ``merge_schema=True`` unions the file schemas (schema EVOLUTION:
    an append commit may add columns; old files surface the new
    columns as NULL). Off by default — schema union reads every
    footer up front, which at millions of files is the metadata cost
    the manifest exists to avoid; evolved tables should record their
    schema in the manifest at commit time (the Delta design) — a
    production extension noted, not needed while publishes are
    single-schema per lineage."""
    files = [os.path.join(root, f) for f in _manifest(root, sid)["files"]]
    if not files:
        raise ValueError(f"snapshot {sid!r} has no files")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def read_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lower,
    upper,
    sid: str | None = None,
) -> DataFrame:
    """Scan of the snapshot restricted to ``lower <= col <= upper``,
    with FILE-LEVEL pruning from the manifest's zone maps: a file
    whose [min, max] for ``col`` cannot intersect the range is dropped
    from the read plan entirely (never listed, never a task). Files
    with no recorded stats are kept — pruning is conservative, so a
    stats-less manifest degrades to a full scan, never to wrongness.
    The residual row-level predicate is ALWAYS applied (file
    granularity over-approximates), so the result is exactly the
    filtered snapshot."""
    from pyspark.sql import functions as F

    sid = sid or current_snapshot(root)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot at {root!r}")
    m = _manifest(root, sid)
    meta = m.get("files_meta", {})

    def may_match(rel: str) -> bool:
        st = meta.get(rel, {}).get("stats", {}).get(col)
        return st is None or (st[1] >= lower and st[0] <= upper)

    kept = [os.path.join(root, f) for f in m["files"] if may_match(f)]
    residual = (F.col(col) >= F.lit(lower)) & (F.col(col) <= F.lit(upper))
    if not kept:
        # zone maps exclude every file: the empty result, with the
        # snapshot's real schema (from the full file list, zero rows)
        return read_snapshot(spark, root, sid).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(residual)


def merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    key_col: str,
    snapshot_id: str | None = None,
) -> str:
    """Row-level upsert as a COPY-ON-WRITE commit (Delta's MERGE in
    miniature): rows in ``df`` replace current rows with the same
    ``key_col`` value; unmatched keys insert. Data files stay
    immutable — the commit rewrites ONLY the files that can contain a
    matched key and lists every other parent file unchanged, so the
    write is sized to the touched slice, not the table.

    Touched-file targeting uses the manifest's zone maps when present:
    a parent file whose [min, max] for ``key_col`` contains ANY update
    key (binary search of the sorted key set against each file's
    bounds) is rewritten — its rows anti-joined against the update
    keys, then the updates unioned in; all other files carry over by
    reference. Without stats every file is "touched" — the
    conservative full rewrite, correct but unpruned, same degradation
    contract as read_pruned. The rewritten+new rows are staged under
    the new snapshot's prefix and committed with the usual one-pointer
    publish, so readers see the old table or the new one, never a mix.

    At 100 TB: clustering the table on the merge key (repartitionByRange
    at publish) is what makes the touched set small — the same layout
    decision that makes read_pruned selective. The anti-join's left
    side is only the touched files' rows; the update side is typically
    broadcast-sized (a CDC batch).

    ``df`` is persisted for the duration of the merge: it is consumed
    three times (duplicate-key check, key collection, staged write),
    and without pinning, a non-deterministic source could pass the
    duplicate check yet stage different rows. The persist makes every
    consumer read the SAME materialization; sources should still be
    deterministic (every table format demands it of MERGE batches)."""
    from pyspark.sql import functions as F

    import bisect

    parent = current_snapshot(root)
    if snapshot_id is not None and parent == snapshot_id:
        # Exactly-once replay guard (the foreachBatch epoch contract):
        # this merge already committed. Re-deriving it would merge the
        # batch into ITS OWN RESULT — updates are idempotent but
        # inserts would anti-join against themselves and survive as
        # duplicates-in-time; the guard makes retry a no-op instead.
        return snapshot_id
    if parent is None:
        return publish(df, root, snapshot_id=snapshot_id)
    pm = _manifest(root, parent)
    meta = pm.get("files_meta", {})
    df = df.persist()
    try:
        return _merge_upsert_pinned(spark, df, root, key_col, snapshot_id, pm, meta)
    finally:
        df.unpersist()


def _merge_upsert_pinned(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    key_col: str,
    snapshot_id: str | None,
    pm: dict,
    meta: dict,
) -> str:
    from pyspark.sql import functions as F

    import bisect

    counts = df.agg(
        F.count("*").alias("n"), F.countDistinct(key_col).alias("d")
    ).first()
    if counts["n"] != counts["d"]:
        # MERGE requires unique source keys (every table format errors
        # here): duplicated batch keys would survive the anti-join as
        # duplicated TABLE rows — fail loudly, never corrupt.
        raise ValueError(
            f"merge_upsert batch has duplicate {key_col!r} values "
            f"({counts['n']} rows, {counts['d']} distinct)"
        )
    keys = df.select(key_col).distinct()
    # Per-file targeting against the key SET, not its global range: a
    # single far-away insert key would otherwise widen [min, max] to
    # cover every file and defeat the copy-on-write. CDC batches are
    # driver-bounded by nature; past the cap, fall back to the range
    # check (conservative — more files rewritten, never wrongness).
    key_cap = 100_000
    sample = [r[0] for r in keys.limit(key_cap + 1).collect()]
    key_sorted = sorted(sample) if len(sample) <= key_cap else None
    if key_sorted is None:
        b = keys.agg(F.min(key_col).alias("lo"), F.max(key_col).alias("hi")).first()
        lo, hi = b["lo"], b["hi"]

    def touched(rel: str) -> bool:
        st = meta.get(rel, {}).get("stats", {}).get(key_col)
        if st is None:
            return True  # no stats -> must assume it can match
        if key_sorted is not None:
            i = bisect.bisect_left(key_sorted, st[0])
            return i < len(key_sorted) and key_sorted[i] <= st[1]
        return lo is not None and st[1] >= lo and st[0] <= hi

    touched_rel = [f for f in pm["files"] if touched(f)]
    carried = [f for f in pm["files"] if f not in set(touched_rel)]
    if touched_rel:
        old_rows = spark.read.parquet(*[os.path.join(root, f) for f in touched_rel])
        survivors = old_rows.join(keys, key_col, "left_anti")
        staged_df = survivors.unionByName(df)
    else:
        staged_df = df
    stats_cols = sorted(
        {c for m in meta.values() for c in m.get("stats", {})}
    ) or None
    return publish(
        staged_df,
        root,
        snapshot_id=snapshot_id,
        stats_cols=stats_cols,
        _inherit_files=carried,
        _inherit_meta={f: meta[f] for f in carried if f in meta},
    )


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_files: int,
    snapshot_id: str | None = None,
) -> str:
    """OPTIMIZE: rewrite the current snapshot's data into
    ``target_files`` right-sized files and commit the result as a new
    snapshot — the manifest-native twin of ddl.compact_parquet (which
    the r5 shattered-table bench measured at 5× pure small-file
    overhead), but SNAPSHOT-SAFE: readers of the old manifest keep
    their exact file list while the rewrite runs; the pointer flip is
    the only visible event, and the old files remain until vacuum.
    This is what absorbs the per-micro-batch file debris a
    foreachBatch append pipeline accumulates (one tiny file per
    epoch). Zone-map columns recorded by the parent are re-harvested
    for the compacted files."""
    parent = current_snapshot(root)
    if parent is None:
        raise FileNotFoundError(f"no current snapshot at {root!r}")
    if snapshot_id is not None and parent == snapshot_id:
        return snapshot_id  # replayed compaction: already committed
    pm = _manifest(root, parent)
    stats_cols = sorted(
        {c for m in pm.get("files_meta", {}).values() for c in m.get("stats", {})}
    ) or None
    df = read_snapshot(spark, root, parent).coalesce(target_files)
    return publish(df, root, snapshot_id=snapshot_id, stats_cols=stats_cols)


def added_files(root: str, from_sid: str | None, to_sid: str) -> list[str]:
    """Data files in ``to_sid``'s manifest that ``from_sid``'s lacks —
    the incremental scan set between two snapshots. Files are immutable
    and write-once, so path set difference IS the data delta for
    append-only lineages (``from_sid=None`` means everything). Order is
    the manifest's (stable)."""
    old = set() if from_sid is None else set(_manifest(root, from_sid)["files"])
    return [f for f in _manifest(root, to_sid)["files"] if f not in old]


def read_added(
    spark: SparkSession, root: str, from_sid: str | None, to_sid: str
) -> DataFrame:
    """Scan ONLY the files added between two snapshots: the
    reprocess-the-delta primitive (a downstream aggregate folds this
    slice into its saved state instead of rescanning the corpus —
    at 100 TB the difference between a per-drop job sized to the drop
    and one sized to the table). Empty delta → empty frame with the
    snapshot's schema."""
    from pyspark.sql import functions as F

    delta = added_files(root, from_sid, to_sid)
    if not delta:
        return read_snapshot(spark, root, to_sid).filter(F.lit(False))
    return spark.read.parquet(*[os.path.join(root, f) for f in delta])


def read_current(
    spark: SparkSession, root: str, merge_schema: bool = False
) -> DataFrame:
    sid = current_snapshot(root)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot at {root!r}")
    return read_snapshot(spark, root, sid, merge_schema=merge_schema)


def snapshots(root: str) -> list[str]:
    """All LISTABLE snapshot ids, oldest first (lineage via parents).

    The walk ends at the retention horizon: a parent whose manifest is
    gone was reaped by ``vacuum``, which deletes old manifests but
    cannot rewrite the survivors' parent pointers (manifests are
    immutable) — so a truncated history is the NORMAL post-vacuum
    state, not corruption (r10 fix: the walk used to raise on the
    first reaped ancestor, which broke every ``snapshots`` consumer —
    including a second ``vacuum`` — after the first reaping vacuum).
    A missing manifest for the CURRENT pointer itself is still an
    error: the pointer only ever flips to a fully committed snapshot,
    so that can only be out-of-contract interference.

    Only ``FileNotFoundError`` means "reaped" (r11, ADVICE r10): a
    TRANSIENT OSError on an ancestor (EMFILE, EACCES, EIO) must
    propagate, not masquerade as the horizon — ``vacuum`` derives its
    keep set from this walk, so a transiently truncated lineage would
    make it reap manifests and uniquely-referenced data of snapshots
    INSIDE the keep window. Propagating aborts the vacuum instead;
    retrying after the transient condition clears is always safe."""
    chain: list[str] = []
    seen: set[str] = set()
    sid = current_snapshot(root)
    while sid is not None:
        if sid in seen:  # defensive: a corrupted lineage must not hang
            raise RuntimeError(f"snapshot lineage cycle at {sid!r} in {root!r}")
        seen.add(sid)
        try:
            parent = _manifest(root, sid)["parent"]
        except FileNotFoundError:
            if not chain:
                raise  # pointer names a missing manifest: corruption
            break  # reaped ancestor: history truncated here
        chain.append(sid)
        sid = parent
    return list(reversed(chain))


def vacuum(root: str, keep: int = 1) -> list[str]:
    """Delete data files and manifests of all but the ``keep`` most
    recent snapshots IN THE CURRENT LINEAGE, plus any unreferenced
    data prefixes (crashed writers). Returns removed snapshot prefixes.
    Safe order: old pointers are unreachable the moment ``_CURRENT``
    moved, so deletion can't race a reader that resolved the pointer
    recently unless it held the manifest across the vacuum — the usual
    retention-window caveat every table format documents."""
    data_dir, man_dir, _ = _paths(root)
    keep_ids = set(snapshots(root)[-keep:]) if keep > 0 else set()
    removed = []
    live = set()
    for sid in keep_ids:
        live.update(os.path.basename(os.path.dirname(f)) for f in _manifest(root, sid)["files"])
    if os.path.isdir(data_dir):
        for prefix in os.listdir(data_dir):
            if prefix not in live and prefix not in keep_ids:
                shutil.rmtree(os.path.join(data_dir, prefix), ignore_errors=True)
                removed.append(prefix)
    if os.path.isdir(man_dir):
        for mf in os.listdir(man_dir):
            sid = mf[: -len(".json")] if mf.endswith(".json") else None
            if sid and sid not in keep_ids:
                os.remove(os.path.join(man_dir, mf))
    return removed
