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
- The pointer is a GENERATION LOG (``_CURRENT.gen/<n>``, r12): commit
  = compare-and-swap via ``os.link`` of a fully-written scratch file
  onto the next generation number — atomic-exclusive, so exactly one
  writer wins each generation. On an object store each generation
  entry maps to a conditional PUT (If-None-Match) of that key — the
  one mutation primitive such stores provide. A best-effort legacy
  ``_CURRENT`` mirror file is kept for humans and pre-r12 roots
  (which the reader falls back to as generation 0).
- Readers never list ``data/``: ``read_current`` loads the manifest's
  explicit file list, so partial uploads and stale files cannot leak
  into a scan.
- CONCURRENCY CONTRACT (r12, upgraded from single-writer-per-root):
  concurrent COMMITS against one root are safe and serialize through
  the pointer CAS. Concurrent APPEND commits all land — a loser
  rebuilds its manifest on the fresh parent and re-CASes (its staged
  files are parent-independent). A losing MERGE or COMPACTION — whose
  content was DERIVED from the superseded parent — auto-REBASES
  (r12b, the Delta/Iceberg OCC retry loop): ``merge_upsert`` /
  ``compact_snapshot`` catch the typed ``ConcurrentPublishError``,
  re-read the fresh current, RE-DERIVE their content against it, and
  re-commit, up to ``rebase_retries`` times. Re-derivation IS the
  conflict resolution: the retry literally re-executes the operation
  on the winner's result, so the final lineage equals some serial
  order of the racing commits (merge-after-append sees the appended
  rows; two merges land last-writer-wins per key — the serial
  outcome). ``rebase_retries=0`` restores raise-to-the-caller. A
  losing plain overwrite (``parent_check``) still raises — its
  content is caller-derived, so only the caller can re-derive.
  No commit is ever clobbered, torn, or silently orphaned. Two
  residual exclusions, both inherent to the semantics rather than the
  mechanism: (1) SAME-TOKEN replays are at-least-once-SEQUENTIAL
  (the Structured Streaming checkpoint contract — two live replays of
  one epoch corrupt any sink); (2) ``vacuum`` still requires quiesced
  writers — it reaps unreferenced data prefixes, which is exactly
  what an in-flight commit's staged files look like (the same
  retention caveat every table format documents).
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
_GEN = "_CURRENT.gen"
# How many pointer races one commit absorbs before declaring the root
# pathologically contended. Each retry rebuilds the manifest against
# the fresh parent, so 16 lost races means 16 other commits landed
# during ours — far past any in-contract writer count.
_COMMIT_RETRIES = 16
# Generation entries vacuum leaves behind (newest-first). Never below
# 1 (the max entry IS the pointer); the tail exists only so a reader
# that listed the directory just before a prune can still resolve.
_GEN_KEEP = 16
# Lost derivation races a merge/compaction re-derives through before
# giving up. Each retry re-reads the fresh parent and re-runs the
# Spark derivation, so 3 lost races means 3 full interloping commits
# landed DURING our derive+commit — already pathological contention
# for content-sized operations (contrast _COMMIT_RETRIES=16 for
# appends, whose retry is metadata-only).
_REBASE_RETRIES = 3

# Sentinel for publish's ``_require_parent``: "this commit's content
# was derived from NO parent" (an empty table at derivation time).
# ``None`` can't express that — it means "no pin at all" — so before
# this sentinel the empty-table merge path committed unpinned: a
# concurrent first-writer landing between the OCC loop's
# current_snapshot() read (None) and publish's own pointer read was
# observed as current, passed the disabled pre-check, and had its
# rows silently dropped by the batch-only child (ADVICE r12 #1, a
# lost update the module's serializability contract forbids). With
# the sentinel, publish requires the observed current to STILL be
# None and raises ConcurrentPublishError otherwise, so the OCC loop
# rebases into the real merge path against the interloper.
_NO_PARENT = "<derived-from-empty-table>"


class ConcurrentPublishError(RuntimeError):
    """A commit whose content was derived from a parent snapshot lost
    the pointer race: another writer committed between the derivation
    read and this commit's CAS. The derivation is stale — re-derive on
    the NEW current and retry (``merge_upsert``/``compact_snapshot``
    do this automatically via their ``rebase_retries`` loop).

    Typed (vs the bare RuntimeError it subclasses, for compatibility
    with pre-r12b callers matching the message) so the OCC retry loop
    can catch exactly the re-derivable failure and let every other
    error — the horizon-truncated token refusal, pathological-
    contention exhaustion, IO faults — propagate untouched."""


def _read_pointer(root: str) -> tuple[int, str | None]:
    """(generation, snapshot id) of the current pointer.

    The pointer is a GENERATION LOG: ``_CURRENT.gen/<n>`` files, each
    holding one snapshot id, created exclusively via ``os.link`` — the
    highest generation wins. A root with no generation entries falls
    back to the legacy single-file ``_CURRENT`` pointer (pre-r12
    roots), which reads as generation 0; the first CAS commit against
    such a root starts the log at generation 1. The retry loop covers
    the one benign race: vacuum pruning the entry we just listed as
    max while a newer max exists — re-list and resolve again.
    """
    gen_dir = os.path.join(root, _GEN)
    for _ in range(64):  # bounded: each retry implies a concurrent prune
        try:
            entries = [e for e in os.listdir(gen_dir) if e.isdigit()]
        except FileNotFoundError:
            entries = []
        if not entries:
            try:
                with open(os.path.join(root, _CURRENT)) as fh:
                    return 0, fh.read().strip() or None
            except OSError:
                return 0, None
        top = max(entries, key=int)
        try:
            with open(os.path.join(gen_dir, top)) as fh:
                return int(top), fh.read().strip() or None
        except FileNotFoundError:
            continue  # max pruned between list and read: re-list
    raise RuntimeError(
        f"pointer at {root!r} would not settle after 64 reads — "
        "generation entries are being pruned faster than they can be "
        "resolved (a vacuum loop racing readers, out of contract)"
    )


def _advance_pointer(root: str, expect_gen: int, new_sid: str) -> bool:
    """Compare-and-swap the pointer from generation ``expect_gen`` to
    ``expect_gen + 1`` naming ``new_sid``. Returns False on a lost race.

    The CAS primitive is ``os.link`` of a fully-written (fsync'd)
    scratch file onto the next generation name: link is atomic-
    exclusive (EEXIST if any other writer took that generation) and
    the name appears with its complete content — no reader can observe
    a created-but-unwritten pointer, which an O_EXCL ``open`` would
    expose. On an object store this maps 1:1 to a conditional PUT
    (If-None-Match) of the generation key — the primitive the module
    docstring always named as the scale path.

    Defense-in-depth (documented, not load-bearing): generation reuse
    is impossible while vacuum honors its quiesced-writers contract
    (entries only ever grow; vacuum prunes only old ones). If a vacuum
    DID race us — pruning the very generation we are about to take,
    after ≥``_GEN_KEEP`` newer commits — our link would succeed at a
    stale generation and the commit would be silently invisible. The
    post-link check below detects that case when the successor lineage
    is still walkable and raises loudly instead.
    """
    gen_dir = os.path.join(root, _GEN)
    os.makedirs(gen_dir, exist_ok=True)
    scratch = os.path.join(gen_dir, f".tmp-{uuid.uuid4().hex[:12]}")
    with open(scratch, "w") as fh:
        fh.write(new_sid)
        fh.flush()
        os.fsync(fh.fileno())
    new_gen = expect_gen + 1
    try:
        os.link(scratch, os.path.join(gen_dir, f"{new_gen:020d}"))
    except FileExistsError:
        return False
    finally:
        os.unlink(scratch)
    # best-effort legacy mirror: gen-aware readers ignore it the moment
    # the log is non-empty, so staleness under concurrency is harmless;
    # it keeps pre-r12 tools and humans able to read the pointer.
    mirror_tmp = os.path.join(root, f"{_CURRENT}.tmp-{uuid.uuid4().hex[:12]}")
    try:
        with open(mirror_tmp, "w") as fh:
            fh.write(new_sid)
        os.replace(mirror_tmp, os.path.join(root, _CURRENT))
    except OSError:
        try:
            os.unlink(mirror_tmp)
        except OSError:
            pass
    # the stale-generation detector described above
    try:
        entries = [e for e in os.listdir(gen_dir) if e.isdigit()]
        top = max(int(e) for e in entries)
    except (FileNotFoundError, ValueError):
        return True
    if top > new_gen:
        # Newer generations exist. Normal cause: we committed and were
        # immediately superseded — then the current lineage descends
        # from us. Pathological cause (vacuum raced an in-flight
        # commit): we linked a PRUNED generation and the current
        # lineage does not contain us. Walk the successor's parents;
        # a truncated walk (vacuumed ancestor manifest) is accepted —
        # it cannot be distinguished, and vacuum running at all means
        # the quiesced-writers contract is already broken louder ways.
        _, cur = _read_pointer(root)
        sid = cur
        seen: set[str] = set()
        while sid is not None and sid not in seen:
            if sid == new_sid:
                return True
            seen.add(sid)
            try:
                sid = _manifest(root, sid)["parent"]
            except FileNotFoundError:
                return True  # truncated history: cannot adjudicate
        raise RuntimeError(
            f"commit {new_sid!r} at {root!r} landed on a stale pointer "
            f"generation ({new_gen} vs current {top}) and the live "
            "lineage does not descend from it — a vacuum pruned "
            "generation entries while this commit was in flight "
            "(vacuum requires quiesced writers)"
        )
    return True


def _relax_type_json(t):
    """A Spark type-JSON value with nullable/containsNull/
    valueContainsNull forced True at EVERY level — the relaxed dual of
    ``_type_fingerprint``'s strip. Top-level-only relaxation (the r12
    shape) recorded the FIRST writer's nested nullability verbatim;
    because ``_type_fingerprint`` ignores nested nullability, a later
    append with legal NULLs in a nested field validated fine yet all
    reads bound to the parent's non-nullable declaration — Spark may
    skip null checks for data the lineage legally holds (ADVICE r12
    #2)."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return {
                **t,
                "fields": [
                    {
                        **f,
                        "nullable": True,
                        "type": _relax_type_json(f["type"]),
                    }
                    for f in t["fields"]
                ],
            }
        if kind == "array":
            return {
                **t,
                "containsNull": True,
                "elementType": _relax_type_json(t["elementType"]),
            }
        if kind == "map":
            return {
                **t,
                "valueContainsNull": True,
                "keyType": _relax_type_json(t["keyType"]),
                "valueType": _relax_type_json(t["valueType"]),
            }
        return t
    return t


def _schema_json(df: DataFrame) -> dict:
    """The snapshot schema a commit records in its manifest, as Spark
    StructType JSON with every field — at every nesting level — forced
    NULLABLE. Nullable is the only honest nullability for a
    manifest-recorded schema: schema evolution means old files can
    lack a later column entirely (read as NULL), and parquet read-back
    surfaces nullable fields anyway — recording a non-nullable field
    (top-level OR nested) would promise more than an evolved lineage
    can keep."""
    return _relax_type_json(df.schema.jsonValue())


def _type_fingerprint(t):
    """A Spark type-JSON value with every NULLABILITY and METADATA
    annotation stripped, recursively — the comparison key for "same
    type, no cast needed". Nested nullable/containsNull/
    valueContainsNull and field metadata differ freely between a
    createDataFrame DDL schema and a written-then-recorded one;
    treating them as type conflicts would refuse batches whose types
    genuinely align (r12 close review, pass 2)."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return (
                "struct",
                tuple(
                    (f["name"], _type_fingerprint(f["type"]))
                    for f in t["fields"]
                ),
            )
        if kind == "array":
            return ("array", _type_fingerprint(t["elementType"]))
        if kind == "map":
            return (
                "map",
                _type_fingerprint(t["keyType"]),
                _type_fingerprint(t["valueType"]),
            )
        if kind == "udt":
            return ("udt", t.get("class"))
        return ("other", json.dumps(t, sort_keys=True))
    return t


def _merge_schemas(
    parent: dict | None, new: dict | None, allow_new: bool, root: str
) -> dict | None:
    """The schema an APPEND commit records: the parent's columns, in
    the parent's order, plus any columns the appended frame adds (at
    the end — the Delta mergeSchema shape). Shared column names must
    have IDENTICAL types — no implicit casts, ever; a type conflict is
    a loud error, not a coerced read. New columns require the caller
    to opt in (``merge_schema=True``): silently widening a table's
    contract is how downstream readers break at 3am. Appending a
    SUBSET of the parent's columns is always fine — the missing
    columns read as NULL through the recorded schema. A legacy parent
    (no recorded schema — pre-evolution lineage) stays legacy: the old
    files' columns are unknown, so inventing a contract that might not
    cover them would hide data."""
    if parent is None or new is None:
        return None
    ptypes = {f["name"]: f["type"] for f in parent["fields"]}
    out = [dict(f) for f in parent["fields"]]
    for f in new["fields"]:
        if f["name"] in ptypes:
            if _type_fingerprint(ptypes[f["name"]]) != _type_fingerprint(
                f["type"]
            ):
                raise ValueError(
                    f"schema conflict appending to {root!r}: column "
                    f"{f['name']!r} is {ptypes[f['name']]!r} in the table "
                    f"but {f['type']!r} in the appended frame — no "
                    "implicit casts; align the types explicitly"
                )
        else:
            if not allow_new:
                raise ValueError(
                    f"append to {root!r} adds column {f['name']!r} not in "
                    "the table schema; pass merge_schema=True to evolve "
                    "the schema (old files will read it as NULL)"
                )
            out.append(dict(f))
    # relax the WHOLE result, parent fields included: a lineage whose
    # schema was recorded before the recursive relaxation (top-level-
    # only, pre-r13) would otherwise perpetuate nested non-nullable
    # declarations through every append forever — the exact skipped-
    # null-check hazard _relax_type_json closes (r13 review)
    return _relax_type_json({"type": "struct", "fields": out})


def _manifest_reader(spark: SparkSession, man: dict, legacy_union: bool = False):
    """A DataFrameReader for ``man``'s files: the manifest-recorded
    schema when present (NO footer reads — the point of recording it;
    files missing an evolved column surface it as NULL), else the
    plain parquet reader (legacy lineages). ``legacy_union=True``
    makes the legacy fallback a FOOTER-UNION read (mergeSchema) — the
    survivor-rewriting operations (merge, delete) must see every
    column of a heterogeneous pre-r12b lineage or they would silently
    drop the ones the inferring footer lacks."""
    from pyspark.sql.types import StructType

    if man.get("schema"):
        return spark.read.schema(StructType.fromJson(man["schema"]))
    if legacy_union:
        return spark.read.option("mergeSchema", "true")
    return spark.read


def _paths(root: str) -> tuple[str, str, str]:
    return (
        os.path.join(root, _DATA),
        os.path.join(root, _MANIFESTS),
        os.path.join(root, _CURRENT),
    )


def _rel_file_expr():
    """Column expression: the manifest-relative path
    ``data/<sid>/<part>`` of the file each row was read from, derived
    from the hidden parquet ``_metadata`` column (OSS Spark 3.5+).
    Relative — never the absolute URI — so deletion vectors stay valid
    if the table root moves."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        "/", F.slice(F.split(F.col("_metadata.file_path"), "/"), -3, 3)
    )


def _apply_deletes(
    spark: SparkSession,
    root: str,
    man: dict,
    df: DataFrame,
    files: list[str] | None = None,
) -> DataFrame:
    """Mask merge-on-read deleted rows out of a scan of ``man``'s
    files: anti-join on (file, row position) against the snapshot's
    deletion vectors (``man["deletes"]``). Row positions come from the
    parquet reader's own ``_metadata.row_index`` — stable per file by
    construction, the same identity Iceberg positional deletes and
    Delta deletion vectors key on. No deletes → the scan is returned
    UNTOUCHED (zero plan overhead for tables that never used MOR).

    ``files`` (optional) names the manifest-relative data files ``df``
    actually scans (a pruned subset); DV files containing positions
    only for other data files are then skipped entirely — the
    manifest's per-file association is what keeps a pruned read's DV
    fetch proportional to the slice, not the table's delete history.

    At 100 TB: the DV side is matched-rows-sized (the whole point of
    MOR); Spark/AQE broadcasts it when small, shuffles both sides on
    the (file, pos) key otherwise — either way the data side is
    scanned once with no driver materialization."""
    from pyspark.sql import functions as F

    dels = man.get("deletes") or {}
    if files is not None:
        scanned = set(files)
        dels = {f: e for f, e in dels.items() if f in scanned}
    if not dels:
        return df
    # collision-proof scratch names (the compact_snapshot zkey rule)
    tag = uuid.uuid4().hex[:8]
    rc, pc = f"_dv_rel_{tag}", f"_dv_pos_{tag}"
    ann = df.withColumn(rc, _rel_file_expr()).withColumn(
        pc, F.col("_metadata.row_index")
    )
    return _dv_anti_join(spark, root, dels, ann, rc, pc).drop(rc, pc)


# masked-file count above which the DV prefilter switches from an
# isin literal (embeds one expression per file in the plan) to a
# broadcast semi-join (plan size constant in the mask count)
_DV_ISIN_MAX = 64


def _dv_anti_join(
    spark: SparkSession, root: str, dels: dict, ann: DataFrame,
    rc: str, pc: str,
) -> DataFrame:
    """THE deletion-vector join (one definition — r13 review: the
    read path and the DML derivation path must never diverge on how
    vectors are loaded or matched): anti-join ``ann`` — a scan already
    annotated with ``rc`` (relative path, as ``_metadata`` renders it:
    URL-encoded) and ``pc`` (row position) — against the vectors in
    ``dels``, which the caller has restricted to the scanned files.
    The dv-file list is the per-file association recorded at commit
    time, so a pruned scan reads only the sidecars covering its slice;
    positions for other data files fail the join condition by
    construction. Empty ``dels`` → ``ann`` untouched."""
    from pyspark.sql import functions as F

    if not dels:
        return ann
    dv_files = sorted({p for e in dels.values() for p in e["dv"]})
    dv = spark.read.schema("f string, pos long").parquet(
        *[os.path.join(root, p) for p in dv_files]
    )
    # prefilter the vector rows to the scanned files (second r13
    # review: dropped in the unification, and it is free — a commit's
    # positions hash-cluster into _DV_FILES shared sidecars, so a
    # pruned one-file read would otherwise feed the sidecar's WHOLE
    # position set into the join build side; rows for other files
    # store the path as _metadata renders it, URL-encoded). Small
    # masked-file sets inline as an IN literal (min-max'd by codegen);
    # past the threshold an isin literal embeds O(n) expressions in
    # the plan — after sustained MOR ingest thousands of masked files
    # would bloat analysis time (ADVICE r13 #2) — so large sets go
    # through a broadcast semi-join against a file-count-sized frame.
    rels = [_uri_rel(f) for f in dels]
    if len(rels) <= _DV_ISIN_MAX:
        dv = dv.where(F.col("f").isin(rels))
    else:
        scanned = spark.createDataFrame([(r,) for r in rels], "f string")
        dv = dv.join(F.broadcast(scanned), "f", "left_semi")
    return ann.join(
        dv, (F.col(rc) == dv["f"]) & (F.col(pc) == dv["pos"]), "left_anti"
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
    nulls: dict[str, int] = {}
    for c in cols:
        if c not in idx:
            # the file PREDATES this column (schema evolution) or the
            # frame staged without it (subset append): every read
            # surfaces NULL, which IS a complete null-count stat —
            # range predicates can prune the whole file on it
            nulls[c] = md.num_rows
            continue
        lo = hi = None
        nc = 0
        minmax_ok = True  # a poisoned bound must not leak partial ranges
        for rg in range(md.num_row_groups):
            rgmd = md.row_group(rg)
            s = rgmd.column(idx[c]).statistics
            if s is None or s.null_count is None:
                nc = None  # any countless group poisons the null stat
            elif nc is not None:
                nc += s.null_count
            if minmax_ok:
                if s is None:
                    minmax_ok = False
                elif not s.has_min_max:
                    # legal when the group is PROVABLY all-null (no
                    # values to bound — contributes nothing); any other
                    # min/max-less group (stats disabled, unorderable)
                    # poisons the file's bounds
                    if not (s.null_count is not None
                            and s.null_count == rgmd.num_rows):
                        minmax_ok = False
                else:
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if not minmax_ok:
            lo = hi = None
        lo, hi = jsonable(lo), jsonable(hi)
        if lo is not None and hi is not None:
            stats[c] = [lo, hi]
        if nc is not None:
            nulls[c] = nc
    out = {"rows": md.num_rows, "stats": stats}
    if nulls:
        out["nulls"] = nulls
    return out


def publish(
    df: DataFrame,
    root: str,
    snapshot_id: str | None = None,
    parent_check: bool = True,
    stats_cols: list[str] | None = None,
    append: bool = False,
    merge_schema: bool = False,
    _inherit_files: list[str] | None = None,
    _inherit_meta: dict | None = None,
    _inherit_deletes: dict | None = None,
    _require_parent: str | None = None,
    _record_schema: bool = True,
) -> str:
    """Write ``df`` as a new snapshot of the table at ``root`` and
    atomically make it current. Returns the snapshot id.

    ``_require_parent`` (internal, r12): commits whose CONTENT was
    derived from a specific parent snapshot (merge_upsert's survivor
    rows, compact_snapshot's rewrite) pass the snapshot they read.
    If the pointer has already moved past it by publish time, the
    commit raises the concurrent-publish error instead of silently
    committing stale derivations on top of the interloper — the gap
    between the caller's derivation read and publish's own parent
    capture that the pre-CAS single-writer contract papered over.

    ``snapshot_id`` doubles as the idempotent retry token (the
    at-least-once foreachBatch contract): a replay of a snapshot that
    fully committed is a pure no-op — restaging would transiently
    delete live files out from under concurrent readers — while a
    replay after a pre-commit crash overwrites its own (unreferenced,
    reader-invisible) staged files and re-points. The pointer advance
    is a CAS on the generation log (r12), so concurrent commits
    SERIALIZE: append losers rebuild on the fresh parent and retry
    inside ``_commit_staged`` (all appends land); an overwrite that
    lost the race with ``parent_check`` (default) fails loudly
    instead of silently clobbering, and the manifest records the
    snapshot it superseded.

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
    incremental-scan design operators/cdc.py argues from).

    SCHEMA-ON-MANIFEST (r12b — the production extension read_snapshot
    always named): every commit records its snapshot schema, so reads
    bind to the manifest's contract with ZERO footer reads (at
    millions of files the metadata win the manifest exists for).
    Appends validate against the parent's recorded schema: identical
    types on shared names (no implicit casts), new columns only with
    ``merge_schema=True`` (Delta's opt-in; old files read the evolved
    column as NULL), appended column subsets always fine. A legacy
    lineage (no recorded schema) stays legacy until overwritten."""
    data_dir, man_dir, _ = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    observed_gen, observed = _read_pointer(root)
    if _require_parent is not None:
        # _NO_PARENT pins "derived from an empty table": the observed
        # current must still be None, else a first-writer interloper
        # landed since the derivation and an unpinned commit here
        # would drop its rows (ADVICE r12 #1).
        expected = None if _require_parent == _NO_PARENT else _require_parent
        if observed != expected and observed != sid:
            raise ConcurrentPublishError(
                f"concurrent publish detected at {root!r}: this commit's "
                f"content was derived from "
                f"{'an empty table' if expected is None else repr(expected)}"
                f" but current is {observed!r}; re-derive on top of the "
                "new current snapshot"
            )
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
        # Any other parent splits three ways, adjudicated below by a
        # lineage walk (r12b): committed-then-superseded (idempotent
        # no-op — the commit already landed), the crash residue of a
        # LOST commit attempt (adopt — delete and commit fresh), or
        # unprovable at the vacuum horizon (refuse).
        # (restore_snapshot keeps these adjudications sound by never
        # moving the pointer backward: a rollback is a NEW child
        # commit inheriting the target's files, so history stays
        # linear and no tombstoning is needed.)
        if _manifest(root, sid).get("parent") == observed:
            # Finish the torn commit via the CAS (r12): the pointer
            # advance is conditional on the generation we observed, so
            # the r9-r11 read-then-flip residual window — a concurrent
            # writer committing a child of `observed` between our
            # re-check and our flip, silently orphaned by the blind
            # os.replace — is ELIMINATED, not narrowed: if any other
            # commit landed first, our link loses and we re-read.
            # Two benign post-loss outcomes: a CONCURRENT REPLAY OF
            # THIS SAME TOKEN finished the flip (current == sid — the
            # commit is done; raising would spuriously crash an
            # at-least-once restart that cannot mint a fresh token),
            # or a different child committed: fall through to the
            # unretryable error.
            if _advance_pointer(root, observed_gen, sid):
                return sid
            if _read_pointer(root)[1] == sid:
                return sid  # a same-token replay completed the commit
            observed_gen, observed = _read_pointer(root)
        # Residue vs superseded (r12b): the manifest's parent is not
        # the current snapshot, so either the token COMMITTED earlier
        # and was since superseded, or it is the residue of a commit
        # attempt that LOST its pointer race and crashed before the
        # OCC scrub. The two are distinguishable because committed
        # snapshots form the EXACT linear history of the pointer (each
        # commit's parent is the generation value it replaced): a
        # COMPLETE parent walk from current that meets ``sid`` proves
        # it committed — the replay already HAPPENED, so the
        # at-least-once answer is an idempotent no-op success (raising
        # here permanently wedged a multi-writer stream whose epoch
        # landed and was then superseded by another in-contract
        # writer; foreachBatch cannot mint a fresh token — the r12
        # close review). A walk that completes WITHOUT meeting it
        # proves pure residue — never reader-visible, safe to adopt:
        # delete it and commit this replay fresh on the current
        # lineage. A walk truncated at the vacuum horizon
        # (FileNotFoundError only, the r11 rule) proves nothing —
        # refuse conservatively.
        landed = _committed_in_lineage(root, sid, observed)
        if landed is True:
            return sid  # this epoch's commit is already in history
        if landed is False:
            os.unlink(os.path.join(man_dir, f"{sid}.json"))
        else:
            raise RuntimeError(
                f"snapshot token {sid!r} has a manifest at {root!r} but "
                f"is not the current snapshot ({observed!r}) and the "
                "lineage walk truncated at the vacuum horizon — cannot "
                "prove it superseded vs lost-race residue; retry with a "
                "fresh snapshot_id"
            )
    staged = os.path.join(data_dir, sid)
    if os.path.isdir(staged) and _prefix_live(root, sid):
        # No manifest for this token (the adjudications above all
        # passed), yet its staged prefix is REFERENCED by the live
        # lineage: the token committed, was superseded, and vacuum
        # reaped its manifest while keeping its inherited files.
        # Restaging would overwrite live data (and an append would
        # land the batch a second time). Idempotent no-op (r13 review).
        return sid
    # stage: snapshot-unique prefix; overwrite = idempotent retry
    df.write.mode("overwrite").parquet(staged)
    files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    new_files = [os.path.join(_DATA, sid, f) for f in files]
    new_meta = (
        {
            os.path.join(_DATA, sid, f): _file_stats(
                os.path.join(staged, f), stats_cols
            )
            for f in files
        }
        if stats_cols
        else {}
    )
    return _commit_staged(
        root,
        sid,
        new_files,
        new_meta=new_meta,
        append=append,
        parent_check=parent_check,
        inherit_files=_inherit_files,
        inherit_meta=_inherit_meta,
        deletes=_inherit_deletes,
        observed_gen=observed_gen,
        observed=observed,
        # _record_schema=False: merge/delete rewriting a LEGACY
        # (pre-schema) lineage must not record the survivors' frame as
        # the table contract — carried files may hold columns it lacks
        # (the legacy-stays-legacy rule _merge_schemas applies to
        # appends; r12 close review)
        schema=_schema_json(df) if _record_schema else None,
        merge_schema=merge_schema,
    )


def _commit_staged(
    root: str,
    sid: str,
    new_files: list[str],
    *,
    new_meta: dict,
    append: bool,
    parent_check: bool,
    inherit_files: list[str] | None,
    inherit_meta: dict | None,
    observed_gen: int,
    observed: str | None,
    schema: dict | None = None,
    merge_schema: bool = False,
    deletes: dict | None = None,
) -> str:
    """Commit already-staged data files as snapshot ``sid``: write the
    manifest, then CAS the pointer. This is the multi-writer half of
    ``publish`` (r12, upgrading the r9-r11 single-writer contract):

    - The pointer advance is a compare-and-swap on the generation log
      (``_advance_pointer``), so two concurrent commits SERIALIZE —
      exactly one wins each generation; nothing is ever clobbered or
      silently orphaned.
    - A lost race on an APPEND commit retries on the fresh parent:
      the staged files are parent-independent, so the manifest is
      rebuilt to inherit the new current's file list and the CAS is
      re-attempted — concurrent appends ALL land, serialized, each
      lineage step containing the union so far.
    - A lost race on an overwrite with ``parent_check`` (default) or
      on a merge commit (``inherit_files`` — content DERIVED from the
      parent, unsafe to re-point blindly) raises the loud concurrent-
      publish error; the caller re-derives against the new current.
      ``parent_check=False`` overwrites retry like appends (last-
      writer-wins, but serialized — both snapshots exist in the
      lineage, one supersedes).

    SAME-TOKEN concurrency stays at-least-once-SEQUENTIAL (the
    Structured Streaming checkpoint contract: two live replays of one
    epoch against one checkpoint corrupt any sink): a benign overlap
    where a twin finished our commit returns success, but concurrent
    twins interleaving manifest REWRITES of one token are out of
    contract — only different-token writers get the CAS guarantee.

    Side effect on a lost+raised race: ``sid``'s manifest file remains
    on disk (parent = the superseded snapshot) — inert residue,
    unreferenced by any pointer, reaped by vacuum. A same-token retry
    no longer wedges on it (r12b): the OCC rebase loop scrubs it
    before re-deriving, and publish itself adjudicates residue vs
    committed-then-superseded by lineage walk, adopting provable
    residue instead of refusing it.
    """
    man_dir = os.path.join(root, _MANIFESTS)
    for _ in range(_COMMIT_RETRIES):
        parent = observed
        # carried-by-reference files: append inherits the whole parent;
        # merge_upsert passes the untouched subset explicitly
        inherited = list(inherit_files or [])
        inherited_meta = dict(inherit_meta or {})
        recorded_schema = schema
        recorded_deletes = dict(deletes or {})
        if append and parent is not None:
            pm = _manifest(root, parent)
            inherited = pm["files"] + inherited
            inherited_meta = {**pm.get("files_meta", {}), **inherited_meta}
            # schema validation + merge happens INSIDE the retry loop:
            # each retry lands on a fresh parent whose schema may have
            # evolved since the lost attempt
            recorded_schema = _merge_schemas(
                pm.get("schema"), schema, merge_schema, root
            )
            # deletion vectors ride with the files they mask: an append
            # carries the parent's files unchanged, so their DV entries
            # carry too — dropping them would RESURRECT merge-on-read
            # deleted rows on the very next append
            recorded_deletes = {
                **pm.get("deletes", {}), **recorded_deletes
            }
        manifest = {
            "snapshot_id": sid,
            "parent": parent,
            "files": inherited + new_files,
            "row_count": None,  # filled below when stats are requested
        }
        if recorded_schema is not None:
            manifest["schema"] = recorded_schema
        if recorded_deletes:
            manifest["deletes"] = recorded_deletes
        # files_meta is written whenever ANY stats exist — harvested
        # for this commit's files OR inherited from the parent. Gating
        # on stats_cols alone would let one stats-less append silently
        # strip the parent's zone maps from the whole lineage,
        # permanently degrading read_pruned to full scans and
        # merge_upsert to full rewrites (later stats appends re-inherit
        # from the already-stripped parent). Inherited-only meta keeps
        # the old files prunable; the new stats-less files are
        # conservatively kept by every consumer, and row_count stays
        # None unless every file has an entry.
        meta = {**inherited_meta, **new_meta}
        if meta:
            manifest["files_meta"] = meta
            if len(meta) == len(manifest["files"]):
                # LOGICAL rows (r13 review): files_meta records physical
                # per-file counts, but the snapshot's row count is what
                # a reader gets — masked deletion-vector positions
                # subtract, or metadata tooling disagrees with
                # read_snapshot by the full masked amount
                manifest["row_count"] = sum(
                    m["rows"] for m in meta.values()
                ) - sum(e["rows"] for e in recorded_deletes.values())
        man_path = os.path.join(man_dir, f"{sid}.json")
        tmp = f"{man_path}.tmp-{uuid.uuid4().hex[:12]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, man_path)
        if _advance_pointer(root, observed_gen, sid):
            return sid  # THE commit point: one conditional pointer step
        observed_gen, observed = _read_pointer(root)
        if observed == sid:
            return sid  # a same-token twin finished this commit
        if not append and (parent_check or inherit_files is not None):
            raise ConcurrentPublishError(
                f"concurrent publish detected at {root!r}: current moved "
                f"from {parent!r} to {observed!r}; retry on top of the "
                "new current snapshot"
            )
    raise RuntimeError(
        f"commit of {sid!r} at {root!r} lost {_COMMIT_RETRIES} "
        "consecutive pointer races — the root is pathologically "
        "contended (or a writer loop is republishing in a tight cycle)"
    )


def _committed_in_lineage(root: str, sid: str, cur: str | None) -> bool | None:
    """Whether ``sid`` is an ancestor-or-self of ``cur``.

    True — found: the token committed (and was later superseded).
    False — the walk COMPLETED to the lineage root without meeting it:
    provably never committed, because committed snapshots are exactly
    the pointer's linear history (each commit's parent is the
    generation value its CAS replaced, and nothing moves the pointer
    backward). None — the walk was truncated at the vacuum retention
    horizon: ONLY ``FileNotFoundError`` on an ancestor manifest means
    truncation (the r11 rule); any other error is transient IO and
    propagates rather than masquerading as an adjudication."""
    seen: set[str] = set()
    while cur is not None and cur not in seen:
        if cur == sid:
            return True
        seen.add(cur)
        try:
            cur = _manifest(root, cur)["parent"]
        except FileNotFoundError:
            return None
    return False


def current_snapshot(root: str) -> str | None:
    return _read_pointer(root)[1]


def _manifest(root: str, sid: str) -> dict:
    with open(os.path.join(root, _MANIFESTS, f"{sid}.json")) as fh:
        return json.load(fh)


def read_snapshot(
    spark: SparkSession, root: str, sid: str, merge_schema: bool = False
) -> DataFrame:
    """Read an explicit snapshot (time travel). The scan is built from
    the manifest's file list — never a directory listing.

    Snapshots committed since r12b RECORD their schema in the manifest
    (the Delta design), and the scan binds to it with zero footer
    reads — evolved lineages surface columns a file predates as NULL.
    ``merge_schema=True`` is the legacy fallback for pre-schema
    manifests only: it unions the file schemas by reading every footer
    up front, the metadata cost the recorded schema eliminates."""
    man = _manifest(root, sid)
    files = [os.path.join(root, f) for f in man["files"]]
    if not files:
        raise ValueError(f"snapshot {sid!r} has no files")
    reader = _manifest_reader(spark, man)
    if merge_schema and not man.get("schema"):
        reader = reader.option("mergeSchema", "true")
    # merge-on-read deletes (r13): mask DV positions before the frame
    # leaves the module — every consumer (CDC diff, compaction, the
    # registry keys) sees the LOGICAL table
    return _apply_deletes(spark, root, man, reader.parquet(*files))


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
    from the read plan entirely (never listed, never a task), as is a
    file whose recorded NULL COUNT equals its row count — every value
    NULL, including files that simply PREDATE the column under schema
    evolution (a range predicate can never match NULL). Files with no
    recorded stats are kept — pruning is conservative, so a stats-less
    manifest degrades to a full scan, never to wrongness. The residual
    row-level predicate is ALWAYS applied (file granularity
    over-approximates), so the result is exactly the filtered
    snapshot."""
    from pyspark.sql import functions as F

    sid = sid or current_snapshot(root)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot at {root!r}")
    m = _manifest(root, sid)
    meta = m.get("files_meta", {})

    def may_match(rel: str) -> bool:
        fm = meta.get(rel, {})
        nc = fm.get("nulls", {}).get(col)
        if nc is not None and nc == fm.get("rows"):
            return False  # provably all-NULL in col: no range matches
        st = fm.get("stats", {}).get(col)
        return st is None or (st[1] >= lower and st[0] <= upper)

    kept_rel = [f for f in m["files"] if may_match(f)]
    kept = [os.path.join(root, f) for f in kept_rel]
    residual = (F.col(col) >= F.lit(lower)) & (F.col(col) <= F.lit(upper))
    if not kept:
        # zone maps exclude every file: the empty result, with the
        # snapshot's real schema (from the full file list, zero rows)
        return read_snapshot(spark, root, sid).filter(F.lit(False))
    scan = _apply_deletes(
        spark, root, m, _manifest_reader(spark, m).parquet(*kept),
        files=kept_rel,
    )
    return scan.filter(residual)


def _prefix_live(root: str, sid: str) -> bool:
    """True iff any manifest in the live lineage references a file
    under ``data/<sid>/`` — data files inherited forward by appends/
    merges, or deletion-vector sidecars still masking live files.

    This is the local adjudicator for the one replay case the
    manifest-exists walks cannot see (r13 review): a token whose
    manifest was VACUUM-REAPED but whose staged files live on because
    newer manifests reference them. Staging ``data/<sid>`` again
    (mode=overwrite) would destroy files concurrent readers resolve —
    the reference proves the token COMMITTED (only a committed
    snapshot's files are ever inherited), so the at-least-once answer
    is an idempotent no-op. A committed-reaped-AND-unreferenced token
    is locally indistinguishable from a never-committed one; replaying
    a checkpoint from beyond the vacuum retention window is the
    documented out-of-contract case every table format shares."""
    prefix = f"{_DATA}/{sid}/"
    # one inline parent walk, newest first — snapshots() + per-sid
    # re-reads would parse every manifest twice (second r13 review,
    # the poll() double-read shape); the horizon break mirrors
    # snapshots()' normal post-vacuum truncation
    cur = current_snapshot(root)
    seen: set[str] = set()
    while cur is not None and cur not in seen:
        seen.add(cur)
        try:
            man = _manifest(root, cur)
        except FileNotFoundError:
            break  # retention horizon: older history is reaped
        if any(f.startswith(prefix) for f in man["files"]):
            return True
        if any(
            p.startswith(prefix)
            for e in man.get("deletes", {}).values()
            for p in e["dv"]
        ):
            return True
        cur = man.get("parent")
    return False


def _scrub_lost_attempt(
    root: str, sid: str | None, derived_parent: str | None
) -> None:
    """Remove the manifest residue a LOST same-token commit attempt
    left behind, so an OCC rebase retry of that token isn't refused by
    publish's superseded-token check. Only scrubs a manifest provably
    written by the lost attempt: its recorded parent must equal the
    parent the attempt derived against. A manifest from an earlier
    COMMITTED life of the token can never satisfy that — its parent is
    a strict ANCESTOR of the current we just derived from (the pointer
    never moves backward), so live-lineage manifests are untouchable
    here. No-op for auto-minted tokens (each attempt gets a fresh sid;
    residue is inert and vacuum-reaped) and when the lost attempt
    failed publish's pre-check before writing any manifest."""
    if sid is None:
        return
    if _read_pointer(root)[1] == sid:
        return  # a same-token twin finished the commit: manifest is live
    try:
        if _manifest(root, sid).get("parent") == derived_parent:
            os.unlink(os.path.join(root, _MANIFESTS, f"{sid}.json"))
    except OSError:
        pass  # no residue (pre-check loss) or already scrubbed


def _occ_loop(root: str, snapshot_id: str | None, retries: int, attempt):
    """The shared OCC retry protocol merge_upsert / delete_where /
    compact_snapshot all speak (one definition, three users — finding
    of the r12 close review): read the current snapshot, honor the
    exactly-once replay guard (``parent == snapshot_id`` — the token
    already committed, possibly finished by a twin mid-rebase;
    re-deriving would apply the batch to ITS OWN RESULT), run
    ``attempt(parent)`` (the op-specific derive + publish), and on a
    lost pointer race scrub the same-token residue and re-derive on
    the fresh current, up to ``retries`` times. Exhaustion re-raises
    the final ``ConcurrentPublishError``."""
    for i in range(retries + 1):
        parent = current_snapshot(root)
        if snapshot_id is not None and parent == snapshot_id:
            return snapshot_id
        if (
            snapshot_id is not None
            and os.path.exists(
                os.path.join(root, _MANIFESTS, f"{snapshot_id}.json")
            )
            and _committed_in_lineage(root, snapshot_id, parent) is True
        ):
            # committed then SUPERSEDED by another writer: publish
            # would no-op this anyway (lineage-walk adjudication), but
            # only after attempt() re-ran the full derivation — catch
            # it here and skip the wasted Spark work (r12 close
            # review, pass 2)
            return snapshot_id
        try:
            return attempt(parent)
        except ConcurrentPublishError:
            if i == retries:
                raise
            _scrub_lost_attempt(root, snapshot_id, parent)
    raise AssertionError("unreachable: every attempt returns or raises")


def merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    key_col: str,
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
    mode: str = "cow",
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
    deterministic (every table format demands it of MERGE batches).

    CONCURRENCY (r12b — the Delta/Iceberg OCC retry loop): a merge
    that loses the pointer race to an interloping commit auto-REBASES
    up to ``rebase_retries`` times (default ``_REBASE_RETRIES``):
    re-read the fresh current, RE-DERIVE survivors against it, and
    re-commit. Re-derivation IS the conflict resolution — the retry
    re-executes the merge on the winner's result, so the outcome
    equals the serial order "winner, then this merge": a concurrent
    append's rows are seen (and updated if their keys match the
    batch); a concurrent merge's result is merged into last-writer-
    wins per key. ``rebase_retries=0`` restores raise-to-caller
    (``ConcurrentPublishError``). Exhaustion re-raises.

    ``mode="mor"`` (r13 — Delta's deletion-vector MERGE shape): mask
    the matched rows' positions with vectors and APPEND the batch as
    new files — no parent file rewritten, commit write cost sized to
    the BATCH. Same logical result as COW (pinned by test), same OCC
    loop and token; the right mode for scattered-key CDC batches
    against huge clustered tables, where COW's touched set degrades
    toward a full rewrite. See ``_merge_mor_pinned``."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"merge_upsert mode must be 'cow' or 'mor', got {mode!r}")
    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries

    def attempt(parent):
        if parent is None:
            # Empty table: a plain publish, PINNED to "derived from no
            # parent" (_NO_PARENT) — a concurrent first-writer landing
            # between our current_snapshot() read and publish's own
            # pointer read raises ConcurrentPublishError at the
            # pre-check, and the rebase loop re-enters through the
            # real merge path against it. (parent_check alone only
            # fires when the CAS itself loses, i.e. commits landing
            # AFTER publish's pointer read — ADVICE r12 #1.)
            return publish(
                df, root, snapshot_id=snapshot_id,
                _require_parent=_NO_PARENT,
            )
        pm = _manifest(root, parent)
        if mode == "mor":
            return _merge_mor_pinned(
                spark, df, root, key_col, snapshot_id, pm
            )
        return _merge_upsert_pinned(
            spark, df, root, key_col, snapshot_id, pm,
            pm.get("files_meta", {}),
        )

    df = df.persist()
    try:
        return _occ_loop(root, snapshot_id, retries, attempt)
    finally:
        df.unpersist()


def _merge_mor_pinned(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    key_col: str,
    snapshot_id: str | None,
    pm: dict,
) -> str:
    """Merge-on-read MERGE (Delta's DV-backed MERGE shape): matched
    rows' positions are MASKED with deletion vectors and the whole
    batch is APPENDED as new data files — no parent file is rewritten,
    so the commit's write cost is sized to the BATCH, not the touched
    files. The logical result is exactly the COW merge's (masked old
    rows ≡ anti-joined-away rows; appended batch ≡ unioned batch);
    ``tests/test_mor_delete.py`` pins the equivalence row-for-row.

    At 100 TB this is the CDC-ingest shape: a stream of small upsert
    batches against a huge clustered table pays per-batch cost even
    when the batch's keys scatter across thousands of files — the case
    where COW's touched-set rewrite degrades to a near-full-table
    write. Read-side cost is the usual vector anti-join until
    ``purge_deletes``/``compact_snapshot`` absorbs; the batch's new
    files carry zone maps so later reads and merges stay prunable."""
    from pyspark.sql import functions as F

    meta = pm.get("files_meta", {})
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    data_dir, man_dir, _ = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    staged = os.path.join(data_dir, sid)
    # guard FIRST, Spark work after (third r13 review: the delete path
    # already ordered it this way) — a replay of a committed-then-
    # reaped token must not pay the contract aggregation
    if os.path.isdir(staged) and _prefix_live(root, sid):
        return sid  # committed, superseded, manifest reaped: no-op
    _merge_contract_checks(df, pm, key_col)
    keys = df.select(key_col).distinct()
    # zone-map targeting, same as the COW path (third r13 review): the
    # position scan reads only the files whose stats CAN contain a
    # batch key — on a clustered table the scan is batch-localized,
    # not table-sized (shared with merge_apply via _mor_mask_hits)
    assoc, dv_tmp = _mor_mask_hits(spark, root, pm, keys, key_col, staged)
    # the batch write pays the same file-count bound as MOR UPDATE
    # (r14 review, same class): a 200-shuffle-partition CDC batch
    # would otherwise land 200 tiny files on EVERY epoch commit.
    # df.count() reads the cache merge_upsert pinned; range-clustering
    # on the key keeps the appended files' zone maps selective.
    batch = _sized_batch(df, df.count(), meta, key_col)
    return _mor_mask_append_commit(
        root, sid, pm, staged, dv_tmp, assoc, batch,
        "merge_upsert(mor)", "merge",
    )


def _stats_cols(meta: dict) -> list[str]:
    """Every column any file's zone map records — THE one definition
    of the stats-column derivation (r14 review found it copied across
    the DML verbs; r15 consolidated the remaining COW/compact inline
    copies while their manifest witnesses were in-window, VERDICT r14
    #2). All write paths — MOR mask-and-append, COW merge/delete/
    update rewrites, compaction — derive the recorded columns here."""
    return sorted({c for m in meta.values() for c in m.get("stats", {})})


def _sized_batch(df: DataFrame, rows: int, meta: dict, cluster_col):
    """Bound an appended batch's FILE COUNT to its ROW count: size the
    output like the table's own files (average rows/file from manifest
    metadata; 1M-row default on stat-less tables, 256-file cap) so a
    mask-and-append commit can never strew scan-partition-count tiny
    files (r14 review). ``cluster_col`` range-clusters the output so
    the new files carry selective zone maps — round-robin would give
    every appended file the full key range and poison later pruning.
    The shuffle this costs is batch-sized."""
    per_file = [m["rows"] for m in meta.values() if m.get("rows")]
    target = max(1, sum(per_file) // len(per_file)) if per_file else 1_000_000
    n_out = min(256, max(1, -(-rows // target)))
    if cluster_col is not None:
        return df.repartitionByRange(n_out, cluster_col)
    return df.repartition(n_out)


def _mor_mask_append_commit(
    root: str,
    sid: str,
    pm: dict,
    staged: str,
    dv_tmp: str,
    assoc: list,
    batch: DataFrame | None,
    op_label: str,
    verb: str,
) -> str:
    """The shared mask-and-append commit tail of the MOR MERGE and MOR
    UPDATE (one definition — r14 review: the two verbs had ~45
    duplicated lines, exactly the DML-divergence class the r13
    extractions closed for vector loading): stage ``batch`` as the
    appended data files, move the freshly written vector parts in
    beside them under dv- names, harvest zone maps for the new files,
    extend the parent's delete map, precheck the pointer against the
    derivation parent, and CAS-commit the parent's file list verbatim
    plus the appends."""
    parent = pm["snapshot_id"]
    meta = pm.get("files_meta", {})
    # stage the BATCH as the appended data files, then move the
    # vectors in beside them under dv- names (the overwrite clears any
    # prior attempt's residue first, so the move must come after).
    # batch=None = mask-only commit (merge_apply's pure-delete case):
    # no data file is written at all, not even a 0-row part.
    if batch is not None:
        batch.write.mode("overwrite").parquet(staged)
    else:
        shutil.rmtree(staged, ignore_errors=True)  # prior-attempt residue
        os.makedirs(staged, exist_ok=True)
    for p in os.listdir(dv_tmp):
        if p.endswith(".parquet"):
            os.replace(
                os.path.join(dv_tmp, p), os.path.join(staged, f"dv-{p}")
            )
    shutil.rmtree(dv_tmp, ignore_errors=True)
    data_files = sorted(
        f for f in os.listdir(staged)
        if f.endswith(".parquet") and not f.startswith("dv-")
    )
    new_files = [os.path.join(_DATA, sid, f) for f in data_files]
    stats_cols = _stats_cols(meta) or None
    new_meta = (
        {
            os.path.join(_DATA, sid, f): _file_stats(
                os.path.join(staged, f), stats_cols
            )
            for f in data_files
        }
        if stats_cols
        else {}
    )
    merged = _merge_dv_entries(
        pm, assoc,
        lambda p: os.path.join(_DATA, sid, f"dv-{p}"),
        f"{op_label} at {root!r}",
    )
    pin = _mor_pointer_precheck(root, sid, parent, verb)
    if pin is None:
        return sid  # a same-token twin finished this commit
    observed_gen, observed = pin
    return _commit_staged(
        root,
        sid,
        new_files,
        new_meta=new_meta,
        append=False,
        parent_check=True,
        inherit_files=list(pm["files"]),
        inherit_meta=dict(meta),
        observed_gen=observed_gen,
        observed=observed,
        schema=pm.get("schema"),
        deletes=merged,
    )


def _key_touched_files(
    keys: DataFrame, key_col: str, pm: dict, meta: dict
) -> list[str]:
    """Parent files whose zone maps CAN contain any batch key — the
    shared targeting of the COW merge's rewrite set and the MOR
    merge's position scan (third r13 review: the MOR path was
    full-scanning). Per-file check against the key SET, not its global
    range: a single far-away insert key would otherwise widen
    [min, max] to cover every file. CDC batches are driver-bounded by
    nature; past the cap, fall back to the range check (conservative —
    more files scanned/rewritten, never wrongness). Files without
    stats are conservatively included."""
    import bisect

    from pyspark.sql import functions as F

    key_cap = 100_000
    sample = [r[0] for r in keys.limit(key_cap + 1).collect()]
    key_sorted = sorted(sample) if len(sample) <= key_cap else None
    lo = hi = None
    if key_sorted is None:
        b = keys.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        lo, hi = b["lo"], b["hi"]

    def touched(rel: str) -> bool:
        fm = meta.get(rel, {})
        nc = fm.get("nulls", {}).get(key_col)
        if nc is not None and nc == fm.get("rows"):
            return False  # key provably all-NULL: no batch key matches
        st = fm.get("stats", {}).get(key_col)
        if st is None:
            return True  # no stats -> must assume it can match
        if key_sorted is not None:
            i = bisect.bisect_left(key_sorted, st[0])
            return i < len(key_sorted) and key_sorted[i] <= st[1]
        return lo is not None and st[1] >= lo and st[0] <= hi

    return [f for f in pm["files"] if touched(f)]


def _collect_dv_assoc(spark: SparkSession, dv_dir: str) -> list:
    """Read back a freshly staged vector directory and return the
    driver-bounded per-data-file association: [(f, n, [part names])].
    One definition for both MOR verbs (third r13 review)."""
    from pyspark.sql import functions as F

    back = spark.read.schema("f string, pos long").parquet(dv_dir)
    return (
        back.groupBy("f")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(
                F.collect_set(
                    F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
                )
            ).alias("parts"),
        )
        .collect()
    )


def _merge_dv_entries(pm: dict, assoc: list, rel_of_part, op: str) -> dict:
    """The parent's deletes map extended with a commit's new vector
    entries (``rel_of_part`` maps a staged part NAME to its final
    manifest-relative path). Validates every matched file against the
    parent manifest — a mapping miss is out-of-contract, never
    silently recorded."""
    from urllib.parse import unquote

    known = set(pm["files"])
    merged = {f: dict(e) for f, e in (pm.get("deletes") or {}).items()}
    for r in assoc:
        f = unquote(r["f"])
        if f not in known:
            raise RuntimeError(
                f"{op}: matched file {f!r} is not in the parent "
                "manifest — file-name mapping is out of contract"
            )
        entry = merged.setdefault(f, {"dv": [], "rows": 0})
        entry["dv"] = list(entry["dv"]) + [rel_of_part(p) for p in r["parts"]]
        entry["rows"] = entry["rows"] + r["n"]
    return merged


def _mor_pointer_precheck(root: str, sid: str, parent: str, op: str):
    """The MOR commit's derivation pin: returns (gen, observed) for
    the CAS, None if a same-token twin already finished the commit,
    and raises ConcurrentPublishError if an interloper moved the
    pointer past the derivation parent."""
    observed_gen, observed = _read_pointer(root)
    if observed == sid:
        return None  # a same-token twin finished this commit
    if observed != parent:
        raise ConcurrentPublishError(
            f"concurrent publish detected at {root!r}: this {op}'s "
            f"positions were derived from {parent!r} but current is "
            f"{observed!r}; re-derive on top of the new current snapshot"
        )
    return observed_gen, observed


def _merge_contract_checks(df: DataFrame, pm: dict, key_col: str) -> None:
    """The MERGE batch contract, shared by the COW and MOR paths:
    batch columns must equal the recorded table schema exactly (every
    format's rule — a narrower batch would record a narrower schema /
    hide carried columns), shared names must have IDENTICAL types (no
    implicit casts, ever — a widened batch type would be recorded as
    the table contract and bind carried files' parquet wrongly), and
    source keys must be unique (duplicated batch keys would land as
    duplicated TABLE rows — fail loudly, never corrupt)."""
    from pyspark.sql import functions as F

    pschema = pm.get("schema")
    if pschema is not None:
        want = {f["name"]: f["type"] for f in pschema["fields"]}
        # raw df.columns, not a dict: a dict would collapse DUPLICATE
        # batch column names and let them through to a confusing
        # AnalysisException downstream (r12 close review, pass 2)
        if sorted(df.columns) != sorted(want):
            raise ValueError(
                f"merge_upsert batch columns {sorted(df.columns)} != "
                f"table schema columns {sorted(want)} at the manifest root"
            )
        got = {
            f["name"]: f["type"] for f in df.schema.jsonValue()["fields"]
        }
        clash = [
            c for c in want
            if _type_fingerprint(got[c]) != _type_fingerprint(want[c])
        ]
        if clash:
            raise ValueError(
                f"merge_upsert batch type mismatch on {clash} (batch "
                f"{[got[c] for c in clash]} vs table "
                f"{[want[c] for c in clash]}) — no implicit casts; "
                "align the types explicitly"
            )
    counts = df.agg(
        F.count("*").alias("n"), F.countDistinct(key_col).alias("d")
    ).first()
    if counts["n"] != counts["d"]:
        raise ValueError(
            f"merge_upsert batch has duplicate {key_col!r} values "
            f"({counts['n']} rows, {counts['d']} distinct)"
        )


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

    pschema = pm.get("schema")
    _merge_contract_checks(df, pm, key_col)
    keys = df.select(key_col).distinct()
    touched_rel = _key_touched_files(keys, key_col, pm, meta)
    carried = [f for f in pm["files"] if f not in set(touched_rel)]
    if touched_rel:
        # bind to the parent's recorded schema (when present) so a
        # merge against an EVOLVED lineage reads every survivor column
        # — including ones the touched files predate (as NULL) — and
        # the unionByName with the batch stays total; a LEGACY lineage
        # gets the footer-union read so heterogeneous survivors keep
        # every column they physically hold
        old_rows = _apply_deletes(
            spark, root, pm,
            _manifest_reader(spark, pm, legacy_union=True).parquet(
                *[os.path.join(root, f) for f in touched_rel]
            ),
            files=touched_rel,
        )
        survivors = old_rows.join(keys, key_col, "left_anti")
        # On a RECORDED lineage the contract check above guarantees
        # the column sets match and this is a plain union. On a LEGACY
        # lineage there is no contract, so the footer-union survivors
        # may carry columns the batch lacks (and vice versa) —
        # allowMissingColumns fills either side with NULL, which is
        # the merge semantics a schema-less table can honestly offer
        # (r12 close review, pass 2: the strict union crashed here).
        staged_df = survivors.unionByName(
            df, allowMissingColumns=pschema is None
        )
    else:
        # No file touched: the batch alone is staged. Bind its COLUMN
        # ORDER to the parent's recorded schema — the contract check
        # above is order-insensitive (sorted()), and the touched-file
        # path records the parent's order (unionByName keeps the
        # survivor side) — so without this select the table's recorded
        # field order would churn nondeterministically across merges
        # depending on whether any file was touched (ADVICE r12 #3).
        staged_df = (
            df.select([f["name"] for f in pschema["fields"]])
            if pschema is not None
            else df
        )
    stats_cols = _stats_cols(meta) or None
    dels = pm.get("deletes") or {}
    return publish(
        staged_df,
        root,
        snapshot_id=snapshot_id,
        stats_cols=stats_cols,
        _inherit_files=carried,
        _inherit_meta={f: meta[f] for f in carried if f in meta},
        # carried files keep their deletion vectors (the rewritten
        # touched files materialized theirs via the masked read above)
        _inherit_deletes={f: dels[f] for f in carried if f in dels},
        # the survivor rows and carried file list were derived from
        # pm's snapshot: commit conditionally on it (r12 — a racing
        # commit between our derivation read and the pointer CAS must
        # surface, not be clobbered by stale derivations)
        _require_parent=pm["snapshot_id"],
        _record_schema=pschema is not None,
    )


def _annotated_scan(
    spark: SparkSession,
    root: str,
    pm: dict,
    rel_files: list[str],
    rc: str,
    pc: str,
) -> DataFrame:
    """The DML derivation scan: ``pm``'s listed ``rel_files`` with two
    scratch columns — ``rc`` (manifest-relative file path) and ``pc``
    (parquet row position) — projected AT SCAN TIME, then the
    snapshot's deletion vectors anti-joined away. Projecting the
    ``_metadata`` fields before any join matters: the hidden column
    resolves only against the file-source relation, so every DML
    operation derives (file, position) identity here, first, and then
    composes joins/filters freely."""
    from pyspark.sql import functions as F

    ann = (
        _manifest_reader(spark, pm, legacy_union=True)
        .parquet(*[os.path.join(root, f) for f in rel_files])
        .withColumn(rc, _rel_file_expr())
        .withColumn(pc, F.col("_metadata.row_index"))
    )
    dels = pm.get("deletes") or {}
    scanned = set(rel_files)
    dels = {f: e for f, e in dels.items() if f in scanned}
    return _dv_anti_join(spark, root, dels, ann, rc, pc)


# Data files a MOR delete's position shuffle lands in — per-commit
# deletion-vector file count. Positions hash-cluster by DATA FILE, so
# each data file's positions live in exactly ONE DV file and the
# manifest records that exact association (a pruned read fetches only
# the DV files covering its slice). Commit cost stays matched-rows-
# sized; raise for commits deleting billions of positions.
_DV_FILES = 4


def delete_where(
    spark: SparkSession,
    root: str,
    predicate: str,
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
    mode: str = "cow",
) -> str:
    """Row-level DELETE — the third leg of the DML triad next to
    ``merge_upsert`` (MERGE) and ``compact_snapshot`` (OPTIMIZE). Rows
    where ``predicate`` (a Spark SQL boolean expression) evaluates
    TRUE are removed; rows where it is NULL are KEPT (SQL DELETE
    semantics — a null predicate does not match). A predicate matching
    nothing commits NOTHING — the parent snapshot stays current
    (documented no-op, returns the parent id).

    ``mode="cow"`` (copy-on-write, the default): touched-file
    targeting is exact, not stats-approximate — one scan of the
    snapshot (deletion-vector-masked, so already-deleted rows never
    count) collects the DISTINCT files containing matching rows,
    driver-bounded by files-per-snapshot. Only those files are
    rewritten (surviving rows restaged); every other file carries over
    by reference — WITH its deletion-vector entries, while the
    rewritten files' entries drop (their rewrite materializes the
    mask). The write is sized to the TOUCHED FILES.

    ``mode="mor"`` (merge-on-read, r13 — Delta deletion vectors /
    Iceberg positional deletes): no data file is rewritten at all. The
    matched rows' (file, position) pairs are staged as parquet
    deletion-vector sidecars under the new snapshot's prefix and the
    commit records, per touched data file, WHICH DV file masks it plus
    the masked row count. Readers anti-join the positions away
    (``_apply_deletes``); ``compact_snapshot`` absorbs the vectors
    back into clean files. The write is sized to the MATCHED ROWS —
    the scattered-delete case (GDPR ``id IN …`` touching thousands of
    files for a few thousand rows) commits in seconds where COW
    rewrites terabytes. That asymmetry is measured in
    ``scripts/manifest_scale.py``.

    At 100 TB: cluster on the delete column and COW's touched set is
    the few files whose range covers the predicate — the right mode
    for range deletes (retention drops). For scattered deletes, MOR's
    commit cost is matched-rows-sized by construction; its read-side
    cost is one matched-rows-sized anti-join until the next OPTIMIZE.
    Pick per workload; both compose (a COW delete after MOR deletes
    carries the untouched files' vectors).

    CONCURRENCY: same OCC rebase loop as merge_upsert — a lost pointer
    race re-derives against the fresh current, up to
    ``rebase_retries`` (0 restores raise-to-caller); ``snapshot_id``
    is the exactly-once replay token. The no-match no-op is returned
    WITHOUT a CAS, which is still linearizable: a concurrent commit
    adding matching rows after our read serializes AFTER this (empty)
    delete — exactly the outcome the parent-id return describes."""
    from pyspark.sql import functions as F

    if mode not in ("cow", "mor"):
        raise ValueError(f"delete_where mode must be 'cow' or 'mor', got {mode!r}")
    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries

    def attempt(parent):
        if parent is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        pm = _manifest(root, parent)
        tag = uuid.uuid4().hex[:8]
        rc, pc = f"_dml_rel_{tag}", f"_dml_pos_{tag}"
        ann = _annotated_scan(spark, root, pm, pm["files"], rc, pc)
        if mode == "mor":
            return _delete_mor_pinned(
                spark, ann, root, predicate, snapshot_id, pm, rc, pc
            )
        return _delete_cow_pinned(
            spark, ann, root, predicate, snapshot_id, pm, rc
        )

    return _occ_loop(root, snapshot_id, retries, attempt)


def _delete_cow_pinned(
    spark: SparkSession,
    ann: DataFrame,
    root: str,
    predicate: str,
    snapshot_id: str | None,
    pm: dict,
    rc: str,
) -> str:
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    meta = pm.get("files_meta", {})
    dels = pm.get("deletes") or {}
    # _metadata.file_path is URL-encoded (a space is %20): decode
    # before matching against the manifest's raw relative paths
    hit_rel = {
        unquote(r["f"])
        for r in ann.where(predicate)
        .select(F.col(rc).alias("f"))
        .distinct()
        .collect()
    }
    touched_rel = [f for f in pm["files"] if f in hit_rel]
    if len(touched_rel) != len(hit_rel):
        raise RuntimeError(
            f"delete_where at {root!r}: {len(hit_rel)} hit files "
            f"resolved to {len(touched_rel)} manifest entries — "
            "file-name mapping is out of contract"
        )
    if not touched_rel:
        return pm["snapshot_id"]  # nothing matched: table unchanged
    touched = set(touched_rel)
    carried = [f for f in pm["files"] if f not in touched]
    # second scan over ONLY the touched files (file-list pruning in
    # the plan itself, not a post-scan filter on the derived path
    # column), deletion-vector-masked so previously MOR-deleted rows
    # are never resurrected into the rewrite
    tag2 = uuid.uuid4().hex[:8]
    rc2, pc2 = f"_dml_rel_{tag2}", f"_dml_pos_{tag2}"
    survivors = (
        _annotated_scan(spark, root, pm, touched_rel, rc2, pc2)
        .where(~F.coalesce(F.expr(predicate), F.lit(False)))
        .drop(rc2, pc2)
    )
    stats_cols = _stats_cols(meta) or None
    return publish(
        survivors,
        root,
        snapshot_id=snapshot_id,
        stats_cols=stats_cols,
        _inherit_files=carried,
        _inherit_meta={f: meta[f] for f in carried if f in meta},
        # carried files keep their deletion vectors; the rewritten
        # files materialized theirs
        _inherit_deletes={f: dels[f] for f in carried if f in dels},
        _require_parent=pm["snapshot_id"],
        _record_schema=pm.get("schema") is not None,
    )


def _uri_rel(rel: str) -> str:
    """The URL-encoded form of a manifest-relative path, as
    ``_metadata.file_path``'s last components will render it."""
    from urllib.parse import quote

    return quote(rel, safe="/")


def _delete_mor_pinned(
    spark: SparkSession,
    ann: DataFrame,
    root: str,
    predicate: str,
    snapshot_id: str | None,
    pm: dict,
    rc: str,
    pc: str,
) -> str:
    from pyspark.sql import functions as F

    parent = pm["snapshot_id"]
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    data_dir, man_dir, _ = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    staged = os.path.join(data_dir, sid)
    if os.path.isdir(staged) and _prefix_live(root, sid):
        # replay of a committed token whose manifest vacuum reaped but
        # whose deletion vectors still mask live files: rewriting (or,
        # on a now-empty match, rmtree'ing) data/<sid> would destroy
        # vectors the CURRENT manifest resolves — the reference proves
        # the commit landed; no-op (r13 review)
        return sid
    # one shuffle sized to the MATCHED ROWS: positions hash-cluster by
    # data file so each file's mask lives in exactly one DV sidecar
    hits = (
        ann.where(predicate)
        .select(F.col(rc).alias("f"), F.col(pc).alias("pos"))
        .repartition(_DV_FILES, "f")
    )
    hits.write.mode("overwrite").parquet(staged)
    assoc = _collect_dv_assoc(spark, staged)
    if not assoc:
        shutil.rmtree(staged, ignore_errors=True)
        return parent  # nothing matched: table unchanged, no commit
    merged = _merge_dv_entries(
        pm, assoc,
        lambda p: os.path.join(_DATA, sid, p),
        f"delete_where(mor) at {root!r}",
    )
    pin = _mor_pointer_precheck(root, sid, parent, "delete")
    if pin is None:
        return sid  # a same-token twin finished this commit
    observed_gen, observed = pin
    return _commit_staged(
        root,
        sid,
        [],  # NO data files added: the commit is vectors + metadata
        new_meta={},
        append=False,
        parent_check=True,
        inherit_files=list(pm["files"]),
        inherit_meta=dict(pm.get("files_meta", {})),
        observed_gen=observed_gen,
        observed=observed,
        schema=pm.get("schema"),
        deletes=merged,
    )


def purge_deletes(
    spark: SparkSession,
    root: str,
    min_masked_fraction: float = 0.0,
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
) -> str:
    """REORG: materialize deletion vectors back into clean data files
    by rewriting ONLY the masked files (Delta's ``REORG TABLE … APPLY
    (PURGE)``) — the targeted middle ground between leaving vectors to
    accumulate read-side anti-join cost and ``compact_snapshot``'s
    whole-table rewrite. Files whose masked fraction (vector rows /
    file rows, from the manifest's own metadata — zero footer I/O) is
    at least ``min_masked_fraction`` are rewritten with their masks
    applied; every other file — unmasked, or masked below the
    threshold — carries by reference, keeping its vectors. The default
    0.0 purges every masked file; 0.3 is the "mostly-dead files only"
    sweep a retention pipeline runs nightly. A table with no vectors
    (or none over threshold) is the documented no-op (parent id, no
    commit). A masked file with NO recorded row count purges
    conservatively (fraction treated as 1.0 — correctness never
    depends on optional stats).

    At 100 TB: write cost is sized to the files you CHOOSE to clean,
    and the choice is made from manifest metadata alone. Same OCC
    rebase loop and exactly-once ``snapshot_id`` token as every other
    DML verb."""
    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries

    def attempt(parent):
        if parent is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        pm = _manifest(root, parent)
        dels = pm.get("deletes") or {}
        if not dels:
            return parent  # nothing masked: the table is already clean
        meta = pm.get("files_meta", {})

        def masked_fraction(f: str) -> float:
            rows = meta.get(f, {}).get("rows")
            if not rows:
                return 1.0  # no row count recorded: purge conservatively
            return dels[f]["rows"] / rows

        touched_rel = [
            f for f in pm["files"]
            if f in dels and masked_fraction(f) >= min_masked_fraction
        ]
        if not touched_rel:
            return parent  # every mask is below the threshold
        carried = [f for f in pm["files"] if f not in set(touched_rel)]
        tag = uuid.uuid4().hex[:8]
        rc, pc = f"_dml_rel_{tag}", f"_dml_pos_{tag}"
        survivors = _annotated_scan(
            spark, root, pm, touched_rel, rc, pc
        ).drop(rc, pc)
        stats_cols = _stats_cols(meta) or None
        return publish(
            survivors,
            root,
            snapshot_id=snapshot_id,
            stats_cols=stats_cols,
            _inherit_files=carried,
            _inherit_meta={f: meta[f] for f in carried if f in meta},
            _inherit_deletes={f: dels[f] for f in carried if f in dels},
            _require_parent=parent,
            _record_schema=pm.get("schema") is not None,
        )

    return _occ_loop(root, snapshot_id, retries, attempt)


def _check_set_columns(set_exprs: dict, data_cols: list[str]) -> None:
    """UPDATE's SET contract, shared by the COW and MOR arms: only
    existing columns may be named — UPDATE never adds columns."""
    unknown = sorted(set(set_exprs) - set(data_cols))
    if unknown:
        raise ValueError(
            f"update_where SET names columns {unknown} not in the "
            f"table (columns: {data_cols}) — UPDATE cannot add "
            "columns; use merge_schema on an append for evolution"
        )


def _apply_set_exprs(df, set_exprs: dict, data_cols: list[str], cond):
    """Project ``data_cols`` with each SET expression applied where
    ``cond`` holds (evaluated against the PRE-update row — standard
    SQL UPDATE semantics; ``{"a": "b", "b": "a"}`` swaps), enforcing
    the module-wide no-implicit-casts rule: an expression that changes
    the column's exact type is refused (a widened type would be
    recorded as the table contract and bind every carried file's
    parquet to the wrong type). One definition for both arms so the
    when/otherwise type coercion can never diverge between them."""
    from pyspark.sql import functions as F

    updated = df.select(
        *[
            (
                F.when(cond, F.expr(set_exprs[c]))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
            )
            for c in data_cols
        ]
    )
    before = {
        f.name: f.dataType for f in df.schema.fields if f.name in set_exprs
    }
    clash = [
        c for c, t in before.items() if updated.schema[c].dataType != t
    ]
    if clash:
        raise ValueError(
            f"update_where SET changes column types on {clash} "
            f"({[str(updated.schema[c].dataType) for c in clash]} vs "
            f"table {[str(before[c]) for c in clash]}) — no implicit "
            "casts; cast explicitly in the expression"
        )
    return updated


def update_where(
    spark: SparkSession,
    root: str,
    predicate: str,
    set_exprs: dict[str, str],
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
    mode: str = "cow",
) -> str:
    """Row-level ``UPDATE … SET … WHERE …`` as a manifest commit.
    Rows where ``predicate`` evaluates TRUE get each ``set_exprs``
    column replaced by its Spark SQL expression (evaluated against the
    PRE-update row, standard SQL UPDATE semantics — ``{"a": "b",
    "b": "a"}`` swaps); rows where it is NULL or FALSE are untouched.
    A predicate matching nothing is the documented no-op (parent id
    returned, no commit).

    ``mode="cow"`` (default) is ``delete_where``'s touched-file
    machinery with a column rewrite instead of a row drop: only files
    containing matching rows are rewritten; every other file carries
    over by reference with its deletion-vector entries intact. Write
    cost = the TOUCHED FILES.

    ``mode="mor"`` (VERDICT r13 #4) is ``_merge_mor_pinned``'s
    mask-and-append machinery keyed by the predicate instead of a
    batch join: the matched positions are masked with deletion-vector
    sidecars and the updated versions of exactly those rows are
    appended as new data files — no parent file is rewritten, so the
    commit's write cost is sized to the MATCHED ROWS. The scattered
    small update (a handful of rows across thousands of clustered
    files — where COW degrades toward a full-table rewrite) commits at
    rows-matched cost; read-side pays the usual vector anti-join until
    ``purge_deletes``/``compact_snapshot`` absorbs. Result is pinned
    row-for-row ≡ the COW update in tests/test_mor_delete.py.

    ``set_exprs`` may only name EXISTING columns and each expression
    must preserve the column's exact type — no implicit casts, ever
    (the module-wide rule). Cast explicitly if you mean it.

    CONCURRENCY: the same OCC rebase loop and exactly-once
    ``snapshot_id`` token as the other DML verbs; a lost pointer race
    re-derives the matched set against the fresh current."""
    from pyspark.sql import functions as F

    if mode not in ("cow", "mor"):
        raise ValueError(f"update_where mode must be cow|mor, got {mode!r}")
    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries

    def attempt(parent):
        from urllib.parse import unquote

        if parent is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        pm = _manifest(root, parent)
        if mode == "mor":
            return _update_mor_pinned(
                spark, root, predicate, set_exprs, snapshot_id, pm
            )
        meta = pm.get("files_meta", {})
        dels = pm.get("deletes") or {}
        tag = uuid.uuid4().hex[:8]
        rc, pc = f"_dml_rel_{tag}", f"_dml_pos_{tag}"
        ann = _annotated_scan(spark, root, pm, pm["files"], rc, pc)
        data_cols = [c for c in ann.columns if c not in (rc, pc)]
        _check_set_columns(set_exprs, data_cols)
        hit_rel = {
            unquote(r["f"])
            for r in ann.where(predicate)
            .select(F.col(rc).alias("f"))
            .distinct()
            .collect()
        }
        touched_rel = [f for f in pm["files"] if f in hit_rel]
        if len(touched_rel) != len(hit_rel):
            raise RuntimeError(
                f"update_where at {root!r}: {len(hit_rel)} hit files "
                f"resolved to {len(touched_rel)} manifest entries — "
                "file-name mapping is out of contract"
            )
        if not touched_rel:
            return parent  # nothing matched: the table is unchanged
        carried = [f for f in pm["files"] if f not in set(touched_rel)]
        rewrite = _annotated_scan(spark, root, pm, touched_rel, rc, pc)
        cond = F.coalesce(F.expr(predicate), F.lit(False))
        updated = _apply_set_exprs(rewrite, set_exprs, data_cols, cond)
        stats_cols = _stats_cols(meta) or None
        return publish(
            updated,
            root,
            snapshot_id=snapshot_id,
            stats_cols=stats_cols,
            _inherit_files=carried,
            _inherit_meta={f: meta[f] for f in carried if f in meta},
            _inherit_deletes={f: dels[f] for f in carried if f in dels},
            _require_parent=parent,
            _record_schema=pm.get("schema") is not None,
        )

    return _occ_loop(root, snapshot_id, retries, attempt)


def _update_mor_pinned(
    spark: SparkSession,
    root: str,
    predicate: str,
    set_exprs: dict,
    snapshot_id: str | None,
    pm: dict,
) -> str:
    """Merge-on-read UPDATE against a PINNED parent manifest: mask the
    matched positions with deletion-vector sidecars, append the
    updated versions of exactly those rows as new data files — the
    ``_merge_mor_pinned`` shape with the matched set coming from the
    predicate instead of a batch key join. The parent's file list
    carries verbatim; the commit's write cost is the matched rows.

    Scan-side pruning note: the matched-row scan is a single pass over
    the parent's files with ``predicate`` pushed into the parquet
    reader (row-group stats skip non-matching groups); there is no
    manifest-level zone-map prefilter here because the predicate is
    arbitrary SQL, not a key set — the pushed filter is what bounds
    the read. The matched frame is persisted (matched-rows-sized) so
    the vector write and the updated-batch write share one scan."""
    from pyspark.sql import functions as F

    parent = pm["snapshot_id"]
    meta = pm.get("files_meta", {})
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    data_dir, man_dir, _ = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    staged = os.path.join(data_dir, sid)
    # guard FIRST, Spark work after: a replay of a committed-then-
    # reaped token must not pay the matched-row scan
    if os.path.isdir(staged) and _prefix_live(root, sid):
        return sid  # committed, superseded, manifest reaped: no-op
    tag = uuid.uuid4().hex[:8]
    rc, pc = f"_dml_rel_{tag}", f"_dml_pos_{tag}"
    ann = _annotated_scan(spark, root, pm, pm["files"], rc, pc)
    data_cols = [c for c in ann.columns if c not in (rc, pc)]
    _check_set_columns(set_exprs, data_cols)
    matched = ann.where(predicate).persist()
    try:
        dv_tmp = f"{staged}.dvtmp"
        (
            matched.select(F.col(rc).alias("f"), F.col(pc).alias("pos"))
            .repartition(_DV_FILES, "f")
            .write.mode("overwrite")
            .parquet(dv_tmp)
        )
        assoc = _collect_dv_assoc(spark, dv_tmp)
        if not assoc:  # nothing matched: the table is unchanged
            shutil.rmtree(dv_tmp, ignore_errors=True)
            return parent
        # every row in `matched` satisfies the predicate, so the gate
        # is constant-true — routed through the same when/otherwise as
        # the COW arm so type coercion cannot diverge between modes
        updated = _apply_set_exprs(
            matched, set_exprs, data_cols, F.lit(True)
        )
        # bound the appended FILE COUNT to the batch, not the scan
        # (r14 review): `matched` inherits the table-sized scan
        # partitioning, so a scattered predicate would otherwise emit
        # ~one row-sized file per scan partition — table-sized small-
        # file debris on a matched-rows-sized commit. Cluster on the
        # table's recorded stats column so the appended files keep
        # selective zone maps; the shuffle is matched-rows-sized.
        sc = _stats_cols(meta)
        batch = _sized_batch(
            updated, sum(r["n"] for r in assoc), meta,
            sc[0] if sc else None,
        )
        return _mor_mask_append_commit(
            root, sid, pm, staged, dv_tmp, assoc, batch,
            "update_where(mor)", "update",
        )
    finally:
        matched.unpersist()


def merge_apply(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    key_col: str,
    delete_col: str = "_delete",
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
    return_status: bool = False,
) -> str | tuple[str, bool]:
    """MERGE with deletes in ONE merge-on-read commit (Delta's
    ``WHEN MATCHED [AND cond] DELETE`` / the CDC-apply primitive,
    r14): ``batch`` carries the table's full schema plus a boolean
    ``delete_col``. Every batch key's current position is MASKED with
    deletion vectors (zone-map-targeted scan, same machinery as the
    MOR merge); only the NON-delete rows are appended. The result
    equals delete-then-upsert, in one atomic snapshot and at
    batch-sized write cost — exactly what applying a change-feed
    micro-batch to a downstream replica needs
    (``streaming.commit_log.apply_table_changes`` is that glue).

    Contract: batch keys unique; batch-minus-flag columns must equal
    the recorded table schema exactly (the shared MERGE contract);
    ``delete_col`` must be BOOLEAN and non-NULL. Deleting an absent
    key is a no-op (its position scan finds nothing); an EMPTY batch
    is the documented no-op (parent id, no commit). Same OCC rebase
    loop and exactly-once ``snapshot_id`` token as every DML verb.

    ``return_status=True`` returns ``(sid, committed)`` where
    ``committed`` says whether THIS CALL minted a new snapshot —
    False on every no-op path (empty batch, nets-to-zero, and the
    tokened replay whose commit already exists). Callers that must
    distinguish "this range minted a commit" from "the head moved"
    (the untokened CDC apply path) need the flag: inferring it from a
    pre-read head races a concurrent writer committing between the
    read and a net-zero apply (ADVICE r14 #1)."""
    from pyspark.sql.types import BooleanType

    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries
    if delete_col not in batch.columns:
        raise ValueError(
            f"merge_apply batch is missing the {delete_col!r} flag column"
        )
    if not isinstance(batch.schema[delete_col].dataType, BooleanType):
        raise ValueError(
            f"merge_apply {delete_col!r} must be BOOLEAN, got "
            f"{batch.schema[delete_col].dataType}"
        )
    # reset by every attempt (OCC may retry); only the path that calls
    # _mor_mask_append_commit sets it True, so replays resolved inside
    # _occ_loop (which never reach attempt) correctly read False
    status = {"committed": False}

    def attempt(parent):
        if parent is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        pm = _manifest(root, parent)
        return _merge_apply_pinned(
            spark, batch, root, key_col, delete_col, snapshot_id, pm,
            _status=status,
        )

    batch_p = batch.persist()
    try:
        out = _occ_loop(root, snapshot_id, retries, attempt)
    finally:
        batch_p.unpersist()
    return (out, status["committed"]) if return_status else out


def _merge_apply_pinned(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    key_col: str,
    delete_col: str,
    snapshot_id: str | None,
    pm: dict,
    _status: dict | None = None,
) -> str:
    """merge_apply against a PINNED parent manifest — the MOR merge
    body with the append side filtered to the non-delete rows.
    ``_status['committed']`` reports whether this attempt minted a
    snapshot (set fresh per attempt: an OCC retry must not inherit a
    prior attempt's verdict)."""
    from pyspark.sql import functions as F

    if _status is not None:
        _status["committed"] = False
    meta = pm.get("files_meta", {})
    sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    data_dir, man_dir, _ = _paths(root)
    os.makedirs(man_dir, exist_ok=True)
    staged = os.path.join(data_dir, sid)
    if os.path.isdir(staged) and _prefix_live(root, sid):
        return sid  # committed, superseded, manifest reaped: no-op
    # one probe job for emptiness + the NULL-flag guard (fourth r14
    # review: two separate limit(1).count() jobs multiplied under the
    # OCC retry loop)
    probe = batch.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col(delete_col).isNull(), 1)).alias("nulls"),
    ).first()
    if probe["n"] == 0:
        return pm["snapshot_id"]  # empty batch: the table is unchanged
    if probe["nulls"]:
        raise ValueError(
            f"merge_apply {delete_col!r} must be non-NULL (TRUE=delete, "
            "FALSE=upsert) — NULL is refused, not guessed"
        )
    try:
        _merge_contract_checks(batch.drop(delete_col), pm, key_col)
    except ValueError as e:
        # the shared check names merge_upsert and sees the batch with
        # the flag already stripped — rewrite so the error points at
        # the call the user actually made (registry-lineage rule: the
        # shared helper itself is not touched)
        raise ValueError(
            str(e).replace("merge_upsert", "merge_apply")
            + f" (the {delete_col!r} flag column is stripped before "
            "this check)"
        ) from None
    keys = batch.select(key_col).distinct()
    assoc, dv_tmp = _mor_mask_hits(
        spark, root, pm, keys, key_col, staged
    )
    upserts = batch.where(~F.col(delete_col)).drop(delete_col)
    n_up = upserts.count()
    if not assoc and n_up == 0:
        # nets to nothing (absent-key deletes only, or a token-less
        # replay whose keys are already gone): the documented DML
        # convention is NO commit — a zero-change snapshot per
        # at-least-once replay would grow the lineage unboundedly
        # (fourth r14 review)
        shutil.rmtree(dv_tmp, ignore_errors=True)
        return pm["snapshot_id"]
    sized = (
        _sized_batch(upserts, n_up, meta, key_col) if n_up else None
    )  # pure-delete batch: mask-only commit, zero data files
    out = _mor_mask_append_commit(
        root, sid, pm, staged, dv_tmp, assoc, sized,
        "merge_apply", "merge",
    )
    if _status is not None:
        _status["committed"] = True
    return out


def _mor_mask_hits(
    spark: SparkSession,
    root: str,
    pm: dict,
    keys: DataFrame,
    key_col: str,
    staged: str,
) -> tuple:
    """The shared mask-derivation prelude of the MOR merge and
    merge_apply (fourth r14 review: it had been copied verbatim):
    zone-map-target the parent files that CAN contain a batch key,
    scan them annotated with (file, position), semi-join to the keys,
    stage the hit positions as vector parquet under ``staged``.dvtmp,
    and return (driver-bounded association, dv_tmp path)."""
    from pyspark.sql import functions as F

    meta = pm.get("files_meta", {})
    scan_rel = _key_touched_files(keys, key_col, pm, meta)
    tag = uuid.uuid4().hex[:8]
    rc, pc = f"_dml_rel_{tag}", f"_dml_pos_{tag}"
    dv_tmp = f"{staged}.dvtmp"
    if scan_rel:
        ann = _annotated_scan(spark, root, pm, scan_rel, rc, pc)
        hits = (
            ann.join(keys, key_col, "left_semi")
            .select(F.col(rc).alias("f"), F.col(pc).alias("pos"))
            .repartition(_DV_FILES, "f")
        )
    else:  # no parent file can match: mask nothing
        hits = spark.createDataFrame([], "f string, pos long")
    hits.write.mode("overwrite").parquet(dv_tmp)
    return _collect_dv_assoc(spark, dv_tmp), dv_tmp


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_files: int,
    snapshot_id: str | None = None,
    rebase_retries: int | None = None,
    zorder_cols: tuple[str, str] | None = None,
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
    for the compacted files.

    ``zorder_cols=(a, b)`` makes this OPTIMIZE ZORDER BY (Delta's
    two-dimensional clustering): the rewrite range-partitions and
    sorts on the bit-interleaved Z key (ddl.zorder_key), so each
    compacted file covers a small rectangle of (a, b) space and the
    re-harvested zone maps prune ``read_pruned`` scans on EITHER
    column — the layout decision that turns a two-predicate 100 TB
    scan into a few-file read. Both columns are force-added to the
    harvested stats. Costs one shuffle (the clustering itself) where
    plain compaction is a coalesce.

    CONCURRENCY (r12b): a commit landing between the compaction's
    parent read and its own commit loses the CAS and auto-REBASES —
    re-read the fresh current, re-run the rewrite on IT, re-commit
    (up to ``rebase_retries``, default ``_REBASE_RETRIES``; 0 restores
    raise-to-caller). Unlike a merge there is no cross-commit
    semantics question: a compaction is content-neutral, so rebasing
    simply compacts the winner's table — the appended rows an r11-era
    lost race would have required the CALLER to re-absorb now survive
    into the compacted snapshot automatically."""
    retries = _REBASE_RETRIES if rebase_retries is None else rebase_retries

    def attempt(parent):
        if parent is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        pm = _manifest(root, parent)
        stats_set = set(_stats_cols(pm.get("files_meta", {})))
        # merge_schema: ignored on recorded lineages (schema wins); on
        # a LEGACY lineage the rewrite must see every column of every
        # file — a plain inferring read would drop whole columns from
        # the compacted table
        df = read_snapshot(spark, root, parent, merge_schema=True)
        if zorder_cols is not None:
            from db_loader_spark.sinks.ddl import zorder_key

            a, b = zorder_cols
            # collision-proof scratch column: a fixed "_zkey" would
            # silently overwrite-and-drop a real column of that name
            zc = f"_zkey_{uuid.uuid4().hex[:8]}"
            df = (
                df.withColumn(zc, zorder_key(df, a, b))
                .repartitionByRange(target_files, zc)
                .sortWithinPartitions(zc)
                .drop(zc)
            )
            stats_set |= {a, b}
        else:
            df = df.coalesce(target_files)
        # the rewrite is parent's content: commit conditionally on it —
        # an append landing mid-compaction must not vanish from current
        return publish(
            df,
            root,
            snapshot_id=snapshot_id,
            stats_cols=sorted(stats_set) or None,
            _require_parent=parent,
            _record_schema=pm.get("schema") is not None,
        )

    return _occ_loop(root, snapshot_id, retries, attempt)


def restore_snapshot(
    root: str, sid: str, snapshot_id: str | None = None
) -> str:
    """RESTORE (Delta ``RESTORE TABLE ... TO VERSION``, Iceberg
    rollback): make the table's current state equal snapshot ``sid``
    again, as a NEW commit — metadata only, zero data movement. The
    new manifest inherits the target's file list by reference (files
    are immutable and, within the vacuum retention window, still on
    disk), so a 100 TB rollback is one JSON write + one pointer CAS.

    CRITICALLY, the pointer never moves BACKWARD: restore mints a
    fresh snapshot that is a CHILD of the current one. That keeps the
    lineage linear and every adjudication in this module sound — the
    torn-commit test (``manifest.parent == observed`` ⇔ never
    flipped), the residue-vs-superseded lineage walk, and the
    ``snapshots()`` cycle guard all rely on monotonic history. A
    restore that re-pointed at the OLD sid would need manifest
    tombstones; a restore that REUSED a committed token would write a
    cycle into the parent chain — both are refused here.

    Rules:
    - The target must be a COMMITTED snapshot in the current lineage
      (walk-proven). A residue manifest, or a target past the vacuum
      horizon (manifest reaped — FileNotFoundError — or any listed
      data file already vacuumed), is refused: committing a manifest
      over missing files would tear every future read.
    - Restoring to the current snapshot is a documented no-op
      returning ``sid`` (nothing to change; Delta's behavior).
    - A lost pointer race retries on the fresh parent: the inherited
      content is derived from the immutable TARGET, not from the
      parent, so the rebuild is pure metadata (the same reason append
      losers retry inside ``_commit_staged`` — restore loops here
      because that guard conservatively pins every ``inherit_files``
      commit, whose usual source is merge derivation).
    """
    man_dir = os.path.join(root, _MANIFESTS)
    new_sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    # Replay guards BEFORE target validation (r12 close review): an
    # at-least-once replay of a restore that already committed must
    # no-op even if the TARGET has since been vacuumed — the committed
    # restore carries the files under its own manifest.
    _, observed = _read_pointer(root)
    if observed == new_sid:
        return new_sid  # replayed restore: already committed
    if observed == sid:
        return sid  # already AT the target state: no-op
    if (
        snapshot_id is not None
        and os.path.exists(os.path.join(man_dir, f"{new_sid}.json"))
        and _committed_in_lineage(root, new_sid, observed) is True
    ):
        return new_sid  # committed then superseded: idempotent no-op
    tm = _manifest(root, sid)  # FileNotFoundError: reaped target
    needed = list(tm["files"]) + sorted(
        # the target's deletion vectors are part of its state: a
        # restore that lost them would RESURRECT the deleted rows
        {p for e in tm.get("deletes", {}).values() for p in e["dv"]}
    )
    missing = [
        f for f in needed
        if not os.path.exists(os.path.join(root, f))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore {root!r} to {sid!r}: {len(missing)} of its "
            f"data/deletion-vector files were vacuumed "
            f"(first: {missing[0]!r})"
        )
    for _ in range(_COMMIT_RETRIES):
        observed_gen, observed = _read_pointer(root)
        if observed == new_sid:
            return new_sid  # replayed restore: already committed
        if observed == sid:
            return sid  # already AT the target state: no-op
        if _committed_in_lineage(root, sid, observed) is not True:
            raise RuntimeError(
                f"cannot restore {root!r} to {sid!r}: not a committed "
                "snapshot of the live lineage (a lost-commit residue "
                "manifest, or the walk truncated at the vacuum horizon)"
            )
        if os.path.exists(os.path.join(man_dir, f"{new_sid}.json")):
            # same adjudication as publish: a committed-then-superseded
            # token already DID its restore — idempotent no-op (it must
            # never recommit: its manifest is load-bearing history, and
            # overwriting writes a CYCLE into the chain); provable
            # crash residue of a lost restore is adopted; an
            # unprovable (horizon-truncated) case refuses.
            landed = _committed_in_lineage(root, new_sid, observed)
            if landed is True:
                return new_sid
            if landed is False:
                os.unlink(os.path.join(man_dir, f"{new_sid}.json"))
            else:
                raise RuntimeError(
                    f"snapshot token {new_sid!r} already has a manifest "
                    f"at {root!r} and the lineage walk truncated at the "
                    "vacuum horizon; restoring over it could corrupt "
                    "the lineage — use a fresh snapshot_id"
                )
        try:
            return _commit_staged(
                root,
                new_sid,
                [],
                new_meta={},
                append=False,
                parent_check=True,
                inherit_files=list(tm["files"]),
                inherit_meta=dict(tm.get("files_meta", {})),
                observed_gen=observed_gen,
                observed=observed,
                schema=tm.get("schema"),  # the restored contract
                deletes=dict(tm.get("deletes", {})),  # restored mask
            )
        except ConcurrentPublishError:
            continue  # metadata-only rebuild: re-read, re-commit
    raise ConcurrentPublishError(
        f"restore of {root!r} to {sid!r} lost {_COMMIT_RETRIES} "
        "consecutive pointer races — the root is pathologically "
        "contended"
    )


def evolve_schema(root: str, add, snapshot_id: str | None = None) -> str:
    """ALTER TABLE ADD COLUMNS (Delta/Iceberg metadata evolution): a
    METADATA-ONLY commit that widens the recorded schema with ``add``
    (a StructType, a list of StructFields, or a schema-json dict of
    the columns to add) — zero data movement, the same economics as
    ``restore_snapshot``. Old files read the new columns as NULL
    through the recorded schema (``_manifest_reader``), exactly as a
    ``merge_schema=True`` append would bind them, but without needing
    rows to carry. The CDC apply side uses this to make a replica
    follow its source's evolution before applying an evolved range
    (VERDICT r14 #3).

    Rules (the ``_merge_schemas`` append contract): an added name
    that already exists must have the IDENTICAL type (conflict = loud
    error, never a cast); adding only already-present columns is the
    documented idempotent no-op returning the current sid; a legacy
    lineage (no recorded schema) cannot evolve by metadata — its old
    files' columns are unknown — use a ``merge_schema`` append there.
    Same retry-on-lost-race loop and exactly-once ``snapshot_id``
    token as restore (pure-metadata rebuilds are free to re-derive)."""
    from pyspark.sql.types import StructField, StructType

    if isinstance(add, StructType):
        add_json = add.jsonValue()
    elif isinstance(add, (list, tuple)):
        add_json = StructType(list(add)).jsonValue()
    else:
        add_json = add
    man_dir = os.path.join(root, _MANIFESTS)
    new_sid = snapshot_id or f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    for _ in range(_COMMIT_RETRIES):
        observed_gen, observed = _read_pointer(root)
        if observed is None:
            raise FileNotFoundError(f"no current snapshot at {root!r}")
        if observed == new_sid:
            return new_sid  # replayed evolution: already committed
        if os.path.exists(os.path.join(man_dir, f"{new_sid}.json")):
            # full token adjudication, the restore_snapshot contract
            # (review r15 pass 2 #3): committed-then-superseded is an
            # idempotent no-op; provable crash residue is removed and
            # re-derived; a walk TRUNCATED at the vacuum horizon
            # (None) is unprovable — overwriting a possibly-committed
            # manifest would write a cycle into the chain, so refuse
            landed = _committed_in_lineage(root, new_sid, observed)
            if landed is True:
                return new_sid
            if landed is False:
                os.unlink(os.path.join(man_dir, f"{new_sid}.json"))
            else:
                raise RuntimeError(
                    f"snapshot token {new_sid!r} already has a manifest "
                    f"at {root!r} and the lineage walk truncated at the "
                    "vacuum horizon; evolving over it could corrupt "
                    "the lineage — use a fresh snapshot_id"
                )
        pm = _manifest(root, observed)
        if pm.get("schema") is None:
            raise ValueError(
                f"cannot evolve {root!r} by metadata: the lineage has no "
                "recorded schema (legacy), so old files' columns are "
                "unknown; evolve it with a merge_schema=True append"
            )
        merged = _merge_schemas(pm["schema"], add_json, True, root)
        existing = {f["name"] for f in pm["schema"]["fields"]}
        if all(f["name"] in existing for f in add_json["fields"]):
            return observed  # every column already present: no-op
        try:
            return _commit_staged(
                root,
                new_sid,
                [],
                new_meta={},
                append=False,
                parent_check=True,
                inherit_files=list(pm["files"]),
                inherit_meta=dict(pm.get("files_meta", {})),
                observed_gen=observed_gen,
                observed=observed,
                schema=merged,
                deletes=dict(pm.get("deletes", {})),
            )
        except ConcurrentPublishError:
            continue  # metadata-only rebuild: re-read, re-merge, re-commit
    raise ConcurrentPublishError(
        f"schema evolution of {root!r} lost {_COMMIT_RETRIES} "
        "consecutive pointer races — the root is pathologically "
        "contended"
    )


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
    man = _manifest(root, to_sid)
    # deletion vectors apply here too (r13 review): with from_sid=None
    # (or any from_sid predating a later-masked file) the delta
    # includes files whose rows ``to_sid`` has MOR-deleted — an
    # incremental consumer must see the logical table's delta, never
    # resurrected rows
    return _apply_deletes(
        spark, root, man,
        _manifest_reader(spark, man).parquet(
            *[os.path.join(root, f) for f in delta]
        ),
        files=delta,
    )


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


def history(root: str) -> list[dict]:
    """Commit metadata for the walkable lineage, NEWEST FIRST — the
    DESCRIBE HISTORY face (the ops view ``snapshot_as_of`` resolves
    against: a user picks a ``committed_at`` from here and time-travels
    to it). Each entry:

    - ``snapshot_id`` / ``parent`` — the lineage edge
    - ``committed_at`` — UTC-naive datetime from the manifest file's
      mtime, the same clock ``snapshot_as_of`` / ``vacuum keep_hours``
      / the CDF's ``_commit_timestamp`` trust
    - ``n_files`` — data files in the snapshot
    - ``row_count`` — LOGICAL rows (vector-masked positions already
      subtracted, the number ``read_snapshot`` returns); None when a
      stats-less file leaves it unknown
    - ``masked_rows`` — positions deleted merge-on-read and not yet
      purged (the REORG PURGE debt gauge)

    Metadata only — ONE newest-first walk, one JSON read + one stat
    per walkable commit, no data I/O, so at 100 TB the driver answers
    from manifests alone. The walk ends at the vacuum horizon like
    ``snapshots()`` — including a manifest reaped by a CONCURRENT
    vacuum mid-walk (a separate snapshots() pass then per-sid re-reads
    would race that window and crash on the re-read); a lineage cycle
    raises the same RuntimeError snapshots() gives, never a silent
    truncation."""
    import datetime as _dt

    _, man_dir, _ = _paths(root)
    out: list[dict] = []
    sid = current_snapshot(root)
    seen: set[str] = set()
    while sid is not None:
        if sid in seen:
            raise RuntimeError(
                f"snapshot lineage cycle at {sid!r} in {root!r}"
            )
        seen.add(sid)
        try:
            mt = os.path.getmtime(os.path.join(man_dir, f"{sid}.json"))
            man = _manifest(root, sid)
        except FileNotFoundError:
            if not out:
                raise  # pointer names a missing manifest: corruption
            break  # vacuum horizon (possibly a concurrent vacuum)
        out.append(
            {
                "snapshot_id": sid,
                "parent": man.get("parent"),
                "committed_at": _dt.datetime.utcfromtimestamp(mt),
                "n_files": len(man["files"]),
                "row_count": man.get("row_count"),
                "masked_rows": sum(
                    e["rows"] for e in (man.get("deletes") or {}).values()
                ),
            }
        )
        sid = man.get("parent")
    return out


def snapshot_as_of(root: str, ts) -> str:
    """Resolve the NEWEST lineage snapshot committed at or before
    ``ts`` — timestamp time travel (Delta's ``timestampAsOf``), the
    query-side sibling of ``vacuum(keep_hours=...)`` and the CDF's
    ``_commit_timestamp``: all three trust the SAME clock, the
    manifest file's mtime (snapshot ids are caller-chosen tokens and
    cannot carry time; the filesystem's commit stamp is the local
    analog of an object store's commit-object timestamp).

    ``ts`` may be a UTC-naive ``datetime`` (the repo's timestamp
    convention), an ISO-8601 string, or epoch seconds. A ``ts`` at or
    after the newest commit resolves to the newest snapshot (asking
    for "the table as of now" on a quiet table must work); a ``ts``
    before the OLDEST WALKABLE commit raises ``ValueError`` naming the
    earliest available commit time — the requested state is behind
    the vacuum horizon, the same before-earliest-version contract
    every table format documents. Compose with ``read_snapshot`` /
    ``read_pruned(sid=...)``; the batch ``manifest`` format serves the
    same resolution as ``.option("timestampAsOf", ...)``.

    The walk is newest-first and stats only as far as the answer: on a
    warm table the common "recent ts" case reads one mtime, not the
    lineage. A manifest reaped between the pointer read and its stat
    (concurrent vacuum) terminates the walk as the horizon — older
    history is gone either way.

    Comparison is at MICROSECOND grain (both sides floored): datetime
    carries µs while the filesystem stamp carries ~ns, so an exact
    round-trip — resolve the ``committed_at`` that ``history()`` just
    reported — would otherwise land fractionally BEFORE the commit it
    names and miss it."""
    target = int(_epoch_seconds(ts) * 1_000_000)
    sid = current_snapshot(root)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot at {root!r}")
    _, man_dir, _ = _paths(root)
    earliest: tuple[float, str] | None = None
    seen: set[str] = set()
    while sid is not None:
        if sid in seen:
            # same contract as snapshots(): corruption is never
            # diagnosed as retention truncation
            raise RuntimeError(
                f"snapshot lineage cycle at {sid!r} in {root!r}"
            )
        seen.add(sid)
        try:
            mt = os.path.getmtime(os.path.join(man_dir, f"{sid}.json"))
        except FileNotFoundError:
            if earliest is None:
                raise  # pointer names a missing manifest: corruption
            break  # vacuum horizon: older history is gone
        earliest = (mt, sid)
        if int(mt * 1_000_000) <= target:
            # the hit needs no manifest read at all — the warm
            # "recent ts" case is ONE stat, as documented
            return sid
        try:
            sid = _manifest(root, sid)["parent"]
        except FileNotFoundError:
            break  # reaped between the stat and the read: horizon
    assert earliest is not None  # loop ran at least once to get here
    raise ValueError(
        f"timestamp {ts!r} predates the earliest available commit at "
        f"{root!r} ({earliest[1]!r}, committed epoch {earliest[0]:.3f})"
        " — the requested state is behind the vacuum horizon"
    )


def _epoch_seconds(ts) -> float:
    """Normalize a datetime / ISO string / epoch number to epoch
    seconds. Naive datetimes are UTC (the repo convention — the
    container runs UTC and every oracle assumes UTC-naive)."""
    import datetime as _dt

    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        try:
            return float(ts)
        except ValueError:
            ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    raise TypeError(f"cannot interpret {ts!r} as a commit timestamp")


def vacuum(
    root: str, keep: int = 1, keep_hours: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete data files and manifests of all but the ``keep`` most
    recent snapshots IN THE CURRENT LINEAGE, plus any unreferenced
    data prefixes (crashed writers). Returns removed snapshot prefixes.
    Safe order: old pointers are unreachable the moment ``_CURRENT``
    moved, so deletion can't race a reader that resolved the pointer
    recently unless it held the manifest across the vacuum — the usual
    retention-window caveat every table format documents.

    ``keep_hours`` widens the keep set by TIME (the Delta
    ``RETAIN n HOURS`` knob): every lineage snapshot whose manifest
    was committed within the window survives, in addition to the
    ``keep`` newest. Commit time is the manifest file's mtime — the
    filesystem's own stamp, the local analog of an object store's
    commit-object timestamp (snapshot ids are caller-chosen tokens, so
    they cannot carry trusted time). Errors reading an mtime propagate
    and abort the vacuum (the r11 rule: a transient fault must never
    shrink the keep set and reap snapshots inside the window).

    ``dry_run=True`` (the Delta ``VACUUM ... DRY RUN`` shape) computes
    and returns the SAME data-prefix list a real call would remove —
    same keep set, same liveness walk — but deletes nothing and skips
    the manifest/generation-log trims entirely. Retention tuning
    composes with ``history()``: read the commit times, dry-run the
    candidate ``keep_hours``, inspect what would go, then run it."""
    data_dir, man_dir, _ = _paths(root)
    lineage = snapshots(root)
    keep_ids = set(lineage[-keep:]) if keep > 0 else set()
    if keep_hours is not None:
        cutoff = time.time() - keep_hours * 3600.0
        for sid in lineage:
            if os.path.getmtime(os.path.join(man_dir, f"{sid}.json")) >= cutoff:
                keep_ids.add(sid)
    removed = []
    live = set()
    for sid in keep_ids:
        man = _manifest(root, sid)
        live.update(os.path.basename(os.path.dirname(f)) for f in man["files"])
        # deletion-vector sidecars live under their own commit's
        # data/<sid> prefix: referenced vectors must survive any
        # vacuum that keeps a snapshot masking rows with them
        live.update(
            os.path.basename(os.path.dirname(p))
            for e in man.get("deletes", {}).values()
            for p in e["dv"]
        )
    if os.path.isdir(data_dir):
        for prefix in os.listdir(data_dir):
            if prefix not in live and prefix not in keep_ids:
                if not dry_run:
                    shutil.rmtree(
                        os.path.join(data_dir, prefix), ignore_errors=True
                    )
                removed.append(prefix)
    if dry_run:
        return removed
    if os.path.isdir(man_dir):
        for mf in os.listdir(man_dir):
            sid = mf[: -len(".json")] if mf.endswith(".json") else None
            if sid and sid not in keep_ids:
                os.remove(os.path.join(man_dir, mf))
            elif ".tmp-" in mf:
                # crashed commit's manifest scratch (writer-unique name,
                # never reused) — plain residue
                os.remove(os.path.join(man_dir, mf))
    # Generation-log pruning: the pointer log grows one ~40-byte file
    # per commit (one per micro-batch under streaming), so vacuum trims
    # it to the newest _GEN_KEEP entries. The max entry IS the pointer
    # and is always kept; the tail behind it only serves readers that
    # listed the directory moments before the prune. Like data-prefix
    # reaping above, this step assumes no writer is mid-commit (the
    # vacuum contract): an in-flight writer holding a pruned generation
    # number is what the _advance_pointer stale-generation detector
    # exists to catch.
    gen_dir = os.path.join(root, _GEN)
    if os.path.isdir(gen_dir):
        live_gens = sorted(
            (e for e in os.listdir(gen_dir) if e.isdigit()), key=int
        )
        for e in live_gens[:-_GEN_KEEP]:
            os.remove(os.path.join(gen_dir, e))
        for e in os.listdir(gen_dir):
            if e.startswith(".tmp-"):
                os.remove(os.path.join(gen_dir, e))
    return removed
