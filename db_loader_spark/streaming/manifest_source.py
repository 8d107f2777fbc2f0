"""``spark.readStream.format("manifest_cdc")`` — the commit log as a
first-class Spark streaming source (r13, the full productization of
VERDICT r12 #4 on top of ``commit_log.CommitLogConsumer``).

Built on PySpark 4's Python DataSource API: a
``SimpleDataSourceStreamReader`` whose offset IS the commit-log cursor
(one snapshot id), so Structured Streaming's own checkpointing gives
the consumer durable, exactly-once-per-commit delivery — ``read``
advances the offset to the current pointer and emits one row per
physical change (file added/removed, vector rows masked/un-masked);
``readBetweenOffsets`` replays a committed range deterministically
after a restart. Batch reads (``spark.read.format("manifest_cdc")``)
replay the full walkable history.

Row schema (file-level CDC, the same contract as
``commit_log.CommitEvent`` flattened):

    snapshot_id string, parent string, change string, file string,
    rows bigint

``change`` ∈ {add_file, remove_file, dv_add, dv_remove}; ``rows`` is
the file's recorded row count for file changes (NULL when the
manifest has no stats) and the masked/un-masked position count for
vector changes.

PICKLING CONSTRAINT (why the classes live inside a factory): Spark
plans Python data sources in a separate worker process that
deserializes the DataSource by cloudpickle. A module-level class
pickles BY REFERENCE and the worker would need ``db_loader_spark`` on
its own sys.path — exactly the foreign-cwd failure mode the repo's
driver-sim exists to catch (a runtime ``sys.path.insert`` does not
propagate to workers). A factory-scoped class pickles BY VALUE, so
the source works wherever the driver can import it once. The same
constraint forces the tiny manifest walk here to be self-contained
stdlib code rather than imports from ``sinks.manifest``;
``tests/test_manifest_source.py`` pins this source's events ≡
``CommitLogConsumer``'s so the two implementations cannot silently
diverge.

At 100 TB: identical economics to the consumer it wraps — offsets are
one string, ``read`` is one pointer read plus one manifest JSON per
new commit, and the emitted rows are metadata-sized; the heavy lifting
(scanning the named files) belongs to the downstream query via
``read_event_appended``-style scans of the emitted file names.
"""

from __future__ import annotations


def manifest_cdc_source():
    """Build and return the ``manifest_cdc`` DataSource class. Usage::

        spark.dataSource.register(manifest_cdc_source())
        events = (spark.readStream.format("manifest_cdc")
                  .option("path", root).load())
    """
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    SCHEMA = (
        "snapshot_id string, parent string, change string, "
        "file string, rows bigint"
    )

    # -- self-contained manifest walk (see module docstring) ---------
    def read_pointer(root):
        gen_dir = os.path.join(root, "_CURRENT.gen")
        for _ in range(64):
            try:
                entries = [e for e in os.listdir(gen_dir) if e.isdigit()]
            except FileNotFoundError:
                entries = []
            if not entries:
                try:
                    with open(os.path.join(root, "_CURRENT")) as fh:
                        return fh.read().strip() or None
                except OSError:
                    return None
            top = max(entries, key=int)
            try:
                with open(os.path.join(gen_dir, top)) as fh:
                    return fh.read().strip() or None
            except FileNotFoundError:
                continue  # pruned between list and read: re-list
        raise RuntimeError(f"pointer at {root!r} would not settle")

    def manifest(root, sid):
        with open(os.path.join(root, "_manifests", f"{sid}.json")) as fh:
            return json.load(fh)

    def walk(root, head, cursor, tolerate_truncation=False):
        """Manifests head→cursor exclusive, returned OLDEST FIRST,
        paired with their parent manifests. A truncated (vacuumed)
        walk raises — the CommitLogConsumer contract for cursor-based
        streams — unless ``tolerate_truncation`` (the batch
        replay-the-WALKABLE-history semantic, second r13 review: any
        long-lived table has been vacuumed, and snapshots() itself
        treats truncation as the normal post-vacuum state): the walk
        stops at the horizon and the oldest walkable manifest diffs
        against NO parent, i.e. its full file list and mask emit as
        the bootstrap event — exactly what a consumer re-bootstrapping
        from a snapshot would fold."""
        chain, sid, seen = [], head, set()
        truncated = False
        while sid is not None and sid != cursor:
            if sid in seen:
                raise RuntimeError(f"lineage cycle at {sid!r} in {root!r}")
            seen.add(sid)
            try:
                man = manifest(root, sid)
            except FileNotFoundError:
                if tolerate_truncation and cursor is None:
                    truncated = True
                    break
                raise RuntimeError(
                    f"manifest_cdc offset {cursor!r} at {root!r} is "
                    "behind the vacuum horizon; restart the query from "
                    "a fresh checkpoint after re-bootstrapping from a "
                    "snapshot read"
                ) from None
            chain.append(man)
            sid = man.get("parent")
        if not truncated and sid != cursor and cursor is not None:
            raise RuntimeError(
                f"manifest_cdc offset {cursor!r} is not in the live "
                f"lineage of {root!r}; restart from a fresh checkpoint"
            )
        ordered = list(reversed(chain))
        parents = []
        if (
            ordered
            and not truncated
            and ordered[0].get("parent") is not None
        ):
            try:
                parents.append(manifest(root, ordered[0]["parent"]))
            except FileNotFoundError:
                # the cursor RESOLVED (its child names it) but its own
                # manifest is reaped: the oldest event cannot be
                # diffed — same horizon contract as an unresolvable
                # cursor (mirrors CommitLogConsumer.poll)
                raise RuntimeError(
                    f"manifest_cdc offset {cursor!r} at {root!r} is "
                    "behind the vacuum horizon (its manifest was "
                    "reaped); restart the query from a fresh "
                    "checkpoint after re-bootstrapping from a "
                    "snapshot read"
                ) from None
        else:
            parents.append(None)  # genesis or horizon: bootstrap event
        parents.extend(ordered[:-1])
        return list(zip(ordered, parents))

    def events(man, pman):
        """One row per physical change of this commit (the
        CommitEvent contract, flattened)."""
        sid, parent = man["snapshot_id"], man.get("parent")
        pfiles = set(pman["files"]) if pman else set()
        pdels = (pman or {}).get("deletes", {}) or {}
        dels = man.get("deletes", {}) or {}
        meta = man.get("files_meta", {})
        pmeta = (pman or {}).get("files_meta", {})
        live = set(man["files"])
        for f in man["files"]:
            if f not in pfiles:
                yield (sid, parent, "add_file", f, meta.get(f, {}).get("rows"))
        for f in sorted(pfiles - live):
            yield (sid, parent, "remove_file", f, pmeta.get(f, {}).get("rows"))
        for f, e in dels.items():
            pe = pdels.get(f, {})
            before = pe.get("rows", 0)
            if e["rows"] > before:
                yield (sid, parent, "dv_add", f, e["rows"] - before)
            elif e["rows"] < before:
                yield (sid, parent, "dv_remove", f, before - e["rows"])
            elif e["rows"] and sorted(e["dv"]) != sorted(pe.get("dv", [])):
                # same count, different vectors (a restore can swap
                # WHICH positions are masked): full un-mask + re-mask,
                # mirroring CommitLogConsumer (fourth r13 review)
                yield (sid, parent, "dv_remove", f, before)
                yield (sid, parent, "dv_add", f, e["rows"])
        for f, pe in pdels.items():
            if f not in dels and f in live:
                yield (sid, parent, "dv_remove", f, pe["rows"])

    def rows_between(root, start_sid, end_sid, tolerate_truncation=False):
        out = []
        for man, pman in walk(
            root, end_sid, start_sid, tolerate_truncation
        ):
            out.extend(events(man, pman))
        return out

    class _Part(InputPartition):
        def __init__(self, rows):
            self.rows = rows

    class ManifestCDCStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("manifest_cdc requires .option('path', <table root>)")
            self.start_after = options.get("startingsnapshot")

        def initialOffset(self):
            return {"sid": self.start_after}

        def read(self, start):
            head = read_pointer(self.root)
            cursor = start.get("sid")
            if head is None or head == cursor:
                return iter([]), start
            return iter(rows_between(self.root, cursor, head)), {"sid": head}

        def readBetweenOffsets(self, start, end):
            return iter(rows_between(self.root, start.get("sid"), end.get("sid")))

        def commit(self, end):
            pass

    class ManifestCDCBatchReader(DataSourceReader):
        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("manifest_cdc requires .option('path', <table root>)")
            self.start_after = options.get("startingsnapshot")

        def partitions(self):
            # the walk is driver-side metadata work; the rows ship to
            # executors as data inside the single partition. Without a
            # startingSnapshot the batch surface replays the WALKABLE
            # history (horizon-tolerant: the oldest walkable manifest
            # emits as a bootstrap event); with one, the cursor must
            # resolve exactly, like the stream
            head = read_pointer(self.root)
            rows = (
                []
                if head is None
                else rows_between(
                    self.root, self.start_after, head,
                    tolerate_truncation=self.start_after is None,
                )
            )
            return [_Part(rows)]

        def read(self, partition):
            return iter(partition.rows)

    class ManifestCDCDataSource(DataSource):
        @classmethod
        def name(cls):
            return "manifest_cdc"

        def schema(self):
            return SCHEMA

        def simpleStreamReader(self, schema):
            return ManifestCDCStreamReader(self.options)

        def reader(self, schema):
            return ManifestCDCBatchReader(self.options)

    return ManifestCDCDataSource


def register_manifest_cdc(spark) -> None:
    """Register the ``manifest_cdc`` format on this session (idempotent
    per session — Spark replaces a same-name registration)."""
    spark.dataSource.register(manifest_cdc_source())
