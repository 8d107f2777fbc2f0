"""Scratch+rename installation for stamp-keyed staged directories.

Extracted from queries/streamingq.py (r11 review): the scratch+rename
fix originally closed the mixed-generation race for the STREAMING
stage dirs only, while five sibling sites (the CDC root, the
append-lineage root, the upsert root, the zone-map root, the CLI e2e
corpus) still built in place with the same clear + write + stamp-last
pattern — the identical bug class, one module over. This module is the
single implementation; every stamp-keyed stage in the repo installs
through it.

Protocol (see ``build_stage``): build into a builder-unique scratch,
write the stamp INSIDE the scratch as the last file, move any other
generation aside with an atomic rename, and publish with one atomic
rename — so the stage path only ever holds COMPLETE SINGLE-GENERATION
builds, under any interleaving of concurrent builders (thread- and
process-storm tested in tests/test_stage_build_race.py and
tests/test_multiprocess_races.py).
"""

from __future__ import annotations

import os


def stage_current(stage: str, stamp: str) -> bool:
    """True if ``stage`` carries exactly ``stamp``. The stamp is the
    LAST file written into the build scratch, and the scratch is
    RENAMED into place whole (``build_stage``), so a dir whose stamp
    validates is always a complete single-generation build — a crashed
    or half-done build can never pass."""
    try:
        with open(os.path.join(stage, "_SOURCE_STAMP")) as f:
            return f.read() == stamp
    except OSError:
        return False


def build_stage(stage: str, stamp: str, build) -> str:
    """Install ``build(scratch)``'s output at ``stage`` atomically.

    The retired in-place protocol (clear + write chunks + stamp last)
    could interleave under two sessions racing a layout/source
    transition into a mixed-generation dir whose stamp validates while
    stale files from the other generation linger — and directory-scan
    readers (parquet globs, manifest roots) read every file, so the
    mix silently changes VALUES. After this protocol the stage path
    only ever holds complete single-generation builds:

    - same-stamp racers: one rename wins; the loser sees the winner's
      stamp validate and discards its identical scratch copy
      (deterministic bytes ⇒ either copy is correct);
    - different-stamp racers: the other generation is moved aside to a
      doomed name (rename, atomic) before install, so generations
      never share the live path; last installer wins and every
      intermediate state is a complete build of one generation;
    - a reader listing files during the swap can hit FileNotFound —
      loud crash-class, not silent wrong values; callers in this repo
      are sequential (driver, bench, pytest each run alone) and the
      thread/process storms pin the invariant under deliberate races.

    The install dance retries bounded under contention: between the
    move-aside and the rename another racer can occupy the path (its
    install rename is atomic), failing ours with ENOTEMPTY — found by
    the opposing-layouts thread storm. Each attempt either adopts a
    same-stamp winner, installs, or moves the other generation aside;
    the bound only trips under a pathological persistent storm, never
    a caller pattern.
    """
    import shutil
    import uuid as _uuid

    if stage_current(stage, stamp):
        return stage
    scratch = f"{stage}.build-{_uuid.uuid4().hex[:8]}"
    try:
        # pre-create the scratch so builders that only write files
        # (gzip, manifest publishes) need no makedirs boilerplate;
        # Spark writers tolerate an existing empty dir in overwrite mode
        os.makedirs(scratch, exist_ok=True)
        build(scratch)
        with open(os.path.join(scratch, "_SOURCE_STAMP"), "w") as f:
            f.write(stamp)  # last write: rename publishes data + proof
        for _ in range(16):
            if stage_current(stage, stamp):
                # a same-stamp racer finished first: its copy is
                # identical — keep it live (a reader may already be on
                # it) and discard ours
                return stage
            doomed = None
            if os.path.isdir(stage):
                doomed = f"{stage}.doomed-{_uuid.uuid4().hex[:8]}"
                try:
                    os.rename(stage, doomed)  # atomic: other gen leaves the path
                except FileNotFoundError:
                    doomed = None  # a racing builder already moved it
            try:
                os.rename(scratch, stage)  # atomic: complete build lands whole
                installed = True
            except OSError:
                installed = False  # path re-occupied mid-dance: retry
            if doomed is not None:
                shutil.rmtree(doomed, ignore_errors=True)
            if installed:
                return stage
        raise RuntimeError(
            f"stage install contention did not settle after 16 attempts: {stage}"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
