"""Snapshot-versioned stored-index directories (compaction vs readers).

The round-6 compaction swap (``os.rename(path, old); os.rename(tmp,
path)``) is atomic for NEW readers but unsafe for a CONCURRENT one: a
reader that listed the index files before the swap can fail mid-scan
when the old directory tree is removed. The production answer (the same
one Iceberg/Delta give, scaled down to a pointer file) is snapshot
versioning:

- an index root holds immutable version directories ``v1/, v2/, ...``
  plus a tiny ``CURRENT`` pointer file naming the live one;
- readers resolve ``CURRENT`` once at plan time and scan their pinned
  version directory, which compaction NEVER mutates;
- compaction writes a complete new version dir, then flips ``CURRENT``
  with an atomic same-filesystem rename (``os.replace``);
- the previous version is kept as a GRACE snapshot so in-flight scans
  finish; versions older than the grace window are GC'd at the next
  flip.

Backward compatibility: an index written by the plain builders is a FLAT
directory (no ``CURRENT``) — ``current_dir`` resolves it to itself, and
the first compaction migrates it by publishing ``v1/`` next to the flat
files (which become the grace snapshot, GC'd on the following flip).

Writer-writer concurrency is explicitly OUT of scope: appends and
compactions must come from ONE maintenance owner (the streaming pipeline
runs both in its single foreachBatch thread, under the pipeline's
single-writer lock). ``publish_version`` asserts that contract with an
exclusive marker so a second concurrent compactor fails loudly instead
of corrupting the version chain.
"""

from __future__ import annotations

import os
import re
import shutil

CURRENT = "CURRENT"
_VDIR = re.compile(r"v(\d+)$")


def current_dir(path: str) -> str:
    """Resolve an index root to its live snapshot directory.

    Versioned layout: the directory named by ``CURRENT``. Flat legacy
    layout (or a not-yet-built index): the root itself."""
    try:
        with open(os.path.join(path, CURRENT), encoding="utf-8") as fh:
            name = fh.read().strip()
    except OSError:
        return path
    if not _VDIR.fullmatch(name):  # corrupt pointer: fail closed
        raise RuntimeError(f"corrupt {CURRENT} pointer at {path}: {name!r}")
    return os.path.join(path, name)


def index_ready(path: str) -> bool:
    """True when the live snapshot carries the ``_SUCCESS`` trust marker."""
    return os.path.exists(os.path.join(current_dir(path), "_SUCCESS"))


def _current_version(path: str) -> int | None:
    """Version number named by ``CURRENT``, or None (flat/new layout)."""
    try:
        with open(os.path.join(path, CURRENT), encoding="utf-8") as fh:
            m = _VDIR.fullmatch(fh.read().strip())
    except OSError:
        return None
    return int(m.group(1)) if m else None


def _versions(path: str) -> list[int]:
    try:
        names = os.listdir(path)
    except OSError:
        return []
    out = []
    for n in names:
        m = _VDIR.fullmatch(n)
        if m and os.path.isdir(os.path.join(path, n)):
            out.append(int(m.group(1)))
    return sorted(out)


def publish_version(path: str, write_fn, *, grace: int = 1) -> str:
    """Write the next snapshot via ``write_fn(new_version_dir)``, flip
    ``CURRENT`` atomically, GC snapshots older than the ``grace`` window,
    and return the published directory.

    If ``write_fn`` raises, the partial version dir is removed and the
    pointer is untouched — a failed compaction degrades to "nothing
    happened", same contract as the old two-rename swap."""
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, ".compactor")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent compaction detected at {path} (stale "
            f"{lock}? remove it only if no compactor is running)")
    try:
        os.close(fd)
        # Orphan sweep: a crash between os.rename(stage, vN) and the
        # CURRENT flip leaves a visible, never-published vN directory —
        # in a still-flat root that is the exact mixed-layout hazard
        # ("Conflicting directory structures") the dot-prefixed staging
        # exists to prevent, lingering across the inter-publish gap.
        # Any version NEWER than the published pointer (or any version
        # at all when no pointer exists) was never visible to a reader
        # via CURRENT, so it is safe to remove before staging.
        cur = _current_version(path)
        for v in _versions(path):
            if cur is None or v > cur:
                shutil.rmtree(os.path.join(path, f"v{v}"),
                              ignore_errors=True)
        versions = _versions(path)
        nxt = (versions[-1] + 1) if versions else 1
        vdir = os.path.join(path, f"v{nxt}")
        # Stage the snapshot in a dot-prefixed dir first: Spark's file
        # listing ignores dot/underscore-prefixed paths, so a concurrent
        # reader of a STILL-FLAT root (first compaction, no CURRENT yet
        # — current_dir resolves to the root itself) never sees
        # half-written v1/ leaf files mixed into the flat band=/shard=
        # layout (Spark's "Conflicting directory structures" failure /
        # double counting). The rename to v{nxt} is same-filesystem and
        # happens only once the snapshot is complete, immediately before
        # the CURRENT flip.
        stage = os.path.join(path, f".v{nxt}.inprogress")
        shutil.rmtree(stage, ignore_errors=True)  # stale crashed stage
        try:
            write_fn(stage)
        except BaseException:
            shutil.rmtree(stage, ignore_errors=True)
            raise
        os.rename(stage, vdir)
        tmp = os.path.join(path, CURRENT + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"v{nxt}")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(path, CURRENT))  # the atomic flip
        # GC: drop versions older than the grace window...
        for v in versions[:-grace] if grace else versions:
            shutil.rmtree(os.path.join(path, f"v{v}"), ignore_errors=True)
        # ...and, once the flat legacy files have aged out of it (the
        # live snapshot is v2+ so flat was >= 2 flips ago), the migrated
        # flat remnants at the root.
        if nxt > grace:
            for n in os.listdir(path):
                if (n == CURRENT or _VDIR.fullmatch(n)
                        or n == os.path.basename(lock)):
                    continue
                full = os.path.join(path, n)
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                elif not n.startswith("."):
                    # dot-prefixed FILES are maintenance markers owned by
                    # the index writer (e.g. the streaming loops'
                    # .last_batch replay detector) — never flat remnants;
                    # dot-DIRS are crashed .v*.inprogress stages, cleaned
                    try:
                        os.remove(full)
                    except OSError:
                        pass
        return vdir
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
