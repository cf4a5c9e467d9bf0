"""Crash-atomic versioned snapshot directories (pointer-file commit).

Round-9 verdict: the previous swap (write new → ``rmtree(old)`` →
``os.replace(tmp, path)``) had a crash window between the rmtree and the
replace in which NO snapshot exists — a crash there silently reset the
durable monitors to empty on restart, the precise failure mode the
durable stores exist to prevent.

The fix applied here: snapshots are immutable versioned subdirectories
(``v{n}/``) under the store path; the ONE mutable object is a pointer
file (``CURRENT``) flipped with a single ``os.replace`` — atomic on
POSIX. The pointer content is fsync'd before the flip, so a crash at any
instant leaves either the old pointer (old snapshot intact on disk) or
the new pointer (new snapshot fully written) — never neither. The
pointer also records the batch id that produced the snapshot, which
makes "legitimately EMPTY state at batch N" representable (the previous
layout read a 0-row frame as "no state").

Stale artifacts self-heal: everything in the store path that the
pointer does not name (staging dirs from crashed attempts, the
predecessor snapshot, orphaned pointer temp files) is garbage-collected
after each successful commit.

On a real multi-node deployment this directory protocol is replaced by a
Delta/Iceberg ACID commit (same dataflow, table-format transaction
instead of a pointer file); the handlers' batch-id idempotence contract
is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile


POINTER = "CURRENT"


def read_pointer(dirpath: str) -> tuple[str | None, int]:
    """The committed ``(name, bid)`` pair from ``dirpath``'s pointer file;
    ``(None, -1)`` when nothing has ever been committed."""
    try:
        with open(os.path.join(dirpath, POINTER)) as f:
            name, bid = f.read().splitlines()[0].rsplit(":", 1)
        return name, int(bid)
    except (OSError, ValueError, IndexError):
        return None, -1


def write_pointer(dirpath: str, name: str, bid: int) -> None:
    """Atomically commit ``(name, bid)`` as ``dirpath``'s pointer: write a
    temp file, fsync, then ONE ``os.replace`` — the single commit point.
    The DIRECTORY is fsync'd after the replace: commit()'s GC of the
    predecessor snapshot runs next, and without the dir fsync a power
    loss could persist the rmtree while the rename is still unflushed —
    CURRENT would then name a deleted snapshot (the either-old-or-new
    guarantee must hold for power loss, not just process crashes)."""
    fd, tmp = tempfile.mkstemp(prefix=".ptr_", dir=dirpath)
    with os.fdopen(fd, "w") as f:
        f.write(f"{name}:{int(bid)}\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dirpath, POINTER))
    dfd = os.open(dirpath, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class SnapshotDir:
    """Pointer-committed versioned snapshot store under one directory."""

    POINTER = POINTER

    def __init__(self, path: str):
        self.path = path

    def current(self) -> tuple[str | None, int]:
        """(absolute path of the committed snapshot dir, its batch id);
        ``(None, -1)`` when nothing has ever been committed."""
        name, bid = read_pointer(self.path)
        if name is not None:
            sub = os.path.join(self.path, name)
            if os.path.isdir(sub):
                return sub, bid
        return None, -1

    def staging(self, bid: int) -> str:
        """Path for the next (uncommitted) snapshot. Never collides with
        the committed snapshot: save() is only reached for bid >
        last committed bid (the handlers' replay gate), so ``v{bid}`` can
        only pre-exist as a leftover from a crashed attempt — which the
        parquet writer's overwrite mode replaces."""
        os.makedirs(self.path, exist_ok=True)
        return os.path.join(self.path, f"v{int(bid)}")

    def commit(self, name: str, bid: int) -> None:
        """Atomically flip the pointer to ``name``, then GC every other
        entry (predecessor snapshot, crashed staging dirs, orphaned
        pointer temps). The ``os.replace`` is the single commit point."""
        write_pointer(self.path, name, bid)
        for entry in os.listdir(self.path):
            if entry in (name, self.POINTER):
                continue
            p = os.path.join(self.path, entry)
            try:
                shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
            except OSError:
                pass  # GC is best-effort; a survivor is re-collected later
