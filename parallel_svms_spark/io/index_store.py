"""Versioned index store: atomic publish/swap for the persisted
index families (r10 — VERDICT r9 #4).

The append-only index lifecycle (``gram_index_append``,
``minhash_index_append``, ``winnow_index_append``, the IVF/PQ
appends) keeps every WRITE safe — immutable parquet adds, a reader
sees day N or day N+1, never a torn directory. What was missing is
the COMPACTION swap: ``gram_index_compact`` writes the folded index
to a NEW path and told the caller to "rename or repoint" — a
docstring, not code. This module is the pointer convention that makes
the swap atomic and removes the caller-side path juggling:

- an index ROOT is a directory of immutable version subdirectories
  (``v000001``, ``v000002``, ...) plus one ``_CURRENT`` text file
  naming the live version;
- ``publish`` flips ``_CURRENT`` via write-temp + ``os.replace`` —
  atomic on POSIX (rename(2) within a directory), so a concurrent
  ``current_path`` sees the old or the new version, never a torn
  pointer; the version directories themselves are never mutated by a
  swap, so a reader HOLDING a DataFrame on the old version keeps
  scanning valid files (Spark binds concrete file paths at read
  time) — pinned in tests/test_index_store.py;
- stale versions are dropped only by an explicit
  ``drop_stale_versions`` once the caller knows readers drained —
  retention is a policy decision, not something a swap should imply.

This is deliberately filesystem-level (one pointer file), not a
table format: the fixture environment has no Delta/Iceberg, and one
atomic rename is the 80% of a transaction log these single-writer
maintenance flows need. On object stores without atomic rename,
point ``_CURRENT`` at a manifest service instead — the call sites
stay unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

_POINTER = "_CURRENT"


def _versions(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root)
                  if d.startswith("v") and d[1:].isdigit()
                  and os.path.isdir(os.path.join(root, d)))


def new_version_path(root: str) -> str:
    """Path for the next version directory (not created here — the
    parquet writer creates it; ``mode('error')`` keeps two racing
    writers from sharing it)."""
    os.makedirs(root, exist_ok=True)
    vs = _versions(root)
    nxt = int(vs[-1][1:]) + 1 if vs else 1
    return os.path.join(root, f"v{nxt:06d}")


def publish(root: str, version_path: str) -> None:
    """Atomically point ``_CURRENT`` at ``version_path`` (which must
    be a version directory under ``root`` that already contains the
    written index). Write-temp + ``os.replace``: a concurrent reader
    of the pointer sees the old or the new name, never a partial
    write."""
    name = os.path.basename(version_path.rstrip("/"))
    if os.path.dirname(version_path.rstrip("/")) != root.rstrip("/"):
        raise ValueError(f"{version_path!r} is not under {root!r}")
    if not os.path.isdir(version_path):
        raise ValueError(f"{version_path!r} does not exist — write "
                         "the index before publishing")
    tmp = os.path.join(root, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(name + "\n")
    os.replace(tmp, os.path.join(root, _POINTER))


def current_path(root: str) -> str:
    """The live version's path. Raises FileNotFoundError when nothing
    has been published — an unpublished store is a caller bug, not an
    empty index."""
    with open(os.path.join(root, _POINTER)) as fh:
        name = fh.read().strip()
    p = os.path.join(root, name)
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"_CURRENT names {name!r} but {p!r} is missing — was a "
            "stale version dropped while still published?")
    return p


def read_current(spark, root: str) -> DataFrame:
    """The live index as a DataFrame — the no-path-juggling read
    every incremental screen should use."""
    return spark.read.parquet(current_path(root))


def compact(spark, root: str, fold) -> str:
    """Fold the LIVE version into a new one and publish it: read
    current → ``fold(df)`` (the family's semantic collapse — e.g.
    the gram index's sum + min(struct) per gram; identity for
    families whose appends never duplicate keys) → write to the next
    version directory (``mode('error')``: two racing compactions
    cannot share a target) → atomic pointer flip. Returns the new
    version path. The old version's files are untouched — concurrent
    readers keep their snapshot; reclaim space later with
    ``drop_stale_versions``."""
    out = new_version_path(root)
    fold(spark.read.parquet(current_path(root))) \
        .write.mode("error").parquet(out)
    publish(root, out)
    return out


def drop_stale_versions(root: str) -> list[str]:
    """Delete every version directory except the published one.
    EXPLICITLY not part of ``compact``: only the caller knows when
    in-flight readers of older versions have drained. Returns the
    dropped paths."""
    live = os.path.basename(current_path(root))
    dropped = []
    for v in _versions(root):
        if v != live:
            p = os.path.join(root, v)
            shutil.rmtree(p)
            dropped.append(p)
    return dropped
