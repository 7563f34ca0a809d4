"""Commit primitives shared by the staged-index families.

The three staged-index families — exact-dedup digests
(operators/digest_index.py), MinHash near-dup (operators/
neardup_index.py) and ANN codes (operators/similarity.py
``ann_index_*``) — guard their non-atomic multi-file mutations with the
same three primitives, which used to be re-implemented per family
(three copies of the same crash-window reasoning is how the ADVICE r12
compact-ordering bug happened once already — VERDICT r13 #4 asked for
this seam):

- **Atomic marker** (:func:`write_marker` / :func:`read_marker` /
  :func:`clear_marker`): a small JSON file recording an in-flight
  mutation's ids, written via tmp + rename so it is never observed
  torn.  While a marker exists every other operation on the index
  refuses; the marker's ids are the recovery entry point.
- **Park-then-swap** (:func:`park_and_swap`): replace a set of
  partition directories with their staged rewrites, parking each
  replaced directory under a sibling until the whole loop lands.  A
  crash at any point leaves every row on disk — before the loop the
  table is untouched; mid-loop a missing partition's old contents sit
  intact under the park (recovery: rename them back) and its rewrite
  under the staging dir.  A partition with no staged rewrite (every
  row removed) parks without replacement.
- **Whole-directory swap** (:func:`swap_directory`): replace an entire
  index/table directory with a fully-staged sibling via two renames; a
  crash between them leaves the complete old directory at ``.old``
  (never half-written) — recovery is renaming it back, and every
  operation refuses that state.

The local-filesystem implementation below is the default and the only
one this repository ships.  **Object-store contract** for a deployment
on rename-less storage (S3-like — the 100 TB posture): an
implementation must provide the same three operations with the same
crash guarantees, which maps naturally onto a manifest-committed table
format —

- the marker is a conditional PUT (put-if-absent) of a small object;
  clearing it is a delete;
- park-then-swap and whole-directory swap are both ONE atomic manifest
  commit that re-points the affected partitions (or the table root) at
  the staged files — the park becomes unnecessary because the old
  files simply remain referenced by the previous manifest version
  until vacuumed;
- "refuse while a marker/park exists" becomes "refuse when the latest
  manifest records an in-flight mutation".

Every call site routes through this module, so swapping the
implementation is one seam, not a per-family audit.
"""

from __future__ import annotations

import json
import os
import shutil


def write_marker(path: str, payload: dict) -> None:
    """Atomically write a JSON marker (tmp + rename): observers see the
    complete marker or none — a torn marker would brick an index with
    an unreadable recovery hint."""
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    os.rename(tmp, path)


def read_marker(path: str) -> dict | None:
    """The marker's payload, or None when no mutation is in flight."""
    if not os.path.isfile(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def clear_marker(path: str) -> None:
    os.remove(path)


def park_and_swap(
    root: str, staged: str, park: str, rel_paths
) -> tuple[int, int]:
    """Swap each ``rel_paths`` entry under ``root`` for its rewrite
    under ``staged``, parking replaced directories under ``park``
    (created here) until the loop completes.  Returns
    ``(n_rewritten, n_removed)`` — removed = parked without a staged
    replacement.  The caller removes ``park`` (FIRST — once every swap
    landed the park is dead weight, and removing it before any ledger
    makes the remaining crash window harmless) and then ``staged``."""
    os.makedirs(park)
    rewritten = removed = 0
    for rel in rel_paths:
        dst = os.path.join(root, rel)
        src = os.path.join(staged, rel)
        park_dst = os.path.join(park, rel)
        os.makedirs(os.path.dirname(park_dst), exist_ok=True)
        if os.path.isdir(dst):
            os.rename(dst, park_dst)
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            rewritten += 1
        else:
            removed += 1
    return rewritten, removed


def link_tree(src: str, dst: str) -> int:
    """Zero-copy staging of an UNCHANGED sub-table: recreate ``src``'s
    directory tree at ``dst`` with hardlinks to the same immutable
    parquet files (copy fallback for cross-device).  Used when a
    whole-index rebuild (reshard/refresh) leaves one table's layout
    untouched — re-reading and re-writing terabytes that did not change
    is the cost the staged index exists to avoid.  Safe because index
    files are immutable by construction (appends add files, rewrites
    stage new directories); after the swap the old directory's removal
    drops its links and the staged tree keeps the files alive.  On an
    object store this is the manifest commit re-pointing at the same
    objects — i.e. free.  Returns the number of files linked."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for name in files:
            s, d = os.path.join(root, name), os.path.join(out, name)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
            n += 1
    return n


def swap_directory(target: str, staged: str) -> None:
    """Replace ``target`` wholesale with the fully-staged ``staged``
    sibling: park the old directory at ``<target>.old``, rename the
    staging in, drop the park.  A crash between the two renames leaves
    the COMPLETE old directory at ``.old`` (never half-written); the
    owning family's sibling check refuses that state with a rename-back
    recovery hint.  A stale ``.old`` next to a complete ``target``
    (crash after the second rename) is harmless garbage and is swept
    here on the next swap."""
    old = target.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(staged, target)
    shutil.rmtree(old, ignore_errors=True)


def read_table_or_empty(spark, path: str, schema: str):
    """Read a staged sub-table, or an empty frame with the declared
    schema when it does not exist yet (fresh index / empty ledger / a
    zero-row sink directory parquet cannot infer a schema from).  The
    isdir short-circuit — indexes are local-dir-managed by contract —
    keeps a fresh index's first reads from logging Spark's missing-path
    WARN stack traces into every gate run."""
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)
