"""Process-scoped scratch space for staged sinks / checkpoints.

Several queries materialize runtime artifacts (streaming sinks,
checkpoint dirs, staged CSV/JSONL shards, layout experiments, staged
ANN assignment maps).  Before round 6 each call mkdtemp'd into the
system temp dir and never cleaned up, so every gate/bench/test
invocation leaked directories holding full table copies (ADVICE r5).
All such dirs now live under ONE per-process root that is removed at
interpreter exit — bounded lifetime, one rmtree, and a single prefix
(``spark_graft_scratch_``) an operator can sweep if a process dies
uncleanly.

Round 7 (VERDICT r6 #3): atexit bounds the lifetime of gate/bench/test
processes, but a long-lived notebook session would still accumulate
staged table copies until exit.  ``scratch_dir`` therefore sweeps tag
directories whenever the root's total size exceeds a cap
(``SPARK_GRAFT_SCRATCH_CAP_BYTES``, default 8 GiB) BEFORE carving the
new directory — disk use stays bounded within a session, and the dir
being handed out is never itself a sweep candidate.

Round 8 (ADVICE r7): victims are picked by RECURSIVE max-mtime, not the
top-level dir stat.  A directory's own mtime only changes when entries
are created directly in it, and Spark sinks write nested part files —
so an ACTIVE long-running sink kept its creation-time mtime and was the
first sweep candidate, deleting live data mid-query in the exact
long-session scenario the sweep targets.  The recursive max-mtime is
computed in the same single walk that sizes the dir, so "oldest" now
means "least recent write activity anywhere inside".  (Exempting every
dir handed out by this process was considered and rejected: the root is
per-process, so EVERY dir under it came from this process and a blanket
exemption would disable the sweep outright.)  An idle-but-still-open
sink can in principle still be swept; the cap is generous by default
for that reason — set it lower only in bounded environments.

Round 8 follow-up: mtime measures WRITE activity, but a staged parquet
a returned LAZY DataFrame still READS never writes again — its
max-mtime freezes at staging time, so in a long session the sweep
would eventually evict files an outstanding query plan depends on and
the next action fails mid-query with FileNotFoundException
(``exact_nn_topk``'s staged assign map is exactly this shape).
``scratch_dir(tag, pin=True)`` therefore exempts a dir from sweeping
for the life of the process (it still dies with the root atexit).
Pinning is for METADATA-SIZED staged read inputs only — pinned bytes
still count toward the cap, so oversized pins would starve the
sweepable pool; big artifacts (sinks, table copies) must stay
unpinned.

Round 9 (ADVICE r8): pins are RELEASABLE — :func:`unpin` returns a dir
to the ordinary sweep pool once its consuming frame is known to be
consumed (stagers expose their dirs: ``exact_nn_topk`` puts them in
``stats_out["staged_dirs"]``), and the sweep warns once per process
when pinned bytes alone exceed half the cap, so pin starvation is now
both bounded (release) and observable (warning) instead of merely
documented."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import warnings

_ROOT: str | None = None

_CAP_ENV = "SPARK_GRAFT_SCRATCH_CAP_BYTES"
_DEFAULT_CAP = 8 << 30  # 8 GiB


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed atexit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


_WARNED_BAD_CAP: set[str] = set()


def _cap() -> int:
    """The sweep cap, parsed defensively: a malformed env value must not
    raise at an arbitrary staging site mid-query (ADVICE r7) — warn once
    PER VALUE (not per scratch_dir call — a long session stages often)
    and fall back to the default."""
    raw = os.environ.get(_CAP_ENV)
    if raw is None:
        return _DEFAULT_CAP
    try:
        return int(raw)
    except ValueError:
        if raw not in _WARNED_BAD_CAP:
            _WARNED_BAD_CAP.add(raw)
            warnings.warn(
                f"{_CAP_ENV}={raw!r} is not an integer — using the "
                f"default cap of {_DEFAULT_CAP} bytes",
                RuntimeWarning,
                stacklevel=3,
            )
        return _DEFAULT_CAP


def _tree_stats(path: str) -> tuple[int, float]:
    """(total size, recursive max-mtime) in ONE walk.  The max-mtime
    spans every nested file plus the directory itself, so a sink
    actively writing part files deep inside reads as recent even though
    the top-level dir's own mtime never moves."""
    total = 0
    try:
        newest = os.path.getmtime(path)
    except OSError:
        newest = 0.0
    for dirpath, _dirnames, filenames in os.walk(path, onerror=lambda e: None):
        for f in filenames:
            try:
                st = os.stat(os.path.join(dirpath, f))
            except OSError:
                continue  # concurrently removed — fine, it's an estimate
            total += st.st_size
            if st.st_mtime > newest:
                newest = st.st_mtime
    return total, newest


_PINNED: set[str] = set()

# warn once per process when pinned bytes alone pass this fraction of
# the cap — pins are process-lifetime unless released, so a session
# that stages often and never unpins monotonically shrinks the
# sweepable budget (ADVICE r8); the warning names the remedy
_PIN_WARN_FRACTION = 0.5
_WARNED_PIN_PRESSURE = False


def _sweep(root: str, cap: int) -> None:
    """Remove least-recently-ACTIVE top-level tag dirs until the root
    fits ``cap`` (activity = recursive max-mtime, see module docstring).
    Pinned dirs are never victims but their bytes count toward the
    total, so they tighten the budget for sweepable dirs rather than
    hiding from it; when pinned bytes ALONE pass half the cap a
    one-time warning fires (pins are release-or-process-lifetime — a
    caller that never calls :func:`unpin` is starving the sweep)."""
    global _WARNED_PIN_PRESSURE
    try:
        entries = [e for e in os.scandir(root) if e.is_dir(follow_symlinks=False)]
    except OSError:
        return
    if not entries:
        return  # nothing to sweep — skip the recursive walk entirely
    sized = []
    total = 0
    pinned_total = 0
    for e in entries:
        size, newest = _tree_stats(e.path)
        total += size
        if e.path in _PINNED:
            pinned_total += size
        else:
            sized.append((newest, e.path, size))
    if not _WARNED_PIN_PRESSURE and pinned_total > cap * _PIN_WARN_FRACTION:
        _WARNED_PIN_PRESSURE = True
        warnings.warn(
            f"pinned scratch dirs hold {pinned_total} bytes — more than "
            f"{_PIN_WARN_FRACTION:.0%} of the {cap}-byte sweep cap; "
            f"pins are exempt from sweeping until released, so the "
            f"sweepable budget is shrinking — call "
            f"streaming_spark.scratch.unpin(path) once a staged frame "
            f"is known to be consumed (stagers expose their dirs, e.g. "
            f"exact_nn_topk via stats_out['staged_dirs'])",
            ResourceWarning,
            stacklevel=4,
        )
    for _newest, path, size in sorted(sized):
        if total <= cap:
            break
        shutil.rmtree(path, ignore_errors=True)
        total -= size


def scratch_dir(tag: str, pin: bool = False) -> str:
    """A fresh directory under the scratch root — drop-in for
    ``tempfile.mkdtemp(prefix=...)`` with bounded lifetime AND bounded
    in-session size (least-recently-active sweep above the cap; see
    module docstring).  ``pin=True`` exempts the dir from the sweep for
    the life of the process — for metadata-sized staged READ inputs
    whose consumer is a lazy DataFrame with unbounded lifetime (the
    sweep's mtime signal cannot see reads); never pin bulk artifacts,
    and release a pin with :func:`unpin` once the consuming frame is
    known to be fully consumed (ADVICE r8)."""
    root = scratch_root()
    _sweep(root, _cap())
    out = tempfile.mkdtemp(prefix=tag + "_", dir=root)
    if pin:
        _PINNED.add(out)
    return out


def unpin(path: str) -> None:
    """Release a ``scratch_dir(..., pin=True)`` pin: the dir rejoins the
    ordinary least-recently-active sweep pool (it is NOT deleted here —
    it just stops being exempt).  Safe to call on an unpinned or
    already-released path (idempotent).  Callers that stage read inputs
    for a lazy DataFrame should release the pin as soon as the frame is
    known to be consumed (collected, written, or discarded) so a long
    session's pins cannot starve the sweepable budget (ADVICE r8)."""
    _PINNED.discard(path)
