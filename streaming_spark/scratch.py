"""Process-scoped scratch space for staged sinks / checkpoints.

Several queries materialize runtime artifacts (streaming sinks,
checkpoint dirs, staged CSV/JSONL shards, layout experiments).  Before
round 6 each call mkdtemp'd into the system temp dir and never cleaned
up, so every gate/bench/test invocation leaked directories holding full
table copies (ADVICE r5).  All such dirs now live under ONE per-process
root that is removed at interpreter exit — bounded lifetime, one rmtree,
and a single prefix (``spark_graft_scratch_``) an operator can sweep if
a process dies uncleanly.

Round 7 (VERDICT r6 #3): atexit bounds the lifetime of gate/bench/test
processes, but a long-lived notebook session would still accumulate
staged table copies until exit.  ``scratch_dir`` therefore sweeps the
OLDEST tag directories whenever the root's total size exceeds a cap
(``SPARK_GRAFT_SCRATCH_CAP_BYTES``, default 8 GiB) BEFORE carving the
new directory — disk use stays bounded within a session, and the dir
being handed out is never itself a sweep candidate.  The cap is
generous by default because an old dir could in principle back a
still-open streaming sink; set it lower in bounded environments.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

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


def _tree_size(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path, onerror=lambda e: None):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass  # concurrently removed — fine, it's a size estimate
    return total


def _sweep(root: str, cap: int) -> None:
    """Remove oldest top-level tag dirs until the root fits ``cap``."""
    try:
        entries = [e for e in os.scandir(root) if e.is_dir(follow_symlinks=False)]
    except OSError:
        return
    sized = []
    for e in entries:
        try:
            sized.append((e.stat().st_mtime, e.path, _tree_size(e.path)))
        except OSError:
            pass
    total = sum(s for _, _, s in sized)
    for _mtime, path, size in sorted(sized):
        if total <= cap:
            break
        shutil.rmtree(path, ignore_errors=True)
        total -= size


def scratch_dir(tag: str) -> str:
    """A fresh directory under the scratch root — drop-in for
    ``tempfile.mkdtemp(prefix=...)`` with bounded lifetime AND bounded
    in-session size (oldest-first sweep above the cap; see module
    docstring)."""
    root = scratch_root()
    cap = int(os.environ.get(_CAP_ENV, _DEFAULT_CAP))
    _sweep(root, cap)
    return tempfile.mkdtemp(prefix=tag + "_", dir=root)
