"""Process-scoped scratch space for staged sinks / checkpoints.

Several queries materialize runtime artifacts (streaming sinks,
checkpoint dirs, staged CSV/JSONL shards, layout experiments).  Before
round 6 each call mkdtemp'd into the system temp dir and never cleaned
up, so every gate/bench/test invocation leaked directories holding full
table copies (ADVICE r5).  All such dirs now live under ONE per-process
root that is removed at interpreter exit — bounded lifetime, one rmtree,
and a single prefix (``spark_graft_scratch_``) an operator can sweep if
a process dies uncleanly.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed atexit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(tag: str) -> str:
    """A fresh directory under the scratch root — drop-in for
    ``tempfile.mkdtemp(prefix=...)`` with bounded lifetime."""
    return tempfile.mkdtemp(prefix=tag + "_", dir=scratch_root())
