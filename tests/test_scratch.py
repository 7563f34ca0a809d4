"""The scratch root's two boundedness guarantees: lifetime (atexit
rmtree — r6) and in-session size (oldest-first sweep above the cap —
VERDICT r6 #3: a long-lived notebook session must not accumulate staged
table copies until exit)."""

import os

from streaming_spark import scratch


def _fill(path: str, size: int, mtime: float) -> None:
    with open(os.path.join(path, "blob"), "wb") as f:
        f.write(b"x" * size)
    os.utime(path, (mtime, mtime))


def test_scratch_sweep_keeps_disk_bounded(monkeypatch):
    """A loop of sink-staging queries keeps disk bounded: once the root
    exceeds the cap, the OLDEST tag dirs are swept before the next dir
    is carved — newest survivors plus the new dir stay under control."""
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_CAP_BYTES", str(2_500))
    dirs = []
    for i in range(8):
        d = scratch.scratch_dir("sweeptest")
        _fill(d, 1_000, 1_000_000 + i)  # explicit mtimes: strict age order
        dirs.append(d)
    # each call sweeps BEFORE creating, so the root never holds more
    # than cap-worth of old data plus the newest (just-filled) dir
    root = scratch.scratch_root()
    live = [
        e
        for e in os.scandir(root)
        if e.is_dir() and os.path.basename(e.path).startswith("sweeptest")
    ]
    assert len(live) <= 3  # 2500 cap / 1000 per dir → ≤2 old + 1 new
    # the survivors are the NEWEST dirs (oldest-first sweep)
    assert dirs[-1] in [e.path for e in live]
    assert dirs[0] not in [e.path for e in live]
    total = sum(scratch._tree_size(e.path) for e in live)
    assert total <= 2_500 + 1_000  # old data under cap + the fresh dir


def test_scratch_sweep_never_removes_the_new_dir(monkeypatch):
    """Even with a cap of zero the directory being handed out must
    exist and be writable (the sweep runs before mkdtemp)."""
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_CAP_BYTES", "0")
    d = scratch.scratch_dir("zerocap")
    assert os.path.isdir(d)
    with open(os.path.join(d, "ok"), "w") as f:
        f.write("ok")
