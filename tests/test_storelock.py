"""Cross-process store locks (operators/storelock.py): a second WRITER on
the same index store fails fast instead of silently racing the
overwrite-vs-probe-read (ADVICE r7); readers coexist; the building
process can rebuild without fighting its own lock."""

from __future__ import annotations

import subprocess
import sys

from e_commerce_click_stream_spark.operators.storelock import (
    acquire_build_lock,
    acquire_read_lock,
    downgrade_to_shared,
)


def _in_subprocess(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, '/root/repo'); {code}"],
        capture_output=True,
        text=True,
        timeout=60,
    )


def test_second_writer_fails_fast_during_build(tmp_path):
    root = str(tmp_path / "store")
    acquire_build_lock(root)
    r = _in_subprocess(
        "from e_commerce_click_stream_spark.operators.storelock import "
        f"acquire_build_lock; acquire_build_lock({root!r})"
    )
    assert r.returncode != 0
    assert "locked by another process" in r.stderr


def test_writer_fails_and_reader_passes_after_downgrade(tmp_path):
    root = str(tmp_path / "store")
    acquire_build_lock(root)
    downgrade_to_shared(root)
    # another process may READ alongside our shared hold...
    r_read = _in_subprocess(
        "from e_commerce_click_stream_spark.operators.storelock import "
        f"acquire_read_lock; acquire_read_lock({root!r})"
    )
    assert r_read.returncode == 0, r_read.stderr
    # ...but may not OVERWRITE while any holder exists
    r_write = _in_subprocess(
        "from e_commerce_click_stream_spark.operators.storelock import "
        f"acquire_build_lock; acquire_build_lock({root!r})"
    )
    assert r_write.returncode != 0


def test_same_process_can_rebuild_and_crashed_holder_releases(tmp_path):
    root = str(tmp_path / "store")
    acquire_build_lock(root)
    downgrade_to_shared(root)
    # same process re-upgrades its own lock for a rebuild
    acquire_build_lock(root)
    downgrade_to_shared(root)
    # flock dies with the process: a holder that exited (even uncleanly)
    # leaves the store acquirable
    r = _in_subprocess(
        "from e_commerce_click_stream_spark.operators.storelock import "
        f"acquire_read_lock; acquire_read_lock({root!r}); import os; os._exit(1)"
    )
    assert r.returncode == 1
    acquire_build_lock(root)
    downgrade_to_shared(root)


def test_pid_stamp_truncates_stale_longer_pid(tmp_path):
    # '99' written over a stale '12345' must read back '99', not '99345'
    # (ADVICE r8: pwrite at offset 0 without truncate corrupts the stamp)
    import os

    from e_commerce_click_stream_spark.operators import storelock

    root = str(tmp_path / "store")
    lock_path = root + ".lock"
    acquire_build_lock(root)
    fd = storelock._HELD[lock_path]
    os.ftruncate(fd, 0)
    os.pwrite(fd, b"1234567890", 0)  # fake a stale longer stamp
    acquire_build_lock(root)  # same-process re-acquire rewrites the stamp
    with open(lock_path) as fh:
        assert fh.read() == str(os.getpid())
