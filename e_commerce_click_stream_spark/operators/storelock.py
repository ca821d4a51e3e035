"""Cross-process single-writer locks for persisted index stores.

The stored band index (operators/dedup_index.py) and the stored IVF index
(plans/similarity.py) live at deterministic per-fixture paths, overwritten
in place so repeated gate/bench invocations reuse one directory instead of
leaking a corpus-sized tree per run. That single-writer convention used to
be a comment; two concurrent runs on the same fixture (pytest-xdist, a
bench alongside a gate) could race overwrite-vs-probe-read and return
wrong results or reader errors. These helpers make the second writer FAIL
FAST instead:

- ``acquire_build_lock(store_root)`` takes an exclusive ``flock`` on
  ``<store_root>.lock`` (non-blocking — raises with a clear message if any
  other process holds the store);
- after the build completes, ``downgrade_to_shared(store_root)``
  converts it to a shared lock, which this process keeps for its
  lifetime: lazy probe reads of the store stay protected (a would-be
  writer in another process still fails fast), while a later build in the
  SAME process re-upgrades its own lock without contention. flock(2)
  documents lock conversion as NON-atomic (release, then re-acquire), so
  the conversion itself is non-blocking and fails fast if another writer
  wins the gap — the overwrite-vs-read race this module exists to stop.

``flock`` locks die with the process, so a crashed run never leaves a
stale lock behind (the lock file itself is inert once unlocked).
"""

from __future__ import annotations

import fcntl
import os

# path -> open fd; module-level so sequential builds in one process reuse
# (and can upgrade/downgrade) their own lock instead of fighting it
_HELD: dict[str, int] = {}


def store_location(kind: str, sf_dir: str) -> tuple[str, str]:
    """Deterministic per-fixture store root + catalog-table prefix for a
    persisted index family (``kind`` in {"band", "bande", "bandea",
    "ivf", "ivfe", "ivfea", "bm25", "bm25e", "bm25ea", "nbw", "ccl",
    "ccle", "cur", "curs"}): repeated
    gate/bench invocations reuse ONE location instead of leaking a
    corpus-sized tree per run; ``SPARK_GRAFT_STORE_NS`` (below) isolates
    passive consumers. One definition for every store family so path
    and namespace semantics can't drift between them."""
    import hashlib
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tag += store_namespace()
    # bm25e / bande / ivfe: the erasure queries' own stores — they leave
    # the index eroded by design, which the shared warm "bm25" / "band" /
    # "ivf" stores (the probe_only queries reuse them expecting the full
    # index corpus) must never observe. The *ea kinds are the
    # apply-erase queries' stores: eroded AND physically rewritten, so
    # they get their own roots too.
    prefix = {
        "band": "bidx", "bande": "bide", "bandea": "bidea",
        "ivf": "ivf", "ivfe": "ivfe", "ivfea": "ivfea",
        "bm25": "bm25", "bm25e": "bm25e", "bm25ea": "bm25ea",
        "nbw": "nbw", "ccl": "ccl", "ccle": "ccle", "cur": "cur",
        "curs": "curs",
    }[kind]
    return (
        os.path.join(tempfile.gettempdir(), f"{kind}_index_{tag}"),
        f"{prefix}_{tag}",
    )


def store_namespace() -> str:
    """Suffix appended to every persisted-store path and catalog-table
    prefix. Default empty (shared per-fixture stores). A PASSIVE consumer
    that must never contend with a concurrent gate's stores — plan_audit's
    EXPLAIN triggers real builds — sets ``SPARK_GRAFT_STORE_NS`` to get a
    private namespace instead of fail-fasting on the shared lock."""
    ns = os.environ.get("SPARK_GRAFT_STORE_NS", "")
    return f"_{ns}" if ns else ""


def _fd(store_root: str) -> int:
    path = store_root.rstrip("/") + ".lock"
    fd = _HELD.get(path)
    if fd is None:
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        _HELD[path] = fd
    return fd


def acquire_build_lock(store_root: str) -> None:
    """Exclusive, non-blocking. Raises RuntimeError if another process is
    building or reading the store at ``store_root``."""
    fd = _fd(store_root)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError as exc:
        raise RuntimeError(
            f"index store {store_root!r} is locked by another process "
            f"(concurrent build/probe on the same fixture); re-run after it "
            f"finishes or point the runs at different stores"
        ) from exc
    os.ftruncate(fd, 0)  # a shorter pid over a longer stale one must not
    os.pwrite(fd, str(os.getpid()).encode(), 0)  # read back concatenated


def downgrade_to_shared(store_root: str) -> None:
    """Convert this process's exclusive build lock to a shared read lock
    (kept until process exit) so lazy probe reads stay protected.

    flock conversion is non-atomic: the kernel releases the exclusive
    lock before granting the shared one, so another writer can take EX in
    the gap. Non-blocking + fail fast, matching acquire_*: a blocking
    LOCK_SH here would wait out the interloping build and then lazily
    read a store that was overwritten after this process built it."""
    path = store_root.rstrip("/") + ".lock"
    fd = _fd(store_root)
    try:
        fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
    except BlockingIOError as exc:
        # the EX lock is already gone (conversion released it before the
        # SH attempt); drop the half-held state entirely — closing the fd
        # releases any residual claim and evicts the cached handle, so a
        # caller that swallows this error can't later read-lock a store
        # this process no longer owns via its cached fd. The pid stamp is
        # NOT touched: the winning writer has already stamped its own pid
        # (truncating here would erase the CURRENT holder's stamp).
        _HELD.pop(path, None)
        os.close(fd)
        raise RuntimeError(
            f"index store {store_root!r} was grabbed by another writer "
            f"while downgrading the build lock; the store contents no "
            f"longer match this process's build — re-run"
        ) from exc


def acquire_read_lock(store_root: str) -> None:
    """Shared, non-blocking: a reader that did NOT build the store this
    process-lifetime still blocks concurrent overwriters (and fails fast
    if one is mid-build right now)."""
    fd = _fd(store_root)
    try:
        fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
    except BlockingIOError as exc:
        raise RuntimeError(
            f"index store {store_root!r} is being rebuilt by another "
            f"process; re-run after the build finishes"
        ) from exc
