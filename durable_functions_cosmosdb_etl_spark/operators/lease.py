"""Run lease + guard (reference operators O3/O4 orchestration analog).

The reference serializes concurrent orchestrations with a Cosmos
single-row lease: acquire iff unlocked or timed out (>5 min), with
ETag-conditional upsert so exactly one contender wins
(/root/reference/EtlProcess.cs:87-103,262-316). A Spark deployment has
one driver per pipeline, but scheduled submissions can still overlap
(previous run overran its cron slot — exactly the case the reference's
timeout handles), so the engine keeps the same guard.

Implementation: winner election via an ATOMIC primitive —
``os.open(lock, O_CREAT | O_EXCL)`` creates the lock file for exactly
one contender (the filesystem analog of the reference's ETag-
conditional upsert: contended creation fails for everyone but one,
EtlProcess.cs:306-310's PreconditionFailed path). A timed-out lock is
stolen by atomically renaming it aside (``os.rename`` of the same
source succeeds for exactly one stealer) and re-running the exclusive
create. The JSON state file carries metadata only (worker, times,
forced flag) — it is never the mutual-exclusion mechanism. On a shared
filesystem this needs O_EXCL + rename atomicity (POSIX/NFSv4/HDFS-
like); object stores would use a conditional-put (If-Match/
If-None-Match) instead — same protocol, different primitive.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from dataclasses import dataclass
from datetime import datetime, timedelta

DEFAULT_TIMEOUT_MIN = 5  # OrchestrationLeaseTimeOut, EtlProcess.cs:24


@dataclass(frozen=True)
class LeaseHandle:
    """Result of an acquire attempt. Truthy iff acquired; carries the
    (worker, start_time) identity that ``release_lease`` verifies, and
    the forced flag for the audit row (OrchestrationRun.ForcedLease,
    EtlProcess.cs:128) — callers no longer re-read lease internals."""

    acquired: bool
    worker: str
    start_time: str | None = None
    forced: bool = False

    def __bool__(self) -> bool:
        return self.acquired


def _read(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write(path: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def _lock_path(path: str) -> str:
    return path + ".lock"


def _try_exclusive_create(
    lock: str, path: str, worker: str, now: datetime, forced: bool
) -> bool:
    """One O_CREAT|O_EXCL attempt; on success also writes the metadata
    state file. Returns False iff the lock already exists."""
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump({"worker": worker, "start_time": now.isoformat()}, f)
    _write(
        path,
        {
            "locked": True,
            "worker": worker,
            "start_time": now.isoformat(),
            "forced": forced,
            "version": str(uuid.uuid4()),
        },
    )
    return True


def acquire_lease(
    path: str,
    worker: str,
    now: datetime | None = None,
    timeout_min: int = DEFAULT_TIMEOUT_MIN,
) -> LeaseHandle:
    """Try to take the run lease; truthy result iff this worker may run.

    Mirrors GetOrchestrationLeaseAsync: free or timed-out leases are
    (re)acquired — a lease older than ``timeout_min`` is presumed dead
    and stolen (EtlProcess.cs:94,286-292); a live lease means skip this
    run (:98-102). Mutual exclusion comes from the exclusive-create of
    the lock file: two contenders racing on a free lease see exactly one
    winner (the loser's O_EXCL fails), unlike a write-then-read-back
    check, which can double-grant.
    """
    now = now or datetime.now()
    lock = _lock_path(path)
    miss = LeaseHandle(False, worker)

    def won(forced: bool) -> LeaseHandle:
        return LeaseHandle(True, worker, now.isoformat(), forced)

    if _try_exclusive_create(lock, path, worker, now, forced=False):
        return won(False)
    holder = _read(lock)
    if holder is None:
        # Lock vanished (holder released between our attempts) or is
        # unreadable mid-write: retry the exclusive create once; if the
        # lock re-exists, treat as held.
        if _try_exclusive_create(lock, path, worker, now, forced=False):
            return won(False)
        return miss
    held_at = datetime.fromisoformat(holder["start_time"])
    if now <= held_at + timedelta(minutes=timeout_min):
        return miss  # live lease — skip (EtlProcess.cs:98-102)
    # Timed out: steal atomically. Renaming the stale lock aside
    # succeeds for exactly ONE stealer of THAT file — but a faster
    # stealer may have already completed the full steal and re-created a
    # FRESH lock at the same path, which this rename would then grab. So
    # after renaming, verify the renamed file is still the stale holder
    # we observed (worker + start_time); if it is fresh, restore it
    # without clobbering (os.link fails if a newer lock appeared) and
    # lose the race.
    stale = f"{lock}.stale-{uuid.uuid4()}"
    try:
        os.rename(lock, stale)
    except OSError:
        return miss  # another contender stole it first
    moved = _read(stale)
    if (
        moved is None
        or moved.get("worker") != holder.get("worker")
        or moved.get("start_time") != holder.get("start_time")
    ):
        try:
            os.link(stale, lock)  # no-overwrite restore
        except OSError:
            pass  # an even newer lock exists — nothing to restore
        os.unlink(stale)
        return miss
    os.unlink(stale)
    if _try_exclusive_create(lock, path, worker, now, forced=True):
        return won(True)
    return miss


def renew_lease(
    path: str,
    worker: str,
    start_time: str,
    now: datetime | None = None,
) -> LeaseHandle:
    """Heartbeat for a HELD lease: atomically re-stamp the lock's
    ``start_time`` so a long-running holder is not presumed dead at
    ``timeout_min`` and stolen mid-work. With periodic renewal the
    timeout needs to exceed only the HEARTBEAT interval (e.g. one
    micro-batch), not the whole job — the same liveness contract as a
    Cosmos lease container's keep-alive.

    Returns a NEW truthy handle carrying the renewed ``start_time``
    (use it for subsequent renews and the final release — ownership is
    verified on (worker, start_time), so the old handle is dead). A
    falsy handle means the lease was LOST (stolen after a missed
    heartbeat, or released): the caller must stop mutating immediately.

    Protocol: rename the lock aside (exclusive — one mover wins),
    verify it is still OUR tenancy, rewrite the payload with the fresh
    timestamp, link back without clobbering. If a contender acquired a
    fresh lock while ours was aside (the same documented residual
    window as release), the no-clobber link fails and we report the
    lease lost rather than fight — at most one party ever believes it
    holds.
    """
    now = now or datetime.now()
    lock = _lock_path(path)
    miss = LeaseHandle(False, worker)

    def ours(rec: dict | None) -> bool:
        return bool(
            rec
            and rec.get("worker") == worker
            and rec.get("start_time") == start_time
        )

    if not ours(_read(lock)):
        return miss
    aside = f"{lock}.renew-{uuid.uuid4()}"
    try:
        os.rename(lock, aside)
    except OSError:
        return miss  # vanished: released or mid-steal
    if not ours(_read(aside)):
        try:
            os.link(aside, lock)  # someone else's — restore, walk away
        except OSError:
            pass
        os.unlink(aside)
        return miss
    with open(aside, "w") as f:
        json.dump({"worker": worker, "start_time": now.isoformat()}, f)
    try:
        os.link(aside, lock)
    except OSError:
        # a contender created a fresh lock while ours was aside — we
        # lost; never clobber theirs
        os.unlink(aside)
        return miss
    os.unlink(aside)
    state = _read(path) or {}
    state.update(
        locked=True, worker=worker, start_time=now.isoformat(),
        version=str(uuid.uuid4()),
    )
    _write(path, state)
    return LeaseHandle(True, worker, now.isoformat(), forced=False)


def release_lease(
    path: str,
    worker: str,
    now: datetime | None = None,
    start_time: str | None = None,
) -> None:
    """Unlock if still held by ``worker`` (ReleaseLeaseAsync,
    EtlProcess.cs:319-344). A stolen lease is left to its new owner.

    Pass ``start_time`` from the :class:`LeaseHandle` that acquired:
    ownership is then verified on (worker, start_time), not worker name
    alone — distinct firings routinely share a worker id (a cron
    schedule), and a name-only check would let a slow firing release the
    lease a later same-named firing stole and still holds.

    Ownership is re-verified AFTER atomically renaming the lock aside
    (read-check-unlink would race a stealer: our lease times out, a
    stealer re-creates a fresh lock between our read and unlink, and we
    would delete the stealer's live lock). Once renamed, the file is
    exclusively ours to inspect: ours → complete the release; someone
    else's → restore it without clobbering and walk away. Residual
    window (accepted): if the fresh owner releases while its lock is
    renamed aside here, the no-clobber restore resurrects an already-
    released lock; it blocks nothing permanently — the next firing
    steals it after ``timeout_min`` (liveness degraded one SLA period,
    mutual exclusion never violated; the conservative side of the
    trade).
    """
    now = now or datetime.now()
    lock = _lock_path(path)

    def owns(rec: dict | None) -> bool:
        if not rec or rec.get("worker") != worker:
            return False
        return start_time is None or rec.get("start_time") == start_time

    def mark_released() -> None:
        state = _read(path) or {}
        state.update(locked=False, end_time=now.isoformat())
        _write(path, state)

    holder = _read(lock)
    if not owns(holder):
        return
    aside = f"{lock}.release-{uuid.uuid4()}"
    try:
        os.rename(lock, aside)
    except OSError:
        # Lock vanished between read and rename: either we already
        # released, or a stealer took over. Close out the metadata only
        # if the state file still records OUR tenancy.
        if owns(_read(path)):
            mark_released()
        return
    moved = _read(aside)
    if owns(moved):
        mark_released()
        os.unlink(aside)
    else:
        try:
            os.link(aside, lock)  # no-overwrite restore
        except OSError:
            pass
        os.unlink(aside)
