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
create. Heartbeats (``renew_lease``) never touch the lock: they
atomically replace a SIDECAR file (``<path>.hb``), and liveness is
max(lock start_time, matching sidecar time) — so a renewal has no
instant at which the lock is absent and a contender could spuriously
win the exclusive create (ADVICE r7). The JSON state file carries
metadata only (worker, times, forced flag) — it is never the
mutual-exclusion mechanism. On a shared filesystem this needs O_EXCL +
rename atomicity (POSIX/NFSv4/HDFS-like); object stores would use a
conditional-put (If-Match/If-None-Match) instead — same protocol,
different primitive.
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


def _hb_path(path: str) -> str:
    return path + ".hb"


def _hb_matches(hb: dict | None, tenancy: dict | None) -> bool:
    """A heartbeat sidecar counts only for the exact tenancy it names
    (worker AND start_time) — one left behind by a dead tenancy is
    inert, because it can never match a fresh lock's start_time."""
    return bool(
        hb
        and tenancy is not None
        and hb.get("worker") == tenancy.get("worker")
        and hb.get("start_time") == tenancy.get("start_time")
    )


def _hb_time(path: str, holder: dict) -> datetime:
    """Effective liveness timestamp of a held lock: the acquire-time
    ``start_time``, advanced by the heartbeat sidecar when one matches
    this tenancy. The sidecar is written with an atomic replace and the
    lock itself is never touched by renewal, so there is no instant
    during a heartbeat when the lock is absent (the ADVICE r7
    spurious-steal window of the old rename-aside renewal)."""
    held_at = datetime.fromisoformat(holder["start_time"])
    hb = _read(_hb_path(path))
    if _hb_matches(hb, holder):
        try:
            beat = datetime.fromisoformat(hb["time"])
        except (KeyError, ValueError):
            return held_at
        if beat > held_at:
            return beat
    return held_at


def _clear_hb(path: str, tenancy: dict | None) -> None:
    """Best-effort removal of a heartbeat sidecar belonging to a dead
    tenancy (after a steal or a release). Leaving it would be harmless
    — it can never match a future lock's fresh start_time — this just
    keeps the directory tidy."""
    if _hb_matches(_read(_hb_path(path)), tenancy):
        try:
            os.unlink(_hb_path(path))
        except OSError:
            pass


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
    if now <= _hb_time(path, holder) + timedelta(minutes=timeout_min):
        return miss  # live lease — skip (EtlProcess.cs:98-102)
    # Timed out: steal atomically. Renaming the stale lock aside
    # succeeds for exactly ONE stealer of THAT file — but a faster
    # stealer may have already completed the full steal and re-created a
    # FRESH lock at the same path, which this rename would then grab. So
    # after renaming, verify the renamed file is still the stale holder
    # we observed (worker + start_time); if it is fresh, restore it
    # without clobbering (os.link fails if a newer lock appeared) and
    # lose the race.
    #
    # Residual window (accepted, documented): while the stale lock is
    # renamed aside here, the path is briefly absent — if the presumed-
    # dead holder's LATE heartbeat landed just before our rename (so
    # the re-check below restores), a third contender's O_EXCL can win
    # during the aside instants, overlapping the late-reviving holder
    # for at most one heartbeat (its next renew re-reads the lock and
    # reports the loss). This is reachable only once the holder has
    # ALREADY blown its timeout — the protocol's presumed-dead rule —
    # and is why mutators must renew before every batch, as the
    # changefeed drain does.
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
    # Heartbeat re-check AFTER the exclusive move: the holder may have
    # renewed between our liveness read and the rename. Its renewal
    # protocol verifies the lock again after writing the heartbeat, so
    # exactly one of us backs off: if its heartbeat landed before our
    # rename, we see it fresh here and restore; if it landed after, the
    # holder's re-verify finds the lock gone (or replaced) and reports
    # the lease lost before touching anything else.
    if now <= _hb_time(path, moved) + timedelta(minutes=timeout_min):
        try:
            os.link(stale, lock)
        except OSError:
            pass
        os.unlink(stale)
        return miss
    os.unlink(stale)
    _clear_hb(path, moved)  # dead tenancy's sidecar — tidy up
    if _try_exclusive_create(lock, path, worker, now, forced=True):
        return won(True)
    return miss


def renew_lease(
    path: str,
    worker: str,
    start_time: str,
    now: datetime | None = None,
) -> LeaseHandle:
    """Heartbeat for a HELD lease: advance its liveness timestamp so a
    long-running holder is not presumed dead at ``timeout_min`` and
    stolen mid-work. With periodic renewal the timeout needs to exceed
    only the HEARTBEAT interval (e.g. one micro-batch), not the whole
    job — the same liveness contract as a Cosmos lease container's
    keep-alive.

    Returns a truthy handle carrying the UNCHANGED acquire-time
    identity (``start_time`` is the tenancy key for every later renew
    and the final release; the heartbeat never rewrites it). A falsy
    handle means the lease was LOST (stolen after a missed heartbeat,
    or released): the caller must stop mutating immediately.

    Protocol (ADVICE r7 — renew IN PLACE, never move the lock): the
    heartbeat is an atomic replace of a SIDECAR file
    (``<path>.hb`` = {worker, start_time, time}); liveness everywhere
    is max(lock.start_time, sidecar time when the tenancy matches).
    Because the lock file itself is never renamed or removed during a
    renewal, there is no instant at which a concurrently-firing
    contender's ``O_EXCL`` create can spuriously succeed — the old
    rename-aside renewal handed a live, actively-heartbeated lease to
    any contender that fired inside the aside window (exactly the
    overlapping-cron scenario the lease exists for).

    Renew-vs-steal interleaving (both sides verify AFTER their write):
    we re-read the lock AFTER publishing the heartbeat; a stealer
    re-reads the heartbeat AFTER its exclusive rename-aside. Whichever
    write lands second is seen by the other side's verify — if our
    heartbeat landed before the stealer's rename, the stealer finds it
    fresh and restores the lock; if after, our re-read finds the lock
    gone or replaced and we report the lease lost. For a tenancy that
    heartbeats WITHIN its timeout, at most one party ever believes it
    holds (a steal can only begin once the lease already looks timed
    out). A holder that stalls PAST its timeout is presumed dead —
    that is the protocol — and its late-reviving heartbeat may overlap
    a successor for at most one heartbeat interval (or be parked by a
    stealer's restore window, costing one SLA period of liveness);
    hence the contract that mutators renew before EVERY batch and stop
    on a falsy result — bounding the overlap to the single batch
    already in flight, whose writes stay safe under the storage tier's
    own optimistic commit claim and idempotent-in-state upserts.
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
    _write(
        _hb_path(path),
        {"worker": worker, "start_time": start_time, "time": now.isoformat()},
    )
    if not ours(_read(lock)):
        # stolen between our first read and the heartbeat publish — the
        # sidecar we just wrote references a dead tenancy and is inert
        return miss
    state = _read(path) or {}
    state.update(
        locked=True, worker=worker, start_time=start_time,
        last_heartbeat=now.isoformat(), version=str(uuid.uuid4()),
    )
    _write(path, state)
    return LeaseHandle(True, worker, start_time, forced=False)


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
        _clear_hb(path, moved)  # released tenancy's heartbeat is dead
    else:
        try:
            os.link(aside, lock)  # no-overwrite restore
        except OSError:
            pass
        os.unlink(aside)
