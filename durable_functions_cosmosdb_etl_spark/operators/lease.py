"""Run lease + guard (reference operators O3/O4 orchestration analog).

The reference serializes concurrent orchestrations with a Cosmos
single-row lease: acquire iff unlocked or timed out (>5 min), with
ETag-conditional upsert so exactly one contender wins
(/root/reference/EtlProcess.cs:87-103,262-316). A Spark deployment has
one driver per pipeline, but scheduled submissions can still overlap
(previous run overran its cron slot — exactly the case the reference's
timeout handles), so the engine keeps the same guard.

Implementation: a JSON state file updated via write-temp + os.replace.
Atomic replace gives last-writer-wins; the version field (the ETag
analog) detects a lost race after the fact — the loser observes a
version it didn't write and backs off (EtlProcess.cs:306-310's
PreconditionFailed path, checked post-hoc instead of pre-conditioned).
On a shared filesystem this needs rename atomicity (POSIX/HDFS-like);
object stores would use a conditional-put (If-Match) instead — same
protocol, different primitive.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from datetime import datetime, timedelta

DEFAULT_TIMEOUT_MIN = 5  # OrchestrationLeaseTimeOut, EtlProcess.cs:24


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


def acquire_lease(
    path: str,
    worker: str,
    now: datetime | None = None,
    timeout_min: int = DEFAULT_TIMEOUT_MIN,
) -> bool:
    """Try to take the run lease; True iff this worker may run.

    Mirrors GetOrchestrationLeaseAsync: free or timed-out leases are
    (re)acquired — a lease older than ``timeout_min`` is presumed dead
    and stolen (EtlProcess.cs:94,286-292); a live lease means skip this
    run (:98-102).
    """
    now = now or datetime.now()
    state = _read(path)
    if state and state.get("locked"):
        held_at = datetime.fromisoformat(state["start_time"])
        if now <= held_at + timedelta(minutes=timeout_min):
            return False  # live lease — skip (EtlProcess.cs:98-102)
        forced = True
    else:
        forced = False
    version = str(uuid.uuid4())
    _write(
        path,
        {
            "locked": True,
            "worker": worker,
            "start_time": now.isoformat(),
            "forced": forced,
            "version": version,
        },
    )
    # Post-hoc race check (the ETag analog): if another contender
    # replaced the file between our read and write, exactly one version
    # survives — losers back off.
    final = _read(path)
    return bool(final and final.get("version") == version)


def release_lease(path: str, worker: str, now: datetime | None = None) -> None:
    """Unlock if still held by ``worker`` (ReleaseLeaseAsync,
    EtlProcess.cs:319-344). A stolen lease is left to its new owner."""
    now = now or datetime.now()
    state = _read(path)
    if not state or state.get("worker") != worker:
        return
    state.update(locked=False, end_time=now.isoformat())
    _write(path, state)
