"""LogTable-to-LogTable incremental pipelines: consume the change feed
the engine itself produces.

This closes the reference's EP2 loop (change feed → transform → upsert,
/root/reference/EtlProcess.cs:183-206) over the engine's OWN storage
tier: ``LogTable.changes()`` is the producer half (the Cosmos change
feed analog), and :func:`run_changefeed_transform` is the consumer half
(the CosmosDBTrigger + upsert analog) — so a medallion chain
(raw LogTable → transform → derived LogTable → …) runs end-to-end with
the same effectively-once contract as the file-source pipeline in
``streaming/pipeline.py``.

| reference (EtlProcess.cs)            | here                           |
|--------------------------------------|--------------------------------|
| CosmosDBTrigger change feed (:183)   | LogTable.changes(cur, upto)    |
| lease container continuation (:184)  | cursor file (commit version)   |
| MaxItemsPerInvocation=10 (:186)      | max_versions_per_batch         |
| per-invocation transform (:194-205)  | caller's transform(df)         |
| upsert on /id (:188-206)             | target.upsert / upsert_deferred|

Why a driver-side drain loop and not ``readStream``: the source of
truth for "what changed" is the commit LOG, a driver-readable metadata
structure — offsets are commit versions, and each micro-batch's data is
a full DataFrame plan (``changes()`` is a bucket-pruned outer join that
must run as Spark jobs, which a DataSource stream reader's executor-side
``read(partition)`` cannot launch). Structured Streaming's availableNow
file trigger has the same architecture internally: the driver lists
what is new, plans one batch per cap, records the offset after the
batch commits. The loop below is that exact protocol with the commit
version as the offset — Delta's own streaming source does the same
(reservoir version + index as the offset).

Exactly-once (state-level) argument, same shape as the streaming sinks'
"idempotent in state":

1. The cursor is persisted (atomic tmp+rename+fsync, like a streaming
   checkpoint offset file) only AFTER the batch's target commits land.
2. A crash anywhere therefore replays a suffix of version intervals.
3. Replay converges: ``changes(cur, upto)`` over committed versions is
   deterministic, the caller's transform must be deterministic and
   key-preserving (documented contract), and upsert/delete_keys are
   idempotent in STATE — re-applying the same rows yields the same
   stored table (possibly through extra no-op-in-state versions on the
   target, never duplicate or lost rows).

At 100 TB: each batch reads only the buckets its version interval
touched (``changes()``'s log-driven pruning), the upsert rewrites only
the buckets the transformed keys hash into, and the cursor/log
operations are O(commits) driver metadata — nothing scales with table
size except the actually-changed data.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.logtable import LogTable


def read_cursor(cursor_path: str) -> int:
    """Last fully-applied source version; -1 when never run."""
    try:
        with open(cursor_path) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        return -1


def write_cursor(cursor_path: str, version: int, extra: dict | None = None) -> None:
    """Atomically persist the cursor (tmp + fsync + rename + dir fsync —
    the same durability discipline as the commit protocols: a cursor
    that says "applied through v" must never survive a crash that the
    application of v itself did not)."""
    os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)
    payload = {"version": version, **(extra or {})}
    tmp = f"{cursor_path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, cursor_path)
    dfd = os.open(os.path.dirname(cursor_path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def run_changefeed_transform(
    spark: SparkSession,
    source: LogTable,
    target: LogTable,
    cursor_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_versions_per_batch: int | None = None,
    sink: str = "upsert",
    maintenance_every: int | None = None,
    compact_min_delta: float = 0.25,
    after_apply: Callable[[int, int], None] | None = None,
) -> dict:
    """Drain the source table's change feed into the target table
    (availableNow-style: consume up to the source version observed at
    each loop head, in ``max_versions_per_batch``-capped micro-batches,
    then stop). Re-invoke on a cadence — or under the O1 scheduled
    trigger — to keep the derived table current; the persisted cursor
    makes every invocation incremental.

    - ``transform``: DataFrame → DataFrame over the non-delete feed
      rows (``change`` column already dropped). MUST be deterministic
      and key-preserving 1:1 (each input key appears exactly once in
      the output, unchanged) — that is what makes crash-replay
      convergent and lets deletes propagate by key. ``None`` =
      identity (pure replication).
    - ``sink="upsert"``: eager per-batch MERGE semantics on the target
      (stored table always one-row-per-key, merge-free reads).
      ``sink="deferred"``: ``upsert_deferred`` delta appends — commit
      cost = batch size regardless of target size; pair with
      ``maintenance_every`` exactly as in streaming/pipeline.py (the
      recommended tier for write-heavy feeds, SCALE.md §2b).
    - Deletes in the feed propagate as ``target.delete_keys`` on the
      same batch, after the upsert — within a batch the feed holds at
      most one change row per key, so the two commits never touch the
      same key.
    - ``after_apply(upto, target_version)``: test seam, called after a
      batch's target commits but BEFORE its cursor persist — the widest
      crash-replay window; raising here simulates the kill.

    Returns ``{"batches", "rows_upserted", "rows_deleted",
    "from_version", "to_version"}``.
    """
    if sink not in ("upsert", "deferred"):
        raise ValueError(f"unknown sink mode: {sink!r}")
    if max_versions_per_batch is not None and max_versions_per_batch < 1:
        raise ValueError("max_versions_per_batch must be >= 1")
    if source.key != target.key:
        # Deletes propagate BY KEY COLUMN NAME; a differently-keyed
        # target would bucket them under the wrong mapping. A renaming
        # transform cannot fix this (deletes bypass the transform).
        raise ValueError(
            f"source key {source.key!r} != target key {target.key!r}"
        )
    key = source.key
    stats = {
        "batches": 0,
        "rows_upserted": 0,
        "rows_deleted": 0,
        "from_version": read_cursor(cursor_path),
        "to_version": read_cursor(cursor_path),
    }
    n_batches = 0
    while True:
        cur = read_cursor(cursor_path)
        latest = source.version()
        if latest <= cur:
            break
        upto = (
            min(latest, cur + max_versions_per_batch)
            if max_versions_per_batch is not None
            else latest
        )
        if cur < 0:
            # Bootstrap batch: the feed "from the beginning" is the
            # whole snapshot as inserts (Delta CDF's startingVersion=0
            # convention). snapshot() raises when nothing is live at
            # that version (e.g. created-then-all-deleted) — an empty
            # feed, not an error, for a consumer.
            try:
                base = source.snapshot(version=upto)
                feed = base.select(
                    F.lit("insert").alias("change"), *base.columns
                )
            except ValueError:
                feed = None
        else:
            try:
                feed = source.changes(cur, upto)
            except ValueError:
                feed = None  # both versions empty of units: nothing changed
        if feed is not None:
            # One materialization serves the change-count probe and the
            # two target commits (the feed is a bucket-pruned join —
            # cheap, but not free three times).
            feed = feed.cache()
            counts = {
                r["change"]: r["n"]
                for r in feed.groupBy("change")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            n_ups = counts.get("insert", 0) + counts.get("update", 0)
            n_dels = counts.get("delete", 0)
            if n_ups:
                ups = feed.filter(F.col("change") != "delete").drop("change")
                out = transform(ups) if transform is not None else ups
                if target.version() < 0:
                    target.create(out)
                elif sink == "deferred":
                    target.upsert_deferred(out)
                else:
                    target.upsert(out)
            if n_dels:
                target.delete_keys(
                    feed.filter(F.col("change") == "delete").select(key)
                )
            feed.unpersist()
            stats["rows_upserted"] += n_ups
            stats["rows_deleted"] += n_dels
            n_batches += 1
            stats["batches"] = n_batches
            if (
                maintenance_every
                and n_batches % maintenance_every == 0
                and target.version() >= 0
                # guard: a drained interval can be all no-ops (e.g. a
                # compact-only window), leaving the target still empty
            ):
                if target.delta_fraction() >= compact_min_delta:
                    target.compact()
                target.checkpoint_log()
        if after_apply is not None:
            after_apply(upto, target.version())
        write_cursor(
            cursor_path, upto, extra={"target_version": target.version()}
        )
        stats["to_version"] = upto
    return stats
