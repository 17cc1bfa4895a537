"""LogTable: log-structured MERGE sink (sinks/logtable.py).

Covers the transactional properties the plain-parquet sinks can't give:
snapshot isolation (readers keep a consistent file set mid-upsert),
time travel, atomic versioning (O_EXCL commit claim), replay
idempotence in table state, delete, compaction, and vacuum.
"""

from __future__ import annotations

import os

import pytest

from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
    ConcurrentCommitError,
    LogTable,
)


def _rows(df):
    return sorted((r["id"], r["val"]) for r in df.collect())


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_create_and_snapshot_roundtrip(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b"), (3, "c")]
    assert t.version() == 0
    assert set(t.snapshot().columns) == {"id", "val"}  # __b hidden


def test_create_twice_rejected(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id")
    t.create(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="already exists"):
        t.create(_mk(spark, [(2, "b")]))


def test_upsert_updates_and_inserts(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.upsert(_mk(spark, [(2, "B2"), (4, "d")]))
    assert _rows(t.snapshot()) == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # invariant: exactly one row per key
    n = t.snapshot().groupBy("id").count().filter("count > 1").count()
    assert n == 0


def test_time_travel(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert(_mk(spark, [(2, "B2")]))
    t.upsert(_mk(spark, [(1, "A3"), (9, "i")]))
    assert _rows(t.snapshot(0)) == [(1, "a"), (2, "b")]
    assert _rows(t.snapshot(1)) == [(1, "a"), (2, "B2")]
    assert _rows(t.snapshot(2)) == [(1, "A3"), (2, "B2"), (9, "i")]
    with pytest.raises(ValueError, match="does not exist"):
        t.snapshot(7)


def test_snapshot_isolation_across_upsert(spark, tmp_path):
    """A reader's DataFrame stays valid and consistent through a
    subsequent upsert — the merge writes NEW files and only logically
    removes old units, so the pinned file set still exists on disk."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(i, f"v{i}") for i in range(20)]))
    pinned = t.snapshot()  # lazy plan over version-0 files
    t.upsert(_mk(spark, [(i, "CHANGED") for i in range(20)]))
    # old snapshot still reads the ORIGINAL content after the upsert
    assert _rows(pinned) == [(i, f"v{i}") for i in range(20)]
    assert _rows(t.snapshot()) == [(i, "CHANGED") for i in range(20)]


def test_upsert_batch_dup_keys_order_col(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(spark.createDataFrame([(1, "a", 0)], "id long, val string, ver long"))
    up = spark.createDataFrame(
        [(1, "low", 1), (1, "high", 9), (2, "x", 5)],
        "id long, val string, ver long",
    )
    t.upsert(up, order_col="ver")
    got = {r["id"]: r["val"] for r in t.snapshot().collect()}
    assert got == {1: "high", 2: "x"}


def test_upsert_replay_idempotent_state(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    up = _mk(spark, [(2, "B"), (3, "c")])
    t.upsert(up)
    state1 = _rows(t.snapshot())
    t.upsert(up)  # redelivery of the same batch
    assert _rows(t.snapshot()) == state1
    assert t.version() == 2


def test_only_affected_buckets_rewritten(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=64)
    t.create(_mk(spark, [(i, f"v{i}") for i in range(200)]))
    v = t.upsert(_mk(spark, [(7, "CHANGED")]))
    entry = t.history()[v]
    # one key → exactly one bucket added and one replaced
    assert len(entry["added"]) == 1
    assert len(entry["removed"]) == 1
    assert entry["added"][0]["bucket"] == entry["removed"][0]["bucket"]


def test_delete_keys(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.delete_keys(spark.createDataFrame([(2,)], "id long"))
    assert _rows(t.snapshot()) == [(1, "a"), (3, "c")]


def test_delete_all_then_snapshot_raises(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="no data"):
        t.snapshot()
    # but time travel to before the delete still works
    assert _rows(t.snapshot(0)) == [(1, "a")]


def test_append_does_not_dedupe(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.append(_mk(spark, [(1, "dup"), (2, "b")]))
    assert len(_rows(t.snapshot())) == 3


def test_compact_preserves_content(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(i, f"v{i}") for i in range(10)]))
    for i in range(5):
        t.upsert(_mk(spark, [(i, f"up{i}")]))
    before = _rows(t.snapshot())
    v = t.compact()
    assert _rows(t.snapshot()) == before
    # live set now points only at the compaction commit's units
    live_dirs = {
        u.split("/__bucket=")[0] for u in t._live_units()
    }
    assert live_dirs == {f"data/c{v}"}


def test_concurrent_commit_detected(spark, tmp_path):
    """The commit claims EXACTLY base+1 with O_EXCL: a racing writer
    landing that version between our base-read and our claim surfaces
    as ConcurrentCommitError, never a silent lost-update on top of a
    snapshot we did not merge against."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    # simulate the race: our writer computed base=0 (so claims v1), and
    # a rival lands v1 first
    rogue = os.path.join(str(tmp_path / "t"), "_log", f"{1:020d}.json")
    with open(rogue, "w") as f:
        f.write('{"version": 1, "op": "append", "added": [], "removed": []}')
    with pytest.raises(ConcurrentCommitError):
        t._commit("upsert", [], [], v=1)
    # table state unaffected by the failed commit
    assert _rows(t.snapshot(0)) == [(1, "a")]


def test_commit_lands_on_current_base(spark, tmp_path):
    """A commit by another writer BEFORE our base-read is not a
    conflict: the next op simply merges on top of it."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    rogue = os.path.join(str(tmp_path / "t"), "_log", f"{1:020d}.json")
    with open(rogue, "w") as f:
        f.write('{"version": 1, "op": "append", "added": [], "removed": []}')
    v = t.upsert(_mk(spark, [(2, "b")]))  # base=1 → claims v2
    assert v == 2
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b")]


def test_vacuum_reclaims_dead_units_and_orphans(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(i, f"v{i}") for i in range(10)]))
    t.upsert(_mk(spark, [(i, "X") for i in range(10)]))  # replaces all buckets
    # orphan: a data dir that never got a log entry (crashed writer)
    orphan = tmp_path / "t" / "data" / "c99"
    orphan.mkdir()
    (orphan / "junk").write_text("x")
    before = _rows(t.snapshot())
    deleted = t.vacuum(retain_versions=0)
    assert any(u.startswith("data/c0") for u in deleted)  # v0 units dead
    assert "data/c99" in deleted
    assert _rows(t.snapshot()) == before  # latest unaffected
    with pytest.raises(Exception):
        t.snapshot(0).collect()  # time travel to vacuumed version fails


def test_changes_classifies_insert_update_delete(spark, tmp_path):
    """changes(v1, v2) is the produced change feed: the diff of two
    snapshots classified per key, with update rows carrying NEW values
    (including explicit NULLs — no coalesce resurrection of old data)."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))          # v0
    t.upsert(_mk(spark, [(2, "B2"), (4, "d")]))                   # v1
    t.upsert(spark.createDataFrame([(3, None)], "id long, val string"))  # v2
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))       # v3
    got = {
        r["id"]: (r["change"], r["val"])
        for r in t.changes(0, 3).collect()
    }
    assert got == {
        1: ("delete", "a"),    # delete carries the deleted values
        2: ("update", "B2"),
        3: ("update", None),   # NULLed column surfaces as NULL
        4: ("insert", "d"),
    }
    # unchanged keys are absent; adjacent-version feeds compose
    assert {r["id"] for r in t.changes(0, 1).collect()} == {2, 4}
    assert {r["id"] for r in t.changes(2, 3).collect()} == {1}


def test_changes_default_to_latest(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.upsert(_mk(spark, [(2, "b")]))
    rows = t.changes(0).collect()
    assert [(r["change"], r["id"]) for r in rows] == [("insert", 2)]


def test_schema_evolution_on_upsert(spark, tmp_path):
    """Upserts may add columns (stored rows read NULL there) or omit
    columns (the replaced row version gets NULL — whole-row-replace
    semantics); reads mergeSchema across pre/post-evolution units, and
    the change feed spans the boundary."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))  # schema: id, val
    t.upsert(
        spark.createDataFrame(
            [(2, "B2", "en"), (3, "c", "de")],
            "id long, val string, lang string",
        )
    )  # adds `lang`
    snap = {r["id"]: (r["val"], r["lang"]) for r in t.snapshot().collect()}
    assert snap == {1: ("a", None), 2: ("B2", "en"), 3: ("c", "de")}
    # the change feed crosses the schema boundary: old side lacks lang
    got = {
        r["id"]: (r["change"], r["lang"])
        for r in t.changes(0).collect()
    }
    assert got == {2: ("update", "en"), 3: ("insert", "de")}
    # an upsert OMITTING val NULLs it on the replaced row (documented
    # whole-row-replace semantics)
    t.upsert(spark.createDataFrame([(1, "fr")], "id long, lang string"))
    row1 = t.snapshot().filter("id = 1").first()
    assert row1["val"] is None and row1["lang"] == "fr"


def test_log_checkpoint_equivalent_and_time_travel(spark, tmp_path):
    """checkpoint_log() materializes the live-unit map: replay from the
    checkpoint gives the same snapshots, commits after it apply on top,
    and time travel BEFORE the checkpoint falls back to full replay."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))          # v0
    t.upsert(_mk(spark, [(2, "B1")]))                   # v1
    pre_cp = t._live_units()
    assert t.checkpoint_log() == 1
    assert t._live_units() == pre_cp                    # replay via cp identical
    t.upsert(_mk(spark, [(3, "c")]))                    # v2 (after cp)
    assert _rows(t.snapshot()) == [(1, "a"), (2, "B1"), (3, "c")]
    assert _rows(t.snapshot(0)) == [(1, "a"), (2, "b")]  # pre-cp full replay
    assert _rows(t.snapshot(1)) == [(1, "a"), (2, "B1")]
    # checkpoints are invisible to history/version bookkeeping
    assert [e["version"] for e in t.history()] == [0, 1, 2]
    assert t.version() == 2


def test_checkpointed_replay_never_opens_old_entries(spark, tmp_path):
    """The replay bound is real, not a post-parse skip: after
    checkpoint_log(), snapshot construction must not even OPEN
    pre-checkpoint log files — proven by corrupting one and opening the
    latest snapshot anyway. Time travel BELOW the checkpoint replays
    from scratch and must now fail loudly on the corrupt entry."""
    import json as _json

    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "a")]))         # v0
    t.upsert(_mk(spark, [(2, "b")]))         # v1
    t.upsert(_mk(spark, [(3, "c")]))         # v2
    cp = t.checkpoint_log()
    assert cp == 2
    t.upsert(_mk(spark, [(4, "d")]))         # v3, after the checkpoint
    v1 = os.path.join(p, "_log", f"{1:020d}.json")
    with open(v1, "w") as f:
        f.write('{"version": 1, "op": "upsert", "ad')  # truncated JSON
    t2 = LogTable(spark, p, key="id", n_buckets=2)
    # latest and post-checkpoint reads replay only entries > checkpoint
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert _rows(t2.snapshot(2)) == [(1, "a"), (2, "b"), (3, "c")]
    # pre-checkpoint time travel must walk the full log → hits v1
    with pytest.raises(_json.JSONDecodeError):
        t2.snapshot(1)


def test_old_checkpoint_bounds_replay_at_old_versions(spark, tmp_path):
    """A replay AT an old version starts from the newest checkpoint at
    or before that version — not from version 0 just because a NEWER
    checkpoint exists (code-review r11: superseded checkpoints survive
    on disk, and without consulting them a lagging feed cursor's
    lo-side rollup — exactly the deep-backlog case the saturation
    cutoff bounds — silently degraded to an O(full history) replay).
    Proven the same way as the never-opens test above: corrupt a
    pre-checkpoint entry; a read BETWEEN the two checkpoints must not
    open it."""
    import json as _json

    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "a")]))         # v0
    t.upsert(_mk(spark, [(2, "b")]))         # v1
    assert t.checkpoint_log() == 1           # older checkpoint @1
    t.upsert(_mk(spark, [(3, "c")]))         # v2
    mid = t._live_units(as_of=2)
    t.upsert(_mk(spark, [(4, "d")]))         # v3
    assert t.checkpoint_log() == 3           # newer checkpoint @3
    t.upsert(_mk(spark, [(5, "e")]))         # v4
    v0 = os.path.join(p, "_log", f"{0:020d}.json")
    with open(v0, "w") as f:
        f.write('{"version": 0, "op": "create", "ad')  # truncated JSON
    t2 = LogTable(spark, p, key="id", n_buckets=2)
    # v2 sits between the checkpoints: replay starts from the @1
    # checkpoint (never opening v0) and applies only the v2 entry
    assert t2._live_units(as_of=2) == mid
    assert _rows(t2.snapshot(2)) == [(1, "a"), (2, "b"), (3, "c")]
    # a version predating EVERY checkpoint still full-replays → hits v0
    with pytest.raises(_json.JSONDecodeError):
        t2.snapshot(0)


def test_live_units_memo_returns_copies(spark, tmp_path):
    """Per-version live maps are memoized (a diff serve replays each
    end once, not 2-4 times) — the cached map must be handed out as a
    copy, so a caller mutating its result cannot corrupt what the next
    caller sees."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))   # v0
    t.upsert(_mk(spark, [(3, "c")]))             # v1
    m1 = t._live_units(as_of=0)
    assert m1 == t._live_units(as_of=0)          # memo hit, same content
    m1.clear()                                   # caller-side mutation
    assert t._live_units(as_of=0), "cache corrupted by caller mutation"
    # and the memo never serves a stale map for a different version
    assert set(t._live_units(as_of=1)) != set(t._live_units(as_of=0))
    # Inner unit dicts are SHARED with the memo (only the outer map is
    # copied) — since round 12 they are read-only views, so the
    # u["raw"]/u["delta"] tagging pattern applied to a replayed map by
    # mistake fails loudly instead of silently corrupting every later
    # snapshot/feed/estimate at that version (VERDICT r11 #4).
    m2 = t._live_units(as_of=1)
    some_unit = next(iter(m2.values()))
    with pytest.raises(TypeError):
        some_unit["raw"] = True
    # reads are unaffected, and the frozen units still compare / json
    # round-trip through the paths that coerce them (checkpoint_log,
    # _commit removed lists)
    assert some_unit["unit"]
    t.checkpoint_log()                           # json.dump of dict(u)
    t.compact()                                  # removed = live.values()
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b"), (3, "c")]


def test_log_dir_ignores_foreign_files(spark, tmp_path):
    """A stray non-numeric .json in the log dir (a human's
    _checkpoint.bak.json or notes.json) degrades to 'ignored' in ALL
    THREE filename listers — version(), _log_entries, and
    _latest_checkpoint — instead of raising ValueError inside every
    replay (ADVICE r11)."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))   # v0
    t.checkpoint_log()
    t.upsert(_mk(spark, [(3, "c")]))             # v1
    log_dir = os.path.join(t.path, "_log")
    # "²³.json" / "_checkpoint.².json": superscript digits
    # pass str.isdigit() but raise in int() — the exact hole the guard
    # must close needs isdecimal(), not isdigit() (ADVICE r12)
    for foreign in (
        "_checkpoint.bak.json",
        "notes.json",
        "zz-manual.json",
        "²³.json",
        "_checkpoint.².json",
    ):
        with open(os.path.join(log_dir, foreign), "w") as f:
            f.write("{}")
    assert t.version() == 1
    assert [e["version"] for e in t.history()] == [0, 1]
    assert t._latest_checkpoint()["version"] == 0
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b"), (3, "c")]


def test_log_listing_memo_never_stale(spark, tmp_path):
    """The parsed log-dir listing is memoized per directory mtime
    (round 12 — at 100k commits the LISTING, not the replay, dominated
    every drain-loop-head read). The memo must never hide a write: any
    commit — through this handle or a second one — must be visible to
    version()/history() immediately afterwards, and hits require the
    quiescence margin so a same-tick write can't be masked."""
    import time as _time

    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))             # v0
    # let the dir go quiescent past the margin, then prime the memo
    _time.sleep(0.06)
    assert t.version() == 0
    assert t._log_listing_memo is not None
    # a SECOND handle (its own memo) commits — the first handle's
    # memo is keyed on dir mtime and must miss, not serve v0
    t2 = LogTable(spark, str(t.path), key="id", n_buckets=4)
    t2.upsert(_mk(spark, [(2, "b")]))            # v1
    assert t.version() == 1
    assert [e["version"] for e in t.history()] == [0, 1]
    # a dir modified within the margin is not memoized at all
    t2.upsert(_mk(spark, [(3, "c")]))            # v2
    t._log_listing_memo = None
    assert t.version() == 2  # listed < margin after the write
    assert t._log_listing_memo is None or (
        # only memoized if the write aged past the margin by the time
        # version() re-stated the dir (timing-dependent, both valid)
        t._log_listing_memo[1].latest == 2
    )


def test_listing_memo_granularity_probe(spark, tmp_path):
    """The listing memo's precondition — stored mtime granularity finer
    than the quiescence margin — is PROBED at open, not assumed
    (VERDICT r12 #4 / ADVICE r12). On this sandbox's local fs the probe
    must enable the memo; the decision rule must reject coarse stores;
    and a disabled memo must bypass memoization entirely while staying
    correct."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    # local ext4/tmpfs store nanoseconds: probe enables the memo
    assert t._listing_memo_enabled is True
    assert t._probe_mtime_granularity() is True

    # decision rule against each plausible stored granularity's
    # round-trip error for the crafted probe value (truncation):
    # ns/us/ms/10ms pass (all < 50 ms margin with 4x headroom);
    # 50ms/100ms/1s must disable
    err = LogTable._MTIME_PROBE_NS
    assert LogTable._granularity_ok(0)                       # ns
    assert LogTable._granularity_ok(err % 1_000)             # us
    assert LogTable._granularity_ok(err % 1_000_000)         # ms
    assert LogTable._granularity_ok(err % 10_000_000)        # 10 ms
    assert not LogTable._granularity_ok(err % 50_000_000)    # 50 ms
    assert not LogTable._granularity_ok(err % 100_000_000)   # 100 ms
    assert not LogTable._granularity_ok(err)                 # 1 s

    # disabled memo (what a coarse mount gets): never memoizes, reads
    # stay correct — one listdir per call instead of a stale risk
    import time as _time

    t._listing_memo_enabled = False
    t._log_listing_memo = None
    t.create(_mk(spark, [(1, "a")]))             # v0
    _time.sleep(0.06)                            # past the margin
    assert t.version() == 0
    assert t._log_listing_memo is None           # bypassed, not primed
    t.upsert(_mk(spark, [(2, "b")]))             # v1
    assert t.version() == 1
    assert [e["version"] for e in t.history()] == [0, 1]
    assert t._log_listing_memo is None
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b")]


def test_history_ops(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.upsert(_mk(spark, [(2, "b")]))
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))
    t.compact()
    assert [e["op"] for e in t.history()] == [
        "create",
        "upsert",
        "delete",
        "compact",
    ]
    assert [e["version"] for e in t.history()] == [0, 1, 2, 3]


def test_foreachbatch_streaming_upsert(spark, tmp_path):
    """LogTable as the upsert sink of a micro-batch pipeline: the same
    change-feed → transform → upsert loop the reference runs
    (EtlProcess.cs:183-206), with redelivery converging to the same
    state because upsert is idempotent in content."""
    src = tmp_path / "src"
    for i, batch in enumerate([[(1, "a"), (2, "b")], [(2, "B"), (3, "c")]]):
        _mk(spark, batch).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "seed")]))

    stream = (
        spark.readStream.schema("id long, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = stream.writeStream.foreachBatch(
        lambda df, _bid: t.upsert(df) and None
    ).trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    assert {r["id"]: r["val"] for r in t.snapshot().collect()} == {
        1: "a",
        2: "B",
        3: "c",
    }


def test_meta_mismatch_rejected(spark, tmp_path):
    """{key, n_buckets} are persisted at first commit; reopening with a
    different bucketing would hash the same keys into other buckets and
    silently break one-row-per-key — it must raise instead."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        TableMetaError,
    )

    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    with pytest.raises(TableMetaError):
        LogTable(spark, p, key="id", n_buckets=8)
    with pytest.raises(TableMetaError):
        LogTable(spark, p, key="val", n_buckets=4)
    # same layout reopens fine and keeps working
    t2 = LogTable(spark, p, key="id", n_buckets=4)
    t2.upsert(_mk(spark, [(1, "b")]))
    assert _rows(t2.snapshot()) == [(1, "b")]


def test_crash_between_data_write_and_commit(spark, tmp_path):
    """Kill point: data directory fully written, log entry never lands.
    Readers never see the orphan (not in the log); vacuum reclaims it;
    the next writer proceeds normally at the same version."""
    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    # simulate the dying writer: runs the data phase of an upsert, then
    # dies before _commit
    up = t._bucketed(_mk(spark, [(2, "X"), (3, "c")]), dedupe=True, order_col=None)
    t._write_commit_dir(up, v=1)
    # a fresh handle sees version 0 content only
    t2 = LogTable(spark, p, key="id", n_buckets=4)
    assert t2.version() == 0
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "b")]
    deleted = t2.vacuum(retain_versions=0)
    assert "data/c1" in deleted
    # the recovered writer redoes the op; same logical result commits
    v = t2.upsert(_mk(spark, [(2, "X"), (3, "c")]))
    assert v == 1
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "X"), (3, "c")]


def test_crash_mid_commit_never_truncates_log(spark, tmp_path):
    """Kill point: commit tmp written (possibly partially), link never
    happened. The version file either exists complete or not at all —
    a half-written tmp is invisible to version()/replay, does not block
    the version number, and vacuum reclaims it."""
    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    # dying writer's half-written commit payload for v1
    stale = os.path.join(p, "_log", f"{1:020d}.json.12345.tmp")
    with open(stale, "w") as f:
        f.write('{"version": 1, "op": "upsert", "ad')  # truncated JSON
    t2 = LogTable(spark, p, key="id", n_buckets=4)
    assert t2.version() == 0  # tmp not counted
    assert t2.history()  # replay parses fine
    v = t2.upsert(_mk(spark, [(2, "b")]))  # claims v1 unobstructed
    assert v == 1
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "b")]
    deleted = t2.vacuum(retain_versions=1)
    assert f"_log/{1:020d}.json.12345.tmp" in deleted


def test_commit_protocol_seam(spark, tmp_path):
    """The version claim is pluggable: a protocol that refuses the claim
    surfaces as ConcurrentCommitError with the table untouched — the
    interface an S3 conditional-put implementation plugs into."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        CommitProtocol,
        PosixCommitProtocol,
    )

    class Refuse(CommitProtocol):
        def claim(self, tmp, final):
            return False

    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=4, protocol=Refuse())
    with pytest.raises(ConcurrentCommitError):
        t.create(_mk(spark, [(1, "a")]))
    assert t.version() == -1
    # swap in the real protocol: table works, content atomic
    t2 = LogTable(spark, p, key="id", n_buckets=4, protocol=PosixCommitProtocol())
    t2.create(_mk(spark, [(1, "a")]))
    assert _rows(t2.snapshot()) == [(1, "a")]


# ---------------------------------------------------------------- merge


def _mk3(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, ver long")


def test_merge_column_patch_keeps_unlisted_columns(spark, tmp_path):
    """MERGE updates only update_cols; other target columns keep their
    stored values — the patch semantics upsert deliberately lacks."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk3(spark, [(1, "a", 10), (2, "b", 20)]))
    src = spark.createDataFrame([(2, "B2"), (5, "e")], "id long, val string")
    t.merge(src, update_cols=["val"])
    got = sorted(
        (r["id"], r["val"], r["ver"]) for r in t.snapshot().collect()
    )
    # id=2 patched val, KEPT ver=20; id=5 inserted with NULL ver
    assert got == [(1, "a", 10), (2, "B2", 20), (5, "e", None)]


def test_merge_matched_condition_gates_update(spark, tmp_path):
    """WHEN MATCHED AND s.ver > t.ver: stale source rows leave the
    target untouched (NULL condition counts as fail, SQL-style)."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk3(spark, [(1, "a", 10), (2, "b", 20)]))
    src = _mk3(spark, [(1, "A-new", 11), (2, "B-stale", 19), (3, "c", 1)])
    t.merge(src, matched_condition="s.ver > t.ver")
    got = sorted(
        (r["id"], r["val"], r["ver"]) for r in t.snapshot().collect()
    )
    assert got == [(1, "A-new", 11), (2, "b", 20), (3, "c", 1)]


def test_merge_delete_matched(spark, tmp_path):
    """WHEN MATCHED THEN DELETE — with a condition and not-matched rows
    still inserted."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    src = _mk(spark, [(2, "x"), (3, "x"), (9, "i")])
    t.merge(src, delete_matched=True)
    assert _rows(t.snapshot()) == [(1, "a"), (9, "i")]


def test_merge_update_only_skips_inserts(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a")]))
    t.merge(_mk(spark, [(1, "A1"), (7, "g")]), insert_not_matched=False)
    assert _rows(t.snapshot()) == [(1, "A1")]


def test_merge_into_empty_buckets_inserts(spark, tmp_path):
    """Merge whose keys hash only into buckets with no live units takes
    the insert-only path."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=64)
    t.create(_mk(spark, [(1, "a")]))
    # find a key whose bucket differs from id=1's
    import pyspark.sql.functions as F

    b_of = lambda k: spark.range(1).select(  # noqa: E731
        F.pmod(F.xxhash64(F.lit(k).cast("long")), F.lit(64))
    ).first()[0]
    other = next(k for k in range(2, 200) if b_of(k) != b_of(1))
    t.merge(_mk(spark, [(other, "new")]))
    assert _rows(t.snapshot()) == sorted([(1, "a"), (other, "new")])


def test_merge_only_affected_buckets_rewritten(spark, tmp_path):
    """Same locality guarantee as upsert: untouched buckets' units stay
    live across a merge."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(spark.createDataFrame(
        [(i, "v") for i in range(40)], "id long, val string"
    ))
    before = t._live_units()
    t.merge(_mk(spark, [(0, "V0")]))
    after = t._live_units()
    surviving = set(before) & set(after)
    assert surviving, "buckets not hit by the merge must keep their units"


# ---------------------------------------------------- stats & skipping


def test_commit_log_carries_footer_stats(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk3(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    added = t.history()[-1]["added"]
    assert added, "create must add units"
    total_rows = sum(e["rows"] for e in added)
    assert total_rows == 3
    # every unit logs min/max for the numeric column
    for e in added:
        s = e["stats"]["ver"]
        assert s["min"] is not None and s["min"] <= s["max"]
        assert 10 <= s["min"] and s["max"] <= 30


def test_snapshot_where_prunes_units_and_matches_filter(spark, tmp_path):
    """Data skipping: a selective predicate reads strictly fewer files
    than the full snapshot, and returns exactly snapshot().filter()."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    # two commits with DISJOINT ver ranges → the log can prove one
    # commit's units irrelevant to a range predicate
    t.create(_mk3(spark, [(i, "lo", i) for i in range(1, 50)]))
    t.append(_mk3(spark, [(i, "hi", i) for i in range(1000, 1050)]))
    full_files = set(t.snapshot().inputFiles())
    pruned = t.snapshot(where=[("ver", ">=", 1000)])
    pruned_files = set(pruned.inputFiles())
    assert pruned_files < full_files, "stats must prune the lo units"
    expect = sorted(
        (r["id"], r["ver"])
        for r in t.snapshot().filter("ver >= 1000").collect()
    )
    assert sorted((r["id"], r["ver"]) for r in pruned.collect()) == expect
    # equality probe outside every range reads zero rows
    assert t.snapshot(where=[("ver", "==", 500)]).count() == 0


def test_snapshot_where_all_pruned_keeps_schema(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk3(spark, [(1, "a", 10)]))
    out = t.snapshot(where=[("ver", ">", 99)])
    assert out.count() == 0
    assert set(out.columns) == {"id", "val", "ver"}


def test_snapshot_where_string_and_conjunction(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk3(spark, [(1, "apple", 1), (2, "pear", 2), (3, "zeta", 3)]))
    got = t.snapshot(where=[("val", ">=", "pear"), ("ver", "<=", 2)])
    assert [(r["id"], r["val"]) for r in got.collect()] == [(2, "pear")]


def test_stats_survive_checkpoint_replay(spark, tmp_path):
    """checkpoint_log must carry the unit stats forward — otherwise
    pruning silently degrades after the first checkpoint."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk3(spark, [(i, "x", i) for i in range(10)]))
    t.checkpoint_log()
    t.append(_mk3(spark, [(i, "y", i) for i in range(1000, 1010)]))
    live = t._live_units()
    assert all("stats" in e for e in live.values())
    # pruning still works through the checkpointed entries
    pruned = t.snapshot(where=[("ver", ">=", 1000)])
    assert set(pruned.inputFiles()) < set(t.snapshot().inputFiles())
    assert pruned.count() == 10


def test_changes_reads_only_touched_buckets(spark, tmp_path):
    """The feed's scan set is restricted to buckets the interval's
    commits rewrote — not the two full snapshots."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(spark.createDataFrame(
        [(i, "v") for i in range(80)], "id long, val string"
    ))
    v0 = t.version()
    t.upsert(_mk(spark, [(0, "V0")]))
    ch = t.changes(v0)
    got = [(r["change"], r["id"], r["val"]) for r in ch.collect()]
    assert got == [("update", 0, "V0")]
    full = set(t.snapshot().inputFiles()) | set(t.snapshot(v0).inputFiles())
    assert set(ch.inputFiles()) < full, "must not read untouched buckets"


def test_changes_empty_interval_returns_empty_feed(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a")]))
    v = t.version()
    ch = t.changes(v, v)
    assert ch.count() == 0
    assert ch.columns[0] == "change"
    assert {"id", "val"} <= set(ch.columns)


def test_changes_insert_then_delete_nets_to_empty(spark, tmp_path):
    """A key that appears and disappears inside the interval produces no
    change row (snapshot-diff semantics), even though its bucket was
    touched twice."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.create(_mk(spark, [(1, "a")]))
    v0 = t.version()
    t.upsert(_mk(spark, [(50, "temp")]))
    t.delete_keys(spark.createDataFrame([(50,)], "id long"))
    assert t.changes(v0).count() == 0


def test_upsert_deferred_resolves_latest_per_key(spark, tmp_path):
    """Merge-on-read: deferred batches stack as delta units; snapshot
    resolves to the highest generation per key with one row per key."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.upsert_deferred(_mk(spark, [(2, "b2"), (4, "d")]))
    t.upsert_deferred(_mk(spark, [(2, "b3"), (5, "e")]))
    assert _rows(t.snapshot()) == [
        (1, "a"), (2, "b3"), (3, "c"), (4, "d"), (5, "e")
    ]
    assert "__gen" not in t.snapshot().columns
    # time travel: the intermediate version resolves with its own deltas
    assert _rows(t.snapshot(version=1)) == [
        (1, "a"), (2, "b2"), (3, "c"), (4, "d")
    ]
    # in-batch duplicate keys resolve by order_col before the write
    t2 = LogTable(spark, str(tmp_path / "t2"), key="id", n_buckets=4)
    t2.create(_mk(spark, [(1, "a")]))
    dups = spark.createDataFrame(
        [(1, "low", 1), (1, "high", 9)], "id long, val string, ver long"
    )
    t2.upsert_deferred(dups.select("id", "val", "ver"), order_col="ver")
    got = {(r["id"], r["val"]) for r in t2.snapshot().collect()}
    assert got == {(1, "high")}


def test_upsert_deferred_commit_cost_is_batch_only(spark, tmp_path):
    """A deferred upsert adds units without removing or rewriting any —
    the log proves the commit touched only the batch."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(i, f"v{i}") for i in range(40)]))
    v = t.upsert_deferred(_mk(spark, [(1, "x")]))
    entry = [e for e in t.history() if e["version"] == v][0]
    assert entry["op"] == "upsert_delta"
    assert entry["removed"] == []
    assert all(u.get("delta") for u in entry["added"])
    # the single-key batch wrote exactly one bucket unit
    assert len(entry["added"]) == 1


def test_eager_mutators_read_through_deltas(spark, tmp_path):
    """upsert/merge/delete after deferred batches must not resurrect
    shadowed rows or duplicate keys."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert_deferred(_mk(spark, [(1, "a2"), (3, "c")]))
    t.upsert(_mk(spark, [(2, "b2")]))
    assert _rows(t.snapshot()) == [(1, "a2"), (2, "b2"), (3, "c")]
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))
    assert _rows(t.snapshot()) == [(2, "b2"), (3, "c")]
    t.merge(_mk(spark, [(3, "c9"), (6, "f")]))
    assert _rows(t.snapshot()) == [(2, "b2"), (3, "c9"), (6, "f")]


def test_compact_folds_deltas_into_base(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert_deferred(_mk(spark, [(1, "a2")]))
    before = _rows(t.snapshot())
    t.compact()
    assert _rows(t.snapshot()) == before
    live = t._live_units()
    assert not any(e.get("delta") for e in live.values())
    assert "__gen" not in t.snapshot().columns


def test_snapshot_where_correct_on_dirty_buckets(spark, tmp_path):
    """Stats skipping must not let a stale shadowed base row win: a
    filtered snapshot over dirty buckets equals filter-after-resolve."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(spark.createDataFrame(
        [(i, i) for i in range(20)], "id long, x long"
    ))
    # shift every key's x up by 100 via deferred upsert
    t.upsert_deferred(spark.createDataFrame(
        [(i, i + 100) for i in range(20)], "id long, x long"
    ))
    got = sorted(r["id"] for r in t.snapshot(where=[("x", "<", 50)]).collect())
    # after resolution no row has x<50 — the stale base rows (x<20) must
    # NOT surface even though their units' stats satisfy the predicate
    assert got == []
    got2 = sorted(
        r["id"] for r in t.snapshot(where=[("x", ">=", 110)]).collect()
    )
    assert got2 == list(range(10, 20))


def test_changes_across_deferred_commits(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert_deferred(_mk(spark, [(1, "a2"), (3, "c")]))
    feed = {
        (r["change"], r["id"], r["val"]) for r in t.changes(0, 1).collect()
    }
    assert feed == {("update", 1, "a2"), ("insert", 3, "c")}


def test_upsert_deferred_rejects_append_lineage(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.append(_mk(spark, [(1, "dup")]))
    with pytest.raises(ValueError, match="append"):
        t.upsert_deferred(_mk(spark, [(2, "b")]))


def test_append_taint_survives_eager_rewrite(spark, tmp_path):
    """Laundering regression: an eager upsert rewrites buckets holding
    append-duplicate rows into units re-tagged op='upsert' WHILE
    PRESERVING the duplicates — the raw taint must ride along, or
    upsert_deferred is accepted and merge-on-read resolution silently
    drops previously-visible rows from every snapshot."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=1)
    t.create(_mk(spark, [(1, "a")]))
    t.append(_mk(spark, [(1, "dup")]))          # duplicate key 1
    t.upsert(_mk(spark, [(2, "b")]))            # rewrites the bucket
    # duplicates survived the rewrite...
    assert sorted(r["val"] for r in t.snapshot().collect()) == [
        "a", "b", "dup",
    ]
    # ...so deferred upserts must still refuse
    with pytest.raises(ValueError, match="raw"):
        t.upsert_deferred(_mk(spark, [(3, "c")]))
    before = _rows(t.snapshot())
    # compact doesn't launder either
    t.compact()
    with pytest.raises(ValueError, match="raw"):
        t.upsert_deferred(_mk(spark, [(3, "c")]))
    assert _rows(t.snapshot()) == before


def test_certify_unique_clears_taint_or_raises(spark, tmp_path):
    """certify_unique: raises on a genuine duplicate (drops nothing);
    after the duplicate is repaired it rewrites the tainted buckets
    byte-equivalent and upsert_deferred is accepted again."""
    # n_buckets=1: the surviving keys share the raw unit's bucket, so
    # the taint persists through the repair rewrites until certified
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=1)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.append(_mk(spark, [(1, "dup")]))
    with pytest.raises(ValueError, match="certify_unique failed"):
        t.certify_unique()
    # repair: delete the duplicated key entirely, then re-insert one row
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))
    t.upsert(_mk(spark, [(1, "a9")]))
    before = _rows(t.snapshot())
    v = t.certify_unique()
    assert v == t.version()
    assert _rows(t.snapshot()) == before       # content unchanged
    t.upsert_deferred(_mk(spark, [(3, "c")]))  # accepted now
    assert _rows(t.snapshot()) == sorted(before + [(3, "c")])
    assert t.certify_unique() is None          # clean table → no-op


def test_untagged_units_are_untrusted(spark, tmp_path):
    """Units written by older module versions carry no op tag; the
    deferred-upsert guard must treat them as raw, not assume they were
    merged."""
    import json as _json

    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    # simulate the legacy log: strip op tags from every unit entry
    log = os.path.join(p, "_log", f"{0:020d}.json")
    with open(log) as f:
        e = _json.load(f)
    for u in e["added"]:
        u.pop("op", None)
    os.unlink(log)
    with open(log, "w") as f:
        _json.dump(e, f)
    t2 = LogTable(spark, p, key="id", n_buckets=2)
    with pytest.raises(ValueError, match="raw"):
        t2.upsert_deferred(_mk(spark, [(3, "c")]))
    t2.certify_unique()                        # proves the invariant
    t2.upsert_deferred(_mk(spark, [(3, "c")]))
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "b"), (3, "c")]


# ------------------------------------------- conditional-put protocol


def _protocols():
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        ConditionalPutCommitProtocol,
        PosixCommitProtocol,
    )

    return [
        pytest.param(PosixCommitProtocol, id="posix-link"),
        pytest.param(ConditionalPutCommitProtocol, id="conditional-put"),
    ]


@pytest.mark.parametrize("proto", _protocols())
def test_protocol_roundtrip(spark, tmp_path, proto):
    """create/upsert/delete/snapshot/time-travel all behave identically
    over both commit protocols."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4,
                 protocol=proto())
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert(_mk(spark, [(2, "B"), (3, "c")]))
    t.delete_keys(spark.createDataFrame([(1,)], "id long"))
    assert _rows(t.snapshot()) == [(2, "B"), (3, "c")]
    assert _rows(t.snapshot(0)) == [(1, "a"), (2, "b")]


@pytest.mark.parametrize("proto", _protocols())
def test_protocol_concurrent_commit_detected(spark, tmp_path, proto):
    """A rival landing base+1 between our base-read and our claim is a
    ConcurrentCommitError under BOTH protocols; the table is untouched."""
    p = str(tmp_path / "t")
    t = LogTable(spark, p, key="id", n_buckets=4, protocol=proto())
    t.create(_mk(spark, [(1, "a")]))
    rogue = os.path.join(p, "_log", f"{1:020d}.json")
    with open(rogue, "w") as f:
        f.write('{"version": 1, "op": "append", "added": [], "removed": []}')
    with pytest.raises(ConcurrentCommitError):
        t._commit("upsert", [], [], v=1)
    assert _rows(t.snapshot(0)) == [(1, "a")]


def test_conditional_put_race_loser_aborts_cleanly(spark, tmp_path):
    """Injected race in the conditional-put window: a rival writer's
    object lands between our upload and the store's atomic section. Our
    put must lose (If-None-Match), the rival's content must survive
    intact, and our staging object is a vacuumable orphan."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        ConditionalPutCommitProtocol,
    )

    p = str(tmp_path / "t")
    rogue = os.path.join(p, "_log", f"{1:020d}.json")

    def rival_lands():
        if not os.path.exists(rogue):
            with open(rogue, "w") as f:
                f.write(
                    '{"version": 1, "op": "append", '
                    '"added": [], "removed": []}'
                )

    t = LogTable(
        spark, p, key="id", n_buckets=4,
        protocol=ConditionalPutCommitProtocol(),
    )
    t.create(_mk(spark, [(1, "a")]))
    t.protocol.before_put = rival_lands
    with pytest.raises(ConcurrentCommitError):
        t.upsert(_mk(spark, [(2, "b")]))
    # rival's commit content is intact (not clobbered by the loser)
    with open(rogue) as f:
        assert '"op": "append"' in f.read()
    # loser's data dir is an unreferenced orphan; vacuum reclaims it
    t.protocol.before_put = None
    deleted = t.vacuum(retain_versions=0)
    assert "data/c1" in deleted
    v = t.upsert(_mk(spark, [(2, "b")]))  # recovers on top of the rival
    assert v == 2
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b")]


def test_conditional_put_crash_mid_upload_leaves_no_claim(spark, tmp_path):
    """A writer dying between upload and the store's atomic section
    leaves a staging orphan and NO version claim — a fresh writer
    proceeds at the same version (no wedge; flock dies with the
    process) and vacuum reclaims the staging object."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        ConditionalPutCommitProtocol,
    )

    class Die(RuntimeError):
        pass

    def crash():
        raise Die()

    p = str(tmp_path / "t")
    t = LogTable(
        spark, p, key="id", n_buckets=4,
        protocol=ConditionalPutCommitProtocol(),
    )
    t.create(_mk(spark, [(1, "a")]))
    t.protocol.before_put = crash
    with pytest.raises(Die):
        t.upsert(_mk(spark, [(2, "b")]))
    t2 = LogTable(
        spark, p, key="id", n_buckets=4,
        protocol=ConditionalPutCommitProtocol(),
    )
    assert t2.version() == 0               # no claim landed
    assert _rows(t2.snapshot()) == [(1, "a")]
    staged = [
        n for n in os.listdir(os.path.join(p, "_log"))
        if ".put." in n and n.endswith(".tmp")
    ]
    assert staged                          # upload orphan present
    deleted = t2.vacuum(retain_versions=0)
    assert any(".put." in d for d in deleted)
    v = t2.upsert(_mk(spark, [(2, "b")]))  # same version, unobstructed
    assert v == 1
    assert _rows(t2.snapshot()) == [(1, "a"), (2, "b")]


def test_append_rejects_live_deltas(spark, tmp_path):
    """Mirror guard of the append-lineage check: appending onto live
    delta units would let resolution collapse the appended rows."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.create(_mk(spark, [(1, "a")]))
    t.upsert_deferred(_mk(spark, [(1, "a2")]))
    with pytest.raises(ValueError, match="delta"):
        t.append(_mk(spark, [(1, "dup")]))
    t.compact()
    t.append(_mk(spark, [(1, "dup")]))  # folded: append allowed again
    assert t.snapshot().count() == 2


@pytest.mark.parametrize("protocol_name", ["posix", "condput"])
def test_multiprocess_commit_race(tmp_path, protocol_name):
    """TRUE multi-process writer race (VERDICT r5 #6): three separate
    driver PROCESSES (own interpreters, no shared in-process state —
    the flock/link atomicity is all that serializes them) each push 15
    commits through LogTable._commit with read-retry on conflict.
    Exactly one winner per version, contiguous log, no lost commits,
    and every winner's payload intact under its claimed version."""
    import json as _json
    import subprocess
    import sys

    n_writers, n_commits = 3, 15
    table = str(tmp_path / "t")
    worker = os.path.join(os.path.dirname(__file__), "_logtable_race_worker.py")
    procs, outs = [], []
    for w in range(n_writers):
        out = str(tmp_path / f"wins_{w}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, table, protocol_name, str(w),
                 str(n_commits), out],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        _err = p.communicate(timeout=300)[1]
        assert p.returncode == 0, _err.decode()[-2000:]

    from durable_functions_cosmosdb_etl_spark.sinks.logtable import LogTable

    t = LogTable(None, table, key="id")
    total = n_writers * n_commits
    # contiguous versions, nothing lost, nothing extra
    assert t.version() == total - 1
    entries = {e["version"]: e for e in t.history()}
    assert sorted(entries) == list(range(total))
    # each worker's recorded wins are disjoint and their union is the log
    claimed: dict[int, str] = {}
    for out in outs:
        with open(out) as f:
            rec = _json.load(f)
        for v in rec["wins"]:
            assert v not in claimed, f"version {v} claimed twice"
            claimed[v] = rec["writer"]
    assert sorted(claimed) == list(range(total))
    # content integrity: the entry stored under each version is the
    # WINNER's payload (a losing racer never clobbered it)
    for v, writer in claimed.items():
        assert entries[v]["added"][0]["writer"] == writer


def test_snapshot_time_travel_to_vacuumed_version_typed_error(spark, tmp_path):
    """Time travel to a version vacuum physically truncated fails with
    the typed FeedTruncatedError UP FRONT (round 7 — previously a raw
    Spark missing-file error mid-job); the latest snapshot and
    versions whose units survived stay readable, and the hot path
    (no version argument) never pays the stat check."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # rewrite every key so v0's units die once vacuumed
    t.upsert(_mk(spark, [(1, "a2"), (2, "b2"), (3, "c2")]))
    t.vacuum(retain_versions=0)
    with pytest.raises(FeedTruncatedError, match="truncated by vacuum"):
        t.snapshot(version=0)
    assert _rows(t.snapshot()) == [(1, "a2"), (2, "b2"), (3, "c2")]
    assert _rows(t.snapshot(version=1)) == [(1, "a2"), (2, "b2"), (3, "c2")]


# ------------------------------------------------------------ CDC (round 7)


def _feed_rows(df):
    return sorted(
        tuple(None if c == "__ignore" else r[c] for c in sorted(df.columns))
        for r in df.collect()
    )


def test_change_capture_equivalence_and_modes(spark, tmp_path):
    """Stored change capture (Delta-CDF analog): every interval served
    from capture must equal the snapshot-diff byte for byte — including
    a value-revert (must cancel), a same-value rewrite (no change), a
    delete of a nonexistent key (no change), schema evolution, and an
    interval SPANNING a compaction (the case the diff path degrades on
    and capture does not)."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))           # v0
    t.upsert(_mk(spark, [(2, "b2"), (4, "d")]))                    # v1
    t.upsert(_mk(spark, [(2, "b")]))                               # v2 revert
    t.delete_keys(spark.createDataFrame([(1,), (9,)], "id long"))  # v3
    t.compact()                                                    # v4
    t.upsert(_mk(spark, [(3, "c")]))                               # v5 no-op
    # v6: schema evolution — new column arrives
    t.upsert(
        spark.createDataFrame(
            [(5, "e", 7)], "id long, val string, score long"
        )
    )
    latest = t.version()
    assert latest == 6
    for a in range(latest):
        for b in range(a + 1, latest + 1):
            cap = t.changes(a, b, use_capture=True)
            diff = t.changes(a, b, use_capture=False)
            assert _feed_rows(cap) == _feed_rows(diff), (a, b)
    # recorded modes match the op semantics
    modes = {
        e["version"]: e.get("changes", {}).get("mode")
        for e in t.history()
    }
    assert modes[0] == "added_units"      # create
    assert modes[1] == "unit" and modes[2] == "unit"
    assert modes[3] == "unit"             # delete
    assert modes[4] == "none"             # compact: layout only
    assert modes[5] == "unit"             # no-op upsert still captured
    # the no-op upsert's net feed is empty
    assert t.changes(4, 5, use_capture=True).count() == 0
    # interval containing ONLY the compact: empty feed, table schema
    empty = t.changes(3, 4, use_capture=True)
    assert empty.count() == 0 and "change" in empty.columns


def test_change_capture_fallback_on_uncaptured_commits(spark, tmp_path):
    """Deferred upserts (and any commit from a capture-off writer) are
    uncaptured: auto mode falls back to the snapshot diff with equal
    results; use_capture=True refuses loudly."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b")]))
    t.upsert_deferred(_mk(spark, [(1, "a2"), (3, "c")]))
    t.upsert(_mk(spark, [(2, "b2")]))
    with pytest.raises(ValueError, match="uncaptured commit"):
        t.changes(0, t.version(), use_capture=True)
    auto = _feed_rows(t.changes(0, t.version()))
    diff = _feed_rows(t.changes(0, t.version(), use_capture=False))
    assert auto == diff
    # the sub-interval consisting only of captured commits still serves
    assert _feed_rows(t.changes(1, 2, use_capture=True)) == _feed_rows(
        t.changes(1, 2, use_capture=False)
    )


def test_change_capture_vacuum_retention_and_fallback(spark, tmp_path):
    """vacuum reclaims change units outside the retention window (and
    orphans); a feed whose interval lost its capture falls back to the
    snapshot diff, whose truncation check governs — never a raw
    missing-file error, never a wrong answer."""
    import os as _os

    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))   # v0
    t.upsert(_mk(spark, [(1, "a1")]))                      # v1
    t.upsert(_mk(spark, [(2, "b1")]))                      # v2
    t.upsert(_mk(spark, [(3, "c1")]))                      # v3
    # orphan change dir (crashed commit simulation)
    _os.makedirs(str(tmp_path / "t" / "_changes" / "c99-deadbeef"))
    deleted = t.vacuum(retain_versions=1)
    ch = set(_os.listdir(str(tmp_path / "t" / "_changes")))
    # capture for versions > horizon (= latest-1 = 2) survives: c3 only
    # (unit names carry a writer-unique uuid suffix — ADVICE r7: racing
    # writers must never scribble over each other's change rows)
    assert {d.split("-")[0] for d in ch} == {"c3"}, ch
    assert all("-" in d for d in ch), ch
    assert any(d.startswith("_changes/") for d in deleted)
    # inside retention: still capture-served
    assert _feed_rows(t.changes(2, 3, use_capture=True)) == _feed_rows(
        t.changes(2, 3, use_capture=False)
    )
    # older cursor: capture gone → fallback to diff; the diff path's
    # own retention guard decides (truncated here, since v1's units
    # were rewritten and vacuumed)
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    with pytest.raises((FeedTruncatedError, ValueError)):
        t.changes(1, 3, use_capture=True)  # refuses: unit vacuumed
    with pytest.raises(FeedTruncatedError):
        t.changes(0, 3)  # auto: fallback diff raises typed truncation


def test_schema_frame_unions_across_commits(spark, tmp_path):
    """Code-review r8 regression: the single-newest-unit schema read
    NARROWED the schema whenever the newest commit rewrote a
    pre-evolution bucket (upsert/delete touch only their buckets, so
    the newest unit can lack an evolved column). The schema frame now
    merges one unit per distinct live commit — exact, because every
    unit of a commit shares that commit's write schema — so an
    all-pruned snapshot keeps the full union schema."""
    from pyspark.sql import functions as F

    by_bucket: dict[int, list[int]] = {}
    for r in (
        spark.range(50)
        .select("id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b"))
        .collect()
    ):
        by_bucket.setdefault(r["b"], []).append(r["id"])
    a_key = by_bucket[0][0]
    b1, b2 = by_bucket[1][:2]
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, [(a_key, "a0"), (b1, "b1"), (b2, "b2")]))  # id,val
    t.upsert(  # v1: evolution lands in bucket 0 only
        spark.createDataFrame(
            [(a_key, "a1", 7)], "id long, val string, score long"
        )
    )
    # v2: NEWEST commit rewrites bucket 1 with the PRE-evolution schema
    t.delete_keys(spark.createDataFrame([(b1,)], "id long"))
    newest_unit_cols = {
        c
        for e in t.history()[-1]["added"]
        for c in spark.read.parquet(
            str(tmp_path / "t" / e["unit"].split("/__bucket=")[0])
        ).columns
    }
    assert "score" not in newest_unit_cols  # the trap is real
    # all-pruned snapshot still carries the evolved column
    pruned = t.snapshot(where=[("val", "==", "zzz")])
    assert pruned.count() == 0 and "score" in pruned.columns
    # and so does the union-schema frame itself
    frame = t._schema_frame(t._live_units())
    assert "score" in frame.columns and "val" in frame.columns


def test_vacuum_min_age_grace_protects_inflight_readers(spark, tmp_path):
    """vacuum(min_age_seconds=T) (VERDICT r7 #5, Delta's retention-check
    idiom): the feed's truncation guard is check-then-read, so a vacuum
    landing between a reader's existence check and its Spark job used
    to yield a raw missing-file error. With a grace above the longest
    concurrent read, a unit is reclaimed only once it has been
    horizon-dead that long — an in-flight reader whose plan passed the
    check always finishes. Grace zero keeps immediate reclaim."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=4,
        change_capture=True,
    )
    t.create(_mk(spark, [(i, f"v{i}") for i in range(8)]))
    t.upsert(_mk(spark, [(i, f"w{i}") for i in range(8)]))  # kills v0 units
    # in-flight reader: plan built, truncation check passed
    feed = t.changes(0, 1, use_capture=False)
    # graced vacuum: the just-dead v0 units (and v1's capture) survive
    deleted = t.vacuum(retain_versions=0, min_age_seconds=3600)
    assert not any(d.startswith("data/") for d in deleted), deleted
    assert not any(d.startswith("_changes/") for d in deleted), deleted
    # the in-flight read completes — never a raw missing-file error
    assert feed.count() == 8
    # orphan dirs get the same shield (an in-flight commit's data dir)
    import os as _os

    _os.makedirs(str(tmp_path / "t" / "data" / "c99"))
    assert "data/c99" not in t.vacuum(
        retain_versions=0, min_age_seconds=3600
    )
    # grace elapsed (= 0): everything horizon-dead is reclaimed
    deleted = t.vacuum(retain_versions=0)
    assert any(d.startswith("data/c0") for d in deleted), deleted
    assert "data/c99" in deleted
    assert any(d.startswith("_changes/") for d in deleted), deleted


def test_change_capture_vacuum_fallback_is_observable(spark, tmp_path, caplog):
    """A vacuumed capture unit silently degraded the feed's cost class
    to the snapshot diff (correct but unobservable — VERDICT r7 #1b).
    Now the degradation is surfaced twice: ``last_feed_info`` records
    the serving tier and the fallback reason, and a WARNING is logged.
    Scenario engineered so the DIFF stays fully computable after the
    capture is reclaimed: key B lands in a bucket EMPTY at v0 (its
    insert is captured as ``added_units``), is rewritten at v2 (killing
    v1's unit once vacuumed), and the interval's only touched bucket
    held nothing at the interval start — so the diff reads no vacuumed
    unit while the capture tier provably lost v1's insert record."""
    import logging as _logging

    from pyspark.sql import functions as F

    # two keys hashing to different buckets (n_buckets=2)
    by_bucket = {
        r["b"]: r["id"]
        for r in spark.range(50)
        .select("id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b"))
        .collect()
    }
    a_key, b_key = by_bucket[0], by_bucket[1]
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(a_key, "a0")]))   # v0: bucket(A) only
    t.upsert(_mk(spark, [(b_key, "b0")]))   # v1: empty bucket → added_units
    t.upsert(_mk(spark, [(b_key, "b1")]))   # v2: rewrites bucket(B)
    # pre-vacuum the interval is capture-complete, and the info says so
    assert _feed_rows(t.changes(1, 2)) == [("update", b_key, "b1")]
    # interval (1,2] = one captured update of one key (pre+post = 2
    # event rows) over a 2-row live table → ratio exactly 1.0
    assert t.last_feed_info == {
        "tier": "capture", "from": 1, "to": 2, "fallback_reason": None,
        "interval_units": 1, "net_change_ratio": 1.0,
        "forced_full_diff": False, "estimate_truncated": False,
    }
    # vacuum kills v1's data unit (v1's capture WAS that unit) — the
    # current snapshot and v2's change unit survive untouched
    t.vacuum(retain_versions=0)
    with caplog.at_level(
        _logging.WARNING,
        logger="durable_functions_cosmosdb_etl_spark.sinks.logtable",
    ):
        got = _feed_rows(t.changes(0, 2))
    # the diff is computable: the only touched bucket was EMPTY at v0,
    # so no vacuumed unit is read — net feed = B inserted at its v2 value
    assert got == [("insert", b_key, "b1")]
    info = t.last_feed_info
    assert info["tier"] == "diff" and "vacuumed" in info["fallback_reason"]
    assert any(
        "fell back to the snapshot diff" in r.message
        for r in caplog.records
    )
    # required-capture mode refuses loudly on the same interval
    with pytest.raises(ValueError, match="vacuumed"):
        t.changes(0, 2, use_capture=True)


def test_failed_feed_leaves_no_phantom_last_feed_info(spark, tmp_path):
    """ADVICE r8: ``changes()`` used to assign ``last_feed_info =
    {"tier": "diff", ...}`` BEFORE the retention guard, so a call that
    raised FeedTruncatedError left the hook claiming a successful diff
    serve of that interval (a phantom serve). Info is now recorded
    only on the successful diff exits, mirroring the capture branch:
    after a failed call the hook still shows the LAST successful
    serve."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))        # v0
    t.upsert(_mk(spark, [(1, "a1"), (2, "b1"), (3, "c1")]))     # v1
    t.upsert(_mk(spark, [(1, "a2")]))                           # v2
    assert _feed_rows(t.changes(1, 2)) == [("update", 1, "a2")]
    before = dict(t.last_feed_info)
    assert before["tier"] == "diff" and (before["from"], before["to"]) == (1, 2)
    # version validation failure: info untouched
    with pytest.raises(ValueError, match="does not exist"):
        t.changes(0, 99)
    assert t.last_feed_info == before
    # v0's units all died at v1 → vacuum truncates the (0, 2] diff
    t.vacuum(retain_versions=0)
    with pytest.raises(FeedTruncatedError):
        t.changes(0, 2)
    assert t.last_feed_info == before, "phantom serve recorded on raise"


def test_capture_version_parse_survives_decoy_path_segments(spark, tmp_path):
    """Round-9 regression guard for the single-scan capture read: the
    per-commit version is recovered from the unit path via a greedy
    ``.*/_changes/c(\\d+)-`` / ``.*/data/c(\\d+)/`` match, pinned to
    the LAST occurrence — so a user table path that itself contains a
    decoy engine-shaped segment must not corrupt the version stamps
    (a misparse would reorder events per key and net the feed wrong)."""
    root = tmp_path / "_changes" / "c5-deadbeef" / "data" / "c7" / "t"
    t = LogTable(
        spark, str(root), key="id", n_buckets=2, change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b")]))          # v0
    t.upsert(_mk(spark, [(1, "a1"), (3, "c")]))          # v1
    t.upsert(_mk(spark, [(1, "a2"), (2, "b1")]))         # v2
    t.delete_keys(spark.createDataFrame([(3,)], "id long"))  # v3
    # capture serve must equal the diff serve on the multi-commit
    # interval (version ORDER matters: key 1 nets to its v2 value)
    got_cap = _feed_rows(t.changes(0, 3, use_capture=True))
    got_diff = _feed_rows(t.changes(0, 3, use_capture=False))
    assert got_cap == got_diff
    assert ("update", 1, "a2") in got_cap

    # the INSERT capture mode (added_units → data/c{v}/ paths) under
    # the same decoy root: an upsert into an empty bucket is captured
    # as its data units, whose version parses from .../data/c(\d+)/
    from pyspark.sql import functions as F

    by_bucket = {
        r["b"]: r["id"]
        for r in spark.range(50)
        .select("id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b"))
        .collect()
    }
    t2 = LogTable(
        spark, str(root.parent / "t2"), key="id", n_buckets=2,
        change_capture=True,
    )
    t2.create(_mk(spark, [(by_bucket[0], "a0")]))            # v0
    t2.upsert(_mk(spark, [(by_bucket[1], "b0")]))            # v1: empty bucket
    t2.upsert(_mk(spark, [(by_bucket[1], "b1")]))            # v2
    assert _feed_rows(t2.changes(0, 2, use_capture=True)) == _feed_rows(
        t2.changes(0, 2, use_capture=False)
    ) == [("insert", by_bucket[1], "b1")]


def test_capture_feed_plan_is_single_scan_per_unit_kind(spark, tmp_path):
    """Round-9 plan-shape guard: the capture feed reads the WHOLE
    interval in one multi-path parquet relation per unit kind — a
    future edit reintroducing per-unit relations (one driver-side
    footer pass + one union branch per commit, ~0.2 s/unit: 23.9 s at
    a width-100 backlog) must fail here, not in a probe re-run."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(i, f"v{i}") for i in range(8)]))
    for i in range(6):  # 6 update-mode capture commits
        t.upsert(_mk(spark, [(i, f"w{i}")]))
    feed = t.changes(0, 6, use_capture=True)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans == 1, f"expected ONE parquet scan, got {n_scans}:\n{plan}"


def test_capture_feed_fails_fast_on_version_parse_miss(spark, tmp_path):
    """VERDICT r9 #1: a change-unit path that stops matching the
    engine's ``_changes/c{v}-`` scheme used to yield a silent NULL
    ``__v`` (regexp_extract returns "" → cast long → NULL), scrambling
    the min_by/max_by event ordering into a wrong net diff. The parse
    now raises executor-side with the offending file name the moment
    any scanned row misses — scheme drift fails loudly. Staged by
    renaming a committed change unit out from under the pattern and
    patching its log entry to the new path (so the existence check
    still passes and ONLY the version parse is broken)."""
    import json as _json

    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b")]))   # v0
    t.upsert(_mk(spark, [(1, "a1")]))            # v1: change unit
    log_file = os.path.join(str(tmp_path / "t"), "_log", f"{1:020d}.json")
    with open(log_file) as f:
        entry = _json.load(f)
    rel = entry["changes"]["unit"]
    assert rel.startswith("_changes/c1-")
    doctored = rel.replace("_changes/c1-", "_changes/x1-")
    os.rename(
        os.path.join(str(tmp_path / "t"), rel),
        os.path.join(str(tmp_path / "t"), doctored),
    )
    entry["changes"]["unit"] = doctored
    with open(log_file, "w") as f:
        _json.dump(entry, f)
    feed = t.changes(0, 1, use_capture=True)  # plans fine; parse is lazy
    with pytest.raises(
        Exception, match="does not match the engine version pattern"
    ):
        feed.collect()


def test_feed_interval_stats_estimates_saturation(spark, tmp_path):
    """Round-10 saturation estimator (SCALE.md §2b wired in): the
    log-only estimate prices an interval's change volume against the
    live table. A captured full-update-churn commit contributes a
    pre+post event PAIR per key, so N full-churn commits read ratio
    ≈ 2N — the documented crossover convention (threshold 2.0 = one
    full churn)."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    rows = [(i, f"v{i}") for i in range(20)]
    t.create(_mk(spark, rows))                                   # v0
    # empty interval estimate: nothing changed
    est = t.feed_interval_stats(0, 0)
    assert est["interval_rows"] == 0 and est["net_change_ratio"] == 0.0
    assert est["live_rows"] == 20
    # two full-update-churn commits: every key rewritten each time
    t.upsert(_mk(spark, [(i, f"w{i}") for i in range(20)]))      # v1
    t.upsert(_mk(spark, [(i, f"x{i}") for i in range(20)]))      # v2
    est = t.feed_interval_stats(0, 2)
    assert est["interval_units"] == 2
    assert est["interval_rows"] == 80  # 2 commits × 20 keys × pre+post
    assert est["live_rows"] == 20 and est["net_change_ratio"] == 4.0
    # half-churn single commit sits below the one-full-churn bar
    t.upsert(_mk(spark, [(i, f"y{i}") for i in range(10)]))      # v3
    est = t.feed_interval_stats(2, 3)
    assert est["interval_rows"] == 20 and est["net_change_ratio"] == 1.0
    # a compact in the interval is no logical change: contributes zero
    t.compact()                                                  # v4
    assert t.feed_interval_stats(3, 4)["interval_rows"] == 0
    # the feed itself surfaces the same signal on its telemetry hook
    t.changes(0, 2, use_capture=True).collect()
    info = t.last_feed_info
    assert info["interval_units"] == 2 and info["net_change_ratio"] == 4.0
    # memo: committed intervals are immutable — repeat call is a copy
    # of the cached result, not a second log replay
    est1 = t.feed_interval_stats(0, 2)
    est2 = t.feed_interval_stats(0, 2)
    assert est1 == est2 and est1 is not est2
    assert (0, 2, None) in t._feed_stats_memo

    # inverted interval: the (from, to] contract is enforced, not an
    # all-zero estimate that would wave a backlog through the gate
    # (ADVICE r10)
    with pytest.raises(ValueError, match="inverted interval"):
        t.feed_interval_stats(2, 0)

    # UNCAPTURED commits price at the diff tier's cost model: touched
    # buckets counted ONCE however many commits touched them (code
    # review r10 — N small commits into one bucket must not read as N
    # full bucket rewrites), at the SUM of the bucket's live rows at
    # BOTH interval ends (ADVICE r10 — the diff reads lo AND hi, so a
    # delete-heavy backlog that empties its buckets still prices its
    # from-side read).
    t2 = LogTable(spark, str(tmp_path / "t2"), key="id", n_buckets=2)
    t2.create(_mk(spark, rows))                                  # v0
    for gen in ("a", "b", "c"):
        t2.upsert(_mk(spark, [(7, f"{gen}7")]))                  # v1-v3
    est = t2.feed_interval_stats(0, 3)
    assert est["forced_full_diff"] is False
    assert est["net_change_ratio"] <= 2.0  # one bucket, lo+hi, once
    assert est["interval_rows"] < 40       # not 3 x rewritten bucket
    # a capture-off COMPACT forces the diff tier to a FULL table diff
    # (every live unit is rewritten = every bucket touched), so it
    # prices at both sides of the whole table — NOT zero, which would
    # let the most expensive serve class dodge the saturation gate
    # (VERDICT r10 #2)
    t2.compact()                                                 # v4
    est = t2.feed_interval_stats(3, 4)
    assert est["forced_full_diff"] is True
    assert est["interval_rows"] == 2 * est["live_rows"]
    assert est["net_change_ratio"] == 2.0
    # delete-heavy churn: emptying a bucket still prices the from-side
    # read of everything the diff must scan to discover the deletes
    t3 = LogTable(spark, str(tmp_path / "t3"), key="id", n_buckets=2)
    t3.create(_mk(spark, rows))                                  # v0
    t3.delete_keys(_mk(spark, rows).select("id"))                # v1
    est = t3.feed_interval_stats(0, 1)
    assert est["live_rows"] == 0
    assert est["interval_rows"] == 20, "from-side rows priced, not 0"


def test_feed_interval_stats_cutoff_bounds_the_walk(spark, tmp_path):
    """VERDICT r10 #5: with ``saturation_cutoff`` set, the estimate
    stops walking the log the moment the gate comparison is proven —
    the returned ratio is a LOWER bound ≥ cutoff, flagged
    ``estimate_truncated`` — so a deep backlog prices in
    O(commits-to-prove), not O(backlog), driver JSON. Without a cutoff
    the full estimate is unchanged."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    rows = [(i, f"v{i}") for i in range(20)]
    t.create(_mk(spark, rows))                                   # v0
    for gen in "abcde":                                          # v1-v5
        t.upsert(_mk(spark, [(i, f"{gen}{i}") for i in range(20)]))
    full = t.feed_interval_stats(0, 5)
    assert full["net_change_ratio"] == 10.0  # 5 churns × pre+post
    assert full["estimate_truncated"] is False
    bounded = t.feed_interval_stats(0, 5, saturation_cutoff=2.0)
    assert bounded["estimate_truncated"] is True
    assert bounded["net_change_ratio"] >= 2.0
    assert bounded["net_change_ratio"] < full["net_change_ratio"]
    assert bounded["live_rows"] == full["live_rows"] == 20
    # a cutoff the interval never reaches returns the full estimate
    wide = t.feed_interval_stats(0, 5, saturation_cutoff=1000.0)
    assert wide["estimate_truncated"] is False
    assert wide["net_change_ratio"] == full["net_change_ratio"]
    # memo keys are per (from, to, cutoff): the three results coexist
    assert t.feed_interval_stats(0, 5) == full
    assert t.feed_interval_stats(0, 5, saturation_cutoff=2.0) == bounded
    with pytest.raises(ValueError, match="saturation_cutoff"):
        t.feed_interval_stats(0, 5, saturation_cutoff=0)
    # a forced-full-diff detection counts toward the proof: on an
    # UNCAPTURED backlog the compact guarantees a both-ends live-table
    # read. Cutoff 1.9: high enough that the single touched bucket's
    # lo+hi bound (≈ live_rows) cannot prove it first, so the proof
    # demonstrably comes from the ffd term.
    t2 = LogTable(spark, str(tmp_path / "t2"), key="id", n_buckets=2)
    t2.create(_mk(spark, rows))                                  # v0
    t2.upsert(_mk(spark, [(0, "z0")]))                           # v1
    t2.compact()                                                 # v2
    bounded = t2.feed_interval_stats(0, 2, saturation_cutoff=1.9)
    assert bounded["forced_full_diff"] is True
    assert bounded["estimate_truncated"] is True
    assert bounded["net_change_ratio"] >= 1.9


def test_feed_interval_stats_prices_certify_on_diff_tier(spark, tmp_path):
    """Code-review r11: the diff tier's touched set replays
    added+removed of EVERY entry — maintenance included — so on a
    capture-off table an interval containing only a certify rewrite
    prices the rewritten buckets at both interval ends, NOT ~0 (the
    same blind-spot class VERDICT r10 #2 closed for compact). On a
    capture-ON table the certify is capture-recorded as no logical
    change and stays free."""
    rows = [(i, f"v{i}") for i in range(20)]
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, rows))                                   # v0
    t.append(_mk(spark, [(100, "dup")]))                         # v1 taints
    t.certify_unique()                                           # v2
    est = t.feed_interval_stats(1, 2)
    assert est["forced_full_diff"] is False  # certify ≠ full rewrite
    assert est["interval_rows"] > 0, "certify's diff buckets priced"
    # and the price is the diff's own model: lo+hi rows of exactly the
    # certified (tainted) buckets — here the one bucket key 100 hashes
    # to, read at both ends
    assert est["net_change_ratio"] > 0.0
    # capture-on: the same sequence is capture-served end to end, and
    # the certify prices zero (mode "none" — no logical change)
    tc = LogTable(
        spark, str(tmp_path / "tc"), key="id", n_buckets=2,
        change_capture=True,
    )
    tc.create(_mk(spark, rows))                                  # v0
    tc.append(_mk(spark, [(100, "dup")]))                        # v1
    tc.certify_unique()                                          # v2
    # interval (1,2] holds only the captured certify: no logical
    # change, zero price
    est_c = tc.feed_interval_stats(1, 2)
    assert est_c["interval_rows"] == 0
    assert est_c["forced_full_diff"] is False


def test_feed_interval_stats_prices_vacuum_holed_capture(spark, tmp_path):
    """Code-review r11 closed the vacuum-holed variant of the compact
    blind spot: an interval whose entries are all CAPTURED but whose
    change unit was vacuumed falls to the diff tier at serve time
    (_changes_from_capture's existence bail) — with a compact in the
    interval that is a forced FULL diff, and the estimator must price
    it so instead of the captured rows' near-zero. vacuum() also
    clears the memo, so a pre-hole estimate cannot linger."""
    rows = [(i, f"v{i}") for i in range(20)]
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, rows))                                   # v0
    t.upsert(_mk(spark, [(0, "z0")]))                            # v1 captured
    t.compact()                                                  # v2 captured
    before = t.feed_interval_stats(0, 2)
    assert before["forced_full_diff"] is False
    assert before["interval_rows"] == 2  # one churned key, pre+post
    deleted = t.vacuum(retain_versions=0)
    assert any("_changes/" in d for d in deleted), (
        "test setup: vacuum must reclaim the capture unit"
    )
    after = t.feed_interval_stats(0, 2)
    assert after["forced_full_diff"] is True, (
        "holed capture + compact = forced full diff, and the memo was "
        "cleared so the pre-hole estimate did not linger"
    )
    assert after["interval_rows"] >= 2 * after["live_rows"]
    assert after["net_change_ratio"] >= 2.0
    # the NO-compact holed variant (code-review r11, second pass): the
    # holed commit's own touched buckets price into the diff term —
    # the serve reads them at both ends after its capture bail
    t2 = LogTable(
        spark, str(tmp_path / "t2"), key="id", n_buckets=2,
        change_capture=True,
    )
    t2.create(_mk(spark, rows))                                  # v0
    t2.upsert(_mk(spark, [(i, f"w{i}") for i in range(20)]))     # v1
    deleted = t2.vacuum(retain_versions=0)
    assert any("_changes/" in d for d in deleted), (
        "test setup: vacuum must reclaim the capture unit"
    )
    holed = t2.feed_interval_stats(0, 1)
    assert holed["forced_full_diff"] is False
    # 40 capture event rows + both-ends read of the churned buckets
    # (the whole table here)
    assert holed["interval_rows"] >= 40 + 40, holed


def test_cutoff_bails_on_capture_off_backlog(spark, tmp_path):
    """Code-review r11: the early exit must also fire on a purely
    UNCAPTURED no-compact backlog — interval_rows stays 0 there (the
    diff term does all the pricing), so the proof runs on the hi-side
    rows of buckets already proven into the diff term. Before the fix
    the cutoff walk silently stayed O(backlog) for exactly the
    capture-off deep-backlog case the gate exists to protect."""
    rows = [(i, f"v{i}") for i in range(20)]
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, rows))                                   # v0
    for gen in "abcdefgh":                                       # v1-v8
        t.upsert(_mk(spark, [(i, f"{gen}{i}") for i in range(20)]))
    bounded = t.feed_interval_stats(0, 8, saturation_cutoff=1.0)
    assert bounded["estimate_truncated"] is True, (
        "touched-bucket lo+hi rows prove the cutoff without a compact"
    )
    assert bounded["net_change_ratio"] >= 1.0
    # the CALIBRATED threshold too: the lazily-loaded lo side lets the
    # bound reach 2.0 × live (hi alone tops out at 1.0 × live, which
    # would leave the capture-off case walking the whole backlog at
    # exactly the production θ)
    bounded2 = t.feed_interval_stats(0, 8, saturation_cutoff=2.0)
    assert bounded2["estimate_truncated"] is True
    assert bounded2["net_change_ratio"] >= 2.0
    # gate agreement: the unbounded estimate crosses the same bars
    full = t.feed_interval_stats(0, 8)
    assert full["net_change_ratio"] >= 2.0


def test_mixed_interval_prices_captured_buckets_into_diff(
    spark, tmp_path
):
    """Code-review r11 (second pass): on a MIXED diff-tier interval
    (one uncaptured commit among captured ones), the serve's touched
    set replays added+removed of EVERY entry — so the intact captured
    commits' buckets are genuinely read at both interval ends and must
    enter the diff term, not just their capture event rows. Before the
    fix an interval whose captured commits touched most buckets
    underpriced by nearly the whole diff cost."""
    rows = [(i, f"v{i}") for i in range(20)]
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, rows))                                   # v0
    # captured full churn: 40 capture event rows, touches BOTH buckets
    t.upsert(_mk(spark, [(i, f"w{i}") for i in range(20)]))      # v1
    # one uncaptured commit drops the interval to the diff tier
    t.upsert_deferred(_mk(spark, [(0, "z0")]))                   # v2
    est = t.feed_interval_stats(0, 2)
    assert est["forced_full_diff"] is False
    # captured event rows (40) PLUS the diff's both-ends read of every
    # touched bucket — including the captured commit's — not just the
    # deferred commit's one bucket
    assert est["interval_rows"] >= 40 + 40, est
    # fully-captured control: the same churn without the uncaptured
    # commit prices at event rows alone (capture tier, no diff term)
    tc = LogTable(
        spark, str(tmp_path / "tc"), key="id", n_buckets=2,
        change_capture=True,
    )
    tc.create(_mk(spark, rows))                                  # v0
    tc.upsert(_mk(spark, [(i, f"w{i}") for i in range(20)]))     # v1
    assert tc.feed_interval_stats(0, 1)["interval_rows"] == 40


def test_cutoff_estimate_shares_memo_with_uncut_call(spark, tmp_path):
    """Code-review r11: a cutoff walk that ran to completion IS the
    unbounded estimate and is memo-shared under the uncut key — so a
    gated drain's unsaturated loop head (cutoff call) and the serve's
    own telemetry (uncut call) pay ONE log walk per immutable
    interval, the sharing the cutoff argument silently broke."""
    rows = [(i, f"v{i}") for i in range(20)]
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, rows))                                   # v0
    t.upsert(_mk(spark, [(0, "z0")]))                            # v1
    est = t.feed_interval_stats(0, 1, saturation_cutoff=1000.0)
    assert est["estimate_truncated"] is False
    assert (0, 1, None) in t._feed_stats_memo, "shared to uncut key"
    assert t.feed_interval_stats(0, 1) == est
    # a TRUNCATED estimate is a lower bound, never shared to the
    # uncut key
    t.upsert(_mk(spark, [(i, f"w{i}") for i in range(20)]))      # v2
    t2_bounded = t.feed_interval_stats(1, 2, saturation_cutoff=0.5)
    assert t2_bounded["estimate_truncated"] is True
    assert (1, 2, None) not in t._feed_stats_memo


def test_feed_truncation_missing_rejects_inverted_interval(
    spark, tmp_path
):
    """Code-review r11: the mirror gets the same (from, to] contract
    guard as feed_interval_stats — an inverted interval must raise,
    not silently read "serveable" ([])."""
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, [(1, "x")]))                             # v0
    t.upsert(_mk(spark, [(1, "y")]))                             # v1
    t.upsert(_mk(spark, [(1, "z")]))                             # v2
    with pytest.raises(ValueError, match="inverted interval"):
        t.feed_truncation_missing(2, 0)


def test_empty_feed_schema_read_truncation_is_typed(spark, tmp_path):
    """A provably change-free CAPTURED interval whose both ends were
    later vacuumed must fail with the typed FeedTruncatedError, not a
    raw missing-file planning error (code-review r11, third pass): the
    empty feed's schema read touches live units that no capture-unit or
    touched-bucket guard ever stats. feed_truncation_missing must
    agree with the serve on exactly which units are gone."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a"), (2, "b")]))                   # v0
    t.compact()                                                  # v1 "none"
    t.delete_keys(spark.createDataFrame([(1,), (2,)], "id long"))  # v2
    t.upsert(_mk(spark, [(3, "c")]))                             # v3
    t.vacuum()  # reclaims every live@0 / live@1 unit
    # (0, 1] contains only the captured no-logical-change compact: the
    # serve is an EMPTY feed — but its schema must come from a live
    # unit of one interval end, and both ends are fully vacuumed
    missing = t.feed_truncation_missing(0, 1)
    assert missing, "mirror must flag the vacuumed schema source"
    with pytest.raises(FeedTruncatedError) as ei:
        t.changes(0, 1)
    assert ei.value.missing == missing


def test_empty_feed_schema_read_survives_partial_vacuum(spark, tmp_path):
    """The empty feed's schema rep is picked among a commit's SURVIVING
    units (any unit of one commit carries that commit's write schema):
    vacuuming SOME of an interval end's units must not break — or
    un-determinize — the change-free serve."""
    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    # two keys in DIFFERENT buckets (xxhash64 is fixed-seed, probe it)
    from pyspark.sql import functions as F

    probed = spark.range(1, 32).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b")
    ).collect()
    k_a = next(r.id for r in probed if r.b == 0)
    k_b = next(r.id for r in probed if r.b == 1)
    t.create(_mk(spark, [(k_a, "a"), (k_b, "b")]))               # v0
    t.compact()                                                  # v1 "none"
    t.upsert(_mk(spark, [(k_a, "A")]))                           # v2
    t.vacuum()  # reclaims v0's units + the compact's k_a-bucket unit
    assert t.feed_truncation_missing(0, 1) == []
    fed = t.changes(0, 1)
    assert fed.count() == 0
    assert set(fed.columns) == {"change", "id", "val"}


def test_zero_row_capture_commit_does_not_fake_serveability(
    spark, tmp_path
):
    """A zero-row ``added_units`` commit (empty-batch upsert) carries
    the capture mode tag but contributes NO event parts, so the serve
    still builds an _empty_feed — the mirror must key "capture serves
    data AND schema" on actual parts, not the tag, or it reports []
    for an interval the serve raises on (code-review r11, fifth pass;
    reproduced before the fix)."""
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    t = LogTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2,
        change_capture=True,
    )
    t.create(_mk(spark, [(1, "a")]))                             # v0
    t.upsert(spark.createDataFrame([], "id long, val string"))   # v1: 0 rows
    t.upsert(_mk(spark, [(1, "a2")]))                            # v2
    t.vacuum()  # reclaims v0's unit (rewritten at v2)
    missing = t.feed_truncation_missing(0, 1)
    assert missing, "mirror must flag the vacuumed schema source"
    with pytest.raises(FeedTruncatedError) as ei:
        t.changes(0, 1)
    assert ei.value.missing == missing


def test_diff_empty_feed_truncation_is_typed(spark, tmp_path):
    """Diff-tier variant of the schema-read hole: an interval whose
    touched buckets hold no units at either end serves an empty feed,
    and the touched-bucket retention guard never stats the schema
    source — with both ends' only unit vacuumed, the serve must raise
    the typed error and the mirror must agree."""
    from pyspark.sql import functions as F

    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (
        FeedTruncatedError,
    )

    probed = spark.range(1, 32).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b")
    ).collect()
    k_a = next(r.id for r in probed if r.b == 0)
    k_b = next(r.id for r in probed if r.b == 1)
    t = LogTable(spark, str(tmp_path / "t"), key="id", n_buckets=2)
    t.create(_mk(spark, [(k_a, "a")]))                           # v0
    t.upsert(_mk(spark, [(k_b, "b")]))                           # v1
    t.delete_keys(spark.createDataFrame([(k_b,)], "id long"))    # v2
    t.upsert(_mk(spark, [(k_a, "A")]))                           # v3
    t.vacuum()  # reclaims v0's bucket-a unit (rewritten at v3)
    # (0, 2]: touched = {k_b's bucket} only — and neither live@0 nor
    # live@2 holds a unit there (v1 added it, v2 removed it), so the
    # serve is an empty feed sourced from the vacuumed bucket-a unit
    missing = t.feed_truncation_missing(0, 2)
    assert missing, "mirror must flag the vacuumed schema source"
    with pytest.raises(FeedTruncatedError) as ei:
        t.changes(0, 2)
    assert ei.value.missing == missing
