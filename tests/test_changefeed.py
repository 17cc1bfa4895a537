"""LogTable→LogTable change-feed pipelines (streaming/changefeed.py).

The reference's EP2 loop (change feed → transform → upsert,
/root/reference/EtlProcess.cs:183-206) run end-to-end over the engine's
OWN storage tier: LogTable A → changes() → transform → LogTable B, with
a persisted cursor, capped micro-batches, kill/resume, and the
effectively-once (no dup / no loss) contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from durable_functions_cosmosdb_etl_spark.sinks.logtable import LogTable
from durable_functions_cosmosdb_etl_spark.streaming.changefeed import (
    read_cursor,
    run_changefeed_transform,
    write_cursor,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _mk(spark, tmp_path, name, n_buckets=4):
    return LogTable(spark, str(tmp_path / name), key="id", n_buckets=n_buckets)


def upcase(df):
    return df.withColumn("val", F.upper("val"))


def test_changefeed_replicates_and_transforms(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    a.create(spark.createDataFrame([(1, "x"), (2, "y")], "id long, val string"))
    a.upsert(spark.createDataFrame([(2, "z"), (3, "w")], "id long, val string"))

    stats = run_changefeed_transform(spark, a, b, cur, transform=upcase)
    assert stats["rows_upserted"] == 3 and stats["rows_deleted"] == 0
    assert _rows(b.snapshot(), "id", "val") == [(1, "X"), (2, "Z"), (3, "W")]
    assert read_cursor(cur) == a.version()

    # incremental: only the delta flows; deletes propagate by key
    a.upsert(spark.createDataFrame([(1, "q")], "id long, val string"))
    a.delete_keys(spark.createDataFrame([(3,)], "id long"))
    stats = run_changefeed_transform(spark, a, b, cur, transform=upcase)
    assert stats["rows_upserted"] == 1 and stats["rows_deleted"] == 1
    assert _rows(b.snapshot(), "id", "val") == [(1, "Q"), (2, "Z")]

    # drained: a third run is a no-op (no new target versions)
    bv = b.version()
    stats = run_changefeed_transform(spark, a, b, cur, transform=upcase)
    assert stats["batches"] == 0 and b.version() == bv


def test_changefeed_capped_batches_and_cursor(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    a.create(spark.createDataFrame([(1, "a1")], "id long, val string"))
    for i in range(2, 6):
        a.upsert(
            spark.createDataFrame([(i, f"a{i}")], "id long, val string")
        )
    # 5 source versions (0..4), cap 2 → 3 micro-batches; bootstrap batch
    # consumes [.., cur+cap-1] = version 1's snapshot
    stats = run_changefeed_transform(
        spark, a, b, cur, max_versions_per_batch=2
    )
    assert stats["batches"] == 3
    assert read_cursor(cur) == 4
    assert _rows(b.snapshot(), "id", "val") == [
        (i, f"a{i}") for i in range(1, 6)
    ]


def test_changefeed_kill_resume_no_dup_no_loss(spark, tmp_path):
    """Crash in the widest replay window (after the target commits,
    before the cursor persists): the resumed run replays the interval,
    and the target converges with no duplicate and no lost keys."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    a.create(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, val string"
        )
    )
    a.upsert(spark.createDataFrame([(3, "u3"), (8, "v8")], "id long, val string"))
    a.delete_keys(spark.createDataFrame([(5,)], "id long"))

    class Kill(RuntimeError):
        pass

    boom = [2]  # crash on the 2nd batch's post-apply window

    def crash(upto, tv):
        boom[0] -= 1
        if boom[0] == 0:
            raise Kill(f"killed after applying through {upto}")

    with pytest.raises(Kill):
        run_changefeed_transform(
            spark, a, b, cur, transform=upcase,
            max_versions_per_batch=1, after_apply=crash,
        )
    # the cursor did NOT advance past the killed batch...
    assert read_cursor(cur) == 0
    # ...and the resumed run replays it + the rest, converging exactly
    run_changefeed_transform(
        spark, a, b, cur, transform=upcase, max_versions_per_batch=1
    )
    expect = [(i, f"V{i}") for i in range(9) if i != 5]
    expect = [(i, "U3") if i == 3 else (i, v) for i, v in expect]
    assert _rows(b.snapshot(), "id", "val") == expect
    # no dup: one row per key is the stored invariant — assert it held
    got = b.snapshot().groupBy("id").count().filter("count > 1").count()
    assert got == 0
    assert read_cursor(cur) == a.version()


def test_changefeed_deferred_sink_with_maintenance(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    a.create(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id long, val string"
        )
    )
    for i in range(4):
        a.upsert(
            spark.createDataFrame(
                [(i, f"u{i}"), (100 + i, f"n{i}")], "id long, val string"
            )
        )
    run_changefeed_transform(
        spark, a, b, cur, sink="deferred",
        max_versions_per_batch=1, maintenance_every=2,
        compact_min_delta=0.0,
    )
    assert _rows(a.snapshot(), "id", "val") == _rows(
        b.snapshot(), "id", "val"
    )
    # maintenance ran: a checkpoint exists in B's log
    assert b._latest_checkpoint() is not None


def test_changefeed_medallion_chain(spark, tmp_path):
    """Three-tier chain bronze → silver → gold, each hop incremental
    through its own cursor — the derived-pipeline shape every real
    deployment builds on a change feed."""
    bronze = _mk(spark, tmp_path, "bronze")
    silver = _mk(spark, tmp_path, "silver")
    gold = _mk(spark, tmp_path, "gold")
    c1 = str(tmp_path / "c1.json")
    c2 = str(tmp_path / "c2.json")
    bronze.create(
        spark.createDataFrame(
            [(i, i * 10) for i in range(6)], "id long, amt long"
        )
    )

    def enrich(df):
        return df.withColumn("amt2", F.col("amt") * 2)

    def flag(df):
        return df.withColumn("big", F.col("amt2") >= 40)

    run_changefeed_transform(spark, bronze, silver, c1, transform=enrich)
    run_changefeed_transform(spark, silver, gold, c2, transform=flag)
    assert _rows(gold.snapshot(), "id", "big") == [
        (i, i * 20 >= 40) for i in range(6)
    ]
    # a bronze mutation ripples through both hops incrementally
    bronze.upsert(spark.createDataFrame([(1, 500)], "id long, amt long"))
    bronze.delete_keys(spark.createDataFrame([(4,)], "id long"))
    s1 = run_changefeed_transform(spark, bronze, silver, c1, transform=enrich)
    s2 = run_changefeed_transform(spark, silver, gold, c2, transform=flag)
    assert s1["rows_upserted"] == 1 and s1["rows_deleted"] == 1
    assert s2["rows_upserted"] == 1 and s2["rows_deleted"] == 1
    assert _rows(gold.snapshot(), "id", "big") == sorted(
        [(i, i * 20 >= 40) for i in range(6) if i not in (1, 4)] + [(1, True)]
    )


def test_changefeed_validation_and_cursor_io(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    with pytest.raises(ValueError, match="unknown sink"):
        run_changefeed_transform(spark, a, b, cur, sink="kafka")
    with pytest.raises(ValueError, match="max_versions_per_batch"):
        run_changefeed_transform(spark, a, b, cur, max_versions_per_batch=0)
    assert read_cursor(cur) == -1
    write_cursor(cur, 7, extra={"target_version": 3})
    assert read_cursor(cur) == 7
    # an empty source drains immediately
    stats = run_changefeed_transform(spark, a, b, str(tmp_path / "c2.json"))
    assert stats["batches"] == 0


def test_changefeed_key_mismatch_rejected(spark, tmp_path):
    a = LogTable(spark, str(tmp_path / "a"), key="id")
    b = LogTable(spark, str(tmp_path / "b"), key="doc_id")
    with pytest.raises(ValueError, match="source key"):
        run_changefeed_transform(
            spark, a, b, str(tmp_path / "c.json")
        )


def test_changefeed_across_schema_evolution(spark, tmp_path):
    """A medallion hop must survive the source gaining a column
    mid-stream: changes() unions the two snapshots' schemas across the
    boundary (missing side = NULL), and the consumer propagates the
    widened rows into the target."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    cur = str(tmp_path / "cursor.json")
    a.create(spark.createDataFrame([(1, "x"), (2, "y")], "id long, val string"))
    run_changefeed_transform(spark, a, b, cur)
    # source evolves: new column arrives with an update batch
    a.upsert(
        spark.createDataFrame(
            [(2, "z", 7), (3, "w", 9)], "id long, val string, score long"
        )
    )
    run_changefeed_transform(spark, a, b, cur)
    got = {
        r["id"]: (r["val"], r["score"])
        for r in b.snapshot().collect()
    }
    assert got == {1: ("x", None), 2: ("z", 7), 3: ("w", 9)}
