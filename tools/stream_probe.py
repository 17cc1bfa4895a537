"""Streaming-pipeline throughput probe.

The reference IS a streaming ETL (timer trigger → extract → change-feed
transform → upsert; see BASELINE.md: its published envelope implies
~0.08-1.7 docs/s end-to-end with a 100 ms/doc throttle). This probe
measures the Structured-Streaming analog end-to-end on this engine:
``run_incremental_transform`` drains a staged backlog of SampleItem
files (availableNow) through the transform into each sink tier, and
reports docs/sec.

Axes measured:
  - backlog size (``--docs``, default 100k rows over ``--files`` files)
  - micro-batch granularity (maxFilesPerTrigger 1 vs all-at-once) —
    the per-micro-batch fixed cost is the quantity the trigger cap
    trades against latency
  - sink tier: batch_dirs (zero write amplification) vs logtable
    (transactional MERGE per batch)

Prints one JSON line per configuration. Staging data is built once per
run under /tmp/stream_probe and reused across configurations.

Usage: python tools/stream_probe.py [--docs N] [--files K]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402
from durable_functions_cosmosdb_etl_spark.sources.generator import (  # noqa: E402
    generate_sample_items,
)
from durable_functions_cosmosdb_etl_spark.streaming.pipeline import (  # noqa: E402
    run_incremental_transform,
)

WORK = "/tmp/stream_probe"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--files", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    staging = f"{WORK}/staging_{args.docs}_{args.files}"
    if not os.path.isdir(staging):
        generate_sample_items(
            spark, count=args.docs, deterministic_ids=True
        ).repartition(args.files).write.mode("overwrite").parquet(staging)

    configs = [
        # (label, max_files_per_trigger, sink, maintenance_every)
        ("batch_dirs_1file", 1, "batch_dirs", None),
        ("batch_dirs_all", None, "batch_dirs", None),
        ("logtable_1file", 1, "logtable", None),
        ("logtable_all", None, "logtable", None),
        ("logtable_deferred_1file", 1, "logtable_deferred", None),
        # write-heavy default, END-TO-END: deferred ingest with the
        # in-loop maintenance cadence (every 4 micro-batches: log
        # checkpoint always, compact gated on delta_fraction >= 0.25)
        # — prices the full deferred+maintain cycle, not just the
        # cheap ingest half
        ("logtable_deferred_maint4", 1, "logtable_deferred", 4),
    ]
    for label, mfpt, sink, maint in configs:
        out = f"{WORK}/out_{label}"
        ckpt = f"{WORK}/ckpt_{label}"
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.perf_counter()
        run_incremental_transform(
            spark,
            staging,
            out,
            ckpt,
            max_files_per_trigger=mfpt,
            sink=sink,
            maintenance_every=maint,
        )
        dt = time.perf_counter() - t0
        n_batches = args.files if mfpt == 1 else 1
        print(
            json.dumps(
                {
                    "config": label,
                    "docs": args.docs,
                    "files": args.files,
                    "micro_batches": n_batches,
                    "wall_sec": round(dt, 3),
                    "docs_per_sec": int(args.docs / dt),
                    "sec_per_micro_batch": round(dt / n_batches, 3),
                }
            ),
            flush=True,
        )

    # --- LogTable→LogTable change-feed hop (EP2 over the engine's own
    # storage tier, streaming/changefeed.py): consume the deferred
    # ingest's table A through changes() into a derived table B —
    # bootstrap drain, then an incremental mutation batch. Prices the
    # feed join + downstream upsert per batch.
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import (  # noqa: E402
        LogTable,
    )
    from durable_functions_cosmosdb_etl_spark.streaming.changefeed import (  # noqa: E402
        run_changefeed_transform,
    )
    from pyspark.sql import functions as F  # noqa: E402

    src = LogTable(spark, f"{WORK}/out_logtable_1file", key="id")
    dst_dir = f"{WORK}/out_changefeed"
    cur = f"{WORK}/changefeed_cursor.json"
    shutil.rmtree(dst_dir, ignore_errors=True)
    for p in (cur,):
        if os.path.exists(p):
            os.remove(p)
    dst = LogTable(spark, dst_dir, key="id")
    t0 = time.perf_counter()
    st = run_changefeed_transform(
        spark, src, dst, cur,
        transform=lambda df: df.withColumn(
            "name", F.upper(F.col("name"))
        ) if "name" in df.columns else df,
    )
    dt0 = time.perf_counter() - t0
    # incremental hop: mutate ~1% of keys in A, drain the delta
    sample = src.snapshot().limit(max(1, args.docs // 100))
    src.upsert(sample.withColumn("processed", F.lit(True)))
    t1 = time.perf_counter()
    st2 = run_changefeed_transform(
        spark, src, dst, cur,
        transform=lambda df: df.withColumn(
            "name", F.upper(F.col("name"))
        ) if "name" in df.columns else df,
    )
    dt1 = time.perf_counter() - t1
    print(
        json.dumps(
            {
                "config": "changefeed_logtable_to_logtable",
                "docs": args.docs,
                "bootstrap_wall_sec": round(dt0, 3),
                "bootstrap_docs_per_sec": int(
                    max(st["rows_upserted"], 1) / dt0
                ),
                "incremental_rows": st2["rows_upserted"],
                "incremental_wall_sec": round(dt1, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
