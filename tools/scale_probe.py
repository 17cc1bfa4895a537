"""Scale probe: replicate sf0.1 up Nx and measure headline queries.

Answers "would this plan hold at 1000x?" with data instead of
assertions: fact tables (lineitem, orders, events, documents) are
replicated with shifted keys into /tmp, dimensions stay fixed (that IS
the 100 TB shape — facts grow, dims don't), and the same registered
queries run unchanged. Linear wall-time growth with flat rows/sec means
the plan is shuffle-bounded with no super-linear stage; rows/sec
*rising* with scale means fixed overhead still dominates at the smaller
size.

Usage: python tools/scale_probe.py [multipliers ...] (default 1 4 16)
Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402
from durable_functions_cosmosdb_etl_spark.sources.tables import (  # noqa: E402
    TABLES,
    load_table,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe"
PROBES = os.environ.get(
    "SPARK_GRAFT_PROBES",
    "pricing_summary,join_inner_revenue,window_running,"
    "topk_per_group,text_token_stats",
).split(",")
# fact tables get replicated with shifted ids; everything else is copied
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_scaled(spark, mult: int) -> str:
    out = f"{WORK}/x{mult}"
    os.makedirs(out, exist_ok=True)
    # SPARK_GRAFT_TABLES=documents,embeddings builds only what a probe
    # set reads (the LLM-op probes never touch the 13 GB ×1024
    # lineitem); existence is checked per TABLE so a partial build is
    # completed, not skipped, on the next run.
    only = os.environ.get("SPARK_GRAFT_TABLES")
    names = only.split(",") if only else TABLES
    for name in names:
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            continue
        src = load_table(spark, BASE, name)
        if name in FACT_KEYS and mult > 1:
            keys = FACT_KEYS[name]
            offs = {k: src.agg(F.max(k)).first()[0] + 1 for k in keys}
            # explode-based replication: ONE scan + a generator, not a
            # mult-way union (a 256-branch union is a 256-scan plan and
            # a driver-side planning hazard). Repartition the BASE table
            # BEFORE the explode — the shuffle moves only the un-replicated
            # rows (cheap) and gives the ×mult expansion real parallelism;
            # exploding first would funnel it through one map task per
            # input file (measured: a 3-file lineitem stalls a ×256 build
            # on 3 tasks of ~51M output rows each).
            n_out = max(32, min(256, 2 * mult))
            scaled = src.repartition(n_out).withColumn(
                "__rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            for k in keys:
                scaled = scaled.withColumn(
                    k, F.col(k) + F.col("__rep") * F.lit(offs[k])
                )
            # second repartition ON THE SHIFTED KEY: without it each
            # output file holds `mult` clustered copies of the same base
            # rows, which dictionary/RLE-encode into unrealistically
            # cheap scans (measured 7x faster per row at 256x) and make
            # cross-scale scan comparisons meaningless. Hashing on the
            # now-distinct key interleaves copies like organic data.
            scaled.drop("__rep").repartition(
                n_out, F.col(keys[0])
            ).write.mode("overwrite").parquet(dst)
        else:
            src.write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from durable_functions_cosmosdb_etl_spark.plans import registry

    qs = {**registry.EXTRA_QUERIES, **entrymod.queries()}
    base_rows = load_table(spark, BASE, "lineitem").count()
    for mult in mults:
        sf_dir = build_scaled(spark, mult)
        # warmup then measure (steady state, same policy as bench.py)
        timings = {}
        for measured in (False, True):
            for name in PROBES:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                if measured:
                    timings[name] = round(time.perf_counter() - t0, 3)
        total = round(sum(timings.values()), 3)
        rows = base_rows * mult
        print(
            json.dumps(
                {
                    "mult": mult,
                    "lineitem_rows": rows,
                    "total_sec": total,
                    "rows_per_sec": int(rows / total) if total else None,
                    "queries": timings,
                }
            )
        )


if __name__ == "__main__":
    # Probe hygiene (VERDICT r6 #6): probes leave /tmp clean BY DEFAULT
    # — stale multi-GB probe data measurably pollutes later bench runs
    # (page-cache pressure once flipped an AQE threshold, 4x on
    # text_tfidf). Set SPARK_GRAFT_PROBE_KEEP=1 to retain the scaled
    # data for follow-up runs (bucket_probe, plan inspection); bench.py
    # also cleans leftovers itself as a second line of defense.
    try:
        main()
    finally:
        if not os.environ.get("SPARK_GRAFT_PROBE_KEEP"):
            shutil.rmtree(WORK, ignore_errors=True)
