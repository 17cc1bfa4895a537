"""Bucketed co-located join probe: measure the SCALE.md mitigation.

scale_probe.py shows join_inner_revenue going shuffle-bound past ~64×
(the orders⋈lineitem exchange dominates once AQE abandons broadcast).
The documented 100 TB mitigation is pre-bucketing both fact tables on
the join key so the sort-merge join reads co-located buckets with NO
exchange. This tool measures that claim on the scale_probe data:

  1. loads /tmp/scale_probe/x{mult} orders + lineitem (build with
     scale_probe.py first),
  2. writes both as bucketed tables (bucketBy n_buckets ON the join
     key, sortBy the same key so the SMJ skips the per-task sort),
  3. times the identical join→agg through the plain parquet path
     (exchange on both sides) and the bucketed path (no exchange),
  4. asserts the bucketed plan really is exchange-free under the join,
     so the number can't silently measure the wrong plan.

Prints one JSON line: {"mult", "bucket_build_sec", "plain_sec",
"bucketed_sec", "speedup", ...}. The build cost is reported, not
hidden: bucketing pays off when the table is joined on that key more
than build/(plain-bucketed) times — the standard amortization argument
for curated fact tables.

Usage: python tools/bucket_probe.py [mult] [n_buckets]
       (defaults: 256 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from durable_functions_cosmosdb_etl_spark.functions.fixedpoint import (  # noqa: E402
    fixed,
    unfixed,
)
from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402

WORK = "/tmp/scale_probe"


def _join_agg(o, l):
    # the saturating stage of join_inner_revenue isolated: fact-fact
    # join on orderkey → per-order revenue aggregate (customer dim join
    # stays broadcast either way, so it is left out of the probe)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            unfixed(
                F.sum(
                    fixed(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        10000,
                    )
                ),
                10000,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _time(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = f"{WORK}/x{mult}"
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"{sf_dir} missing — run: python tools/scale_probe.py {mult}"
        )
    spark = get_spark(
        "bucket-probe",
        extra_conf={"spark.sql.warehouse.dir": f"{WORK}/warehouse"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    t0 = time.perf_counter()
    for name, df, key in [
        (f"bp_orders_x{mult}", o, "o_orderkey"),
        (f"bp_lineitem_x{mult}", l, "l_orderkey"),
    ]:
        df.write.bucketBy(n_buckets, key).sortBy(key).mode(
            "overwrite"
        ).saveAsTable(name)
    build = round(time.perf_counter() - t0, 3)

    ob = spark.table(f"bp_orders_x{mult}")
    lb = spark.table(f"bp_lineitem_x{mult}")

    # guard: the bucketed join must actually be exchange-free below the
    # final aggregate, else the comparison is meaningless
    plan = ob.join(lb, ob.o_orderkey == lb.l_orderkey)._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise SystemExit("bucketed join plan still contains an exchange:\n" + plan)

    results = {}
    for _ in range(2):  # first pass warms, second measures
        results["plain"] = _time(_join_agg(o, l))
        results["bucketed"] = _time(_join_agg(ob, lb))
    print(
        json.dumps(
            {
                "mult": mult,
                "n_buckets": n_buckets,
                "bucket_build_sec": build,
                "plain_sec": results["plain"],
                "bucketed_sec": results["bucketed"],
                "speedup": round(results["plain"] / results["bucketed"], 2),
                "amortize_after_joins": round(
                    build / max(results["plain"] - results["bucketed"], 1e-9), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    # Probe hygiene (VERDICT r6 #6): remove the bucketed-table warehouse
    # this probe created; the scaled input data belongs to scale_probe
    # (kept only under SPARK_GRAFT_PROBE_KEEP) and is not touched here.
    try:
        main()
    finally:
        if not os.environ.get("SPARK_GRAFT_PROBE_KEEP"):
            shutil.rmtree(f"{WORK}/warehouse", ignore_errors=True)
