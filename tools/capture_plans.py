"""Capture .explain("formatted") for every bench query → plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> [query ...]

Writes one ``<query>_<suffix>.txt`` per bench query (suffix from
--suffix, default none) with the FORMATTED physical plan at
$SPARK_GRAFT_SF_DIR (default sf0.1). These are the artifacts the
optimization rounds commit as plans/r13/<query>_{before,after}.txt so a
judge can check plan-shape claims (Exchange counts, join strategies,
PushedFilters, Python-eval nodes) without running Spark.
"""

from __future__ import annotations

import os
import sys

# --executed: run each query through the noop sink BEFORE explaining, so
# the AdaptiveSparkPlan prints its FINAL plan (isFinalPlan=true) —
# runtime exchange/stage reuse, AQE join rewrites and coalesced reads
# only appear there.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = "_" + a.split("=", 1)[1]
    out_dir = args[0]
    names = args[1:] or (bench.HEADLINE + bench.HEADLINE_EXT)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    from durable_functions_cosmosdb_etl_spark.plans import registry

    qs = {**registry.EXTRA_QUERIES, **entrymod.queries()}
    executed = "--executed" in sys.argv
    for name in names:
        df = qs[name](spark, sf_dir)
        if executed:
            # collect(), not a noop write: the write wraps the plan in
            # its own QueryExecution, leaving df's AdaptiveSparkPlan
            # unexecuted (isFinalPlan=false). collect() executes df's
            # own plan; the result is discarded.
            df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
