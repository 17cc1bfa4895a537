"""Focused IVF serving-latency probe (VERDICT r10 #1 settle tool).

bench.py's median-of-3 gives one coarse observation of
``similarity_ivf_prod`` per clean host window — too few samples to
separate a real ~0.1 s serving regression from this host's ambient
steal-time noise (BASELINE.md documents both anchor intervals and the
two disjoint-above observations that opened the question). This probe
times ONLY the Arrow-codebook serving family, so one quiet window
yields an order of magnitude more samples of the query in question:

  1. one untimed warmup per query (fit → codebook memo, JIT, Python
     workers — identical steady-state discipline to bench.py),
  2. N timed noop-sink runs per query (default 9), interleaved
     round-robin so a transient host blip cannot land entirely on one
     query's samples,
  3. one JSON line: per-run timings, median, min/max, rel-spread, and
     pre/post loadavg, with the same load-qualification fields the
     bench publishes so the settle evidence reads under the same
     convention.

Queries: similarity_ivf_prod (the question), similarity_ivf and
dedup_semantic (same codebook/serving machinery — controls that
separate "the IVF-prod path changed" from "the whole Arrow-codebook
family / host moved").

Usage: python tools/ivf_probe.py [n_runs]          (default 9)
       SPARK_GRAFT_SF_DIR overrides the data dir   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench as benchmod  # noqa: E402 — the gate constants, not copies
from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402

QUERIES = ["similarity_ivf_prod", "similarity_ivf", "dedup_semantic"]


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    if n_runs < 1:
        # fail before the Spark warmup, not in statistics.median([])
        # after paying it (code-review r11)
        sys.exit(f"n_runs must be >= 1, got {n_runs}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        pre = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover
        pre = [None, None, None]
    spark = get_spark("ivf_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from durable_functions_cosmosdb_etl_spark.plans import registry

    qs = {**registry.EXTRA_QUERIES, **entrymod.queries()}

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    for name in QUERIES:  # warmup (fit + memo seed, untimed)
        timed(name)
    runs: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(n_runs):  # round-robin: blips spread across queries
        for name in QUERIES:
            runs[name].append(timed(name))

    try:
        post = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover
        post = [None, None, None]
    out = {
        "metric": "ivf_serving_probe",
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "loadavg_pre": pre,
        "loadavg_post": post,
        # same gate as bench.py (BASELINE.md convention), imported —
        # not copied — so a recalibration there can't silently diverge
        # here: absolute numbers from an unqualified window must not
        # settle anything
        "load_qualified": (
            pre[0] is not None
            and pre[0] <= benchmod.LOAD_QUALIFIED_MAX
            and pre[1] is not None
            and pre[1] <= benchmod.LOAD_QUALIFIED_MAX_5MIN
        ),
        "queries": {},
    }
    for name in QUERIES:
        ts = runs[name]
        med = statistics.median(ts)
        out["queries"][name] = {
            "median": round(med, 3),
            "spread": [min(ts), max(ts)],
            "rel_spread": round((max(ts) - min(ts)) / med, 3) if med else 0.0,
            "runs": ts,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
