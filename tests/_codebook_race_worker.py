"""Subprocess worker for the cross-process codebook persist race test
(VERDICT r7 #3, style of the multi-process LogTable commit race).

Each worker is its OWN driver process with its OWN SparkSession. Both
race ``fit_or_load_ivf_centroids`` on one ``codebook_path``: the fit is
deterministic given (data, params), each persist publishes into a
private token dir before atomically replacing the meta, so both must
return identical centroids and readers must never see a torn artifact.

Protocol (sync files under the work dir):
1. build session, read the corpus, touch ``ready_<id>``; wait for ``go``
2. call ``fit_or_load_ivf_centroids`` on the SHARED codebook path
3. write the returned centroids to ``attempted_<id>`` (atomic rename)

argv: work_dir worker_id(0|1)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    work, wid = sys.argv[1:3]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"cb-race-{wid}")
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from durable_functions_cosmosdb_etl_spark.operators import similarity as sim

    corpus = spark.read.parquet(f"{work}/corpus.parquet")
    open(f"{work}/ready_{wid}", "w").close()
    while not os.path.exists(f"{work}/go"):
        time.sleep(0.05)

    cb = sim.fit_or_load_ivf_centroids(
        corpus, f"{work}/cb", n_centroids=3, min_fit_rows=2
    ).collect()
    out = {
        str(r["centroid_id"]): [float(x) for x in r["centroid"]] for r in cb
    }
    tmp = f"{work}/attempted_{wid}.tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, f"{work}/attempted_{wid}")
    spark.stop()


if __name__ == "__main__":
    main()
