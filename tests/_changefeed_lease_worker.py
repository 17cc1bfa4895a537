"""Subprocess worker for the cross-process changefeed lease-exclusivity
test (VERDICT r6 #2, style of the multi-process LogTable commit race).

Each worker is its OWN driver process with its OWN SparkSession — no
shared in-process state; the lease file's O_EXCL create is all that can
serialize the two drains. Protocol (sync files under the work dir):

1. build session, open tables, touch ``ready_<id>``; wait for ``go``
2. call ``run_changefeed_transform(lease_path=...)``. Only the lease
   WINNER reaches ``after_apply``: it advertises ``in_drain_<id>`` and
   HOLDS the drain open until the other worker's ``attempted_<other>``
   exists (or 30 s) — forcing the loser's acquire attempt to land
   inside the winner's drain window, which makes the test
   deterministic instead of a timing coin-flip.
3. write the returned stats to ``attempted_<id>`` (atomic rename).

argv: work_dir worker_id(0|1)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    work, wid = sys.argv[1:3]
    other = str(1 - int(wid))
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"cf-lease-{wid}")
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from durable_functions_cosmosdb_etl_spark.sinks.logtable import LogTable
    from durable_functions_cosmosdb_etl_spark.streaming.changefeed import (
        run_changefeed_transform,
    )

    src = LogTable(spark, f"{work}/a", key="id")
    dst = LogTable(spark, f"{work}/b", key="id")
    open(f"{work}/ready_{wid}", "w").close()
    while not os.path.exists(f"{work}/go"):
        time.sleep(0.05)

    def hold(upto: int, tv: int) -> None:
        open(f"{work}/in_drain_{wid}", "w").close()
        deadline = time.time() + 30
        while time.time() < deadline:
            if os.path.exists(f"{work}/attempted_{other}"):
                return
            time.sleep(0.05)

    stats = run_changefeed_transform(
        spark,
        src,
        dst,
        f"{work}/cursor.json",
        lease_path=f"{work}/lease.json",
        after_apply=hold,
    )
    tmp = f"{work}/attempted_{wid}.tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, f"{work}/attempted_{wid}")
    spark.stop()


if __name__ == "__main__":
    main()
