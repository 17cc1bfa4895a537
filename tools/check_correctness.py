"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given SF, comparing row count, sorted column names, and an
order-insensitive value hash (rows stringified, column-name-sorted,
multiset-hashed). Usage:

    python tools/check_correctness.py [--extras] [sf_dir] [query ...]

``--extras`` additionally checks the secondary-tier queries
(plans.registry.EXTRA_QUERIES) the driver never sees. Rows-only queries
are also canonicalized the way the driver does (pandas sort over every
column) so unhashable column types fail HERE, not in the driver.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from durable_functions_cosmosdb_etl_spark.session import get_spark  # noqa: E402
from durable_functions_cosmosdb_etl_spark.sources.tables import TABLES  # noqa: E402


def normalize_cell(v) -> str:
    """Canonical string for one cell.

    Deliberately does NOT coerce whole floats to int: the driver fetches
    the DuckDB oracle through pandas, where HUGEINT (e.g. ``sum(CASE …)``)
    materializes as float64 — ``976.0`` vs Spark's BIGINT ``976``. Round 2
    masked exactly that divergence with a float→int coercion here and the
    driver failed two queries the local gate passed. Typing mismatches
    must fail HERE first; the fix belongs in the oracle SQL
    (``CAST(... AS BIGINT)``), not in the comparator.
    """
    import datetime
    import math

    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = list(v)
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    row_hashes = sorted(
        hashlib.md5(
            ("|".join(normalize_cell(r[i]) for i in order)).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(row_hashes).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    extras = "--extras" in args
    args = [a for a in args if a != "--extras"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if extras:
        from durable_functions_cosmosdb_etl_spark.plans import registry

        qs = {**qs, **registry.EXTRA_QUERIES}
        oracles = {**oracles, **registry.EXTRA_ORACLES}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # Fetch through pandas (Arrow) like the driver does, so type
            # materialization quirks (int64 vs float64, timestamps)
            # surface locally instead of only in the driver's gate.
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # Emulate the driver's rows-only canonicalization: pandas
            # sort over every column — dies on unhashable cell types
            # (lists/dicts), which is exactly what killed
            # multimodal_decode in CORRECTNESS_r01.
            try:
                import pandas as _pd

                pdf = _pd.DataFrame(srows, columns=scols)
                if len(pdf):
                    pdf.sort_values(by=list(pdf.columns))
            except Exception as e:
                print(f"FAIL {name}: rows-only canonicalization: {e}")
                n_fail += 1
                continue
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            # fetchdf(), not fetchall(): the driver materializes the
            # oracle via pandas, where DuckDB HUGEINT becomes float64.
            dpdf = con.execute(oracles[name]).fetchdf()
            dcols = list(dpdf.columns)
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sh = value_hash(scols, srows)
            dh = value_hash(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {
                    tuple(
                        normalize_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                dset = {
                    tuple(
                        normalize_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"    duck-only:  {x}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
