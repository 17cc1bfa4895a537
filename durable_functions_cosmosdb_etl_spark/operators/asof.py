"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for each left row, attach the right row's value at the
greatest ``right_ts <= left_ts`` within the same key (backward as-of,
the trade/quote and feature-store lookup pattern).

Implementation is a composition of built-in operators (no UDF):
union the two sides tagged by origin, then a single
``Window.partitionBy(key).orderBy(ts, tag)`` with
``last(value, ignorenulls=True)`` over the unbounded-preceding frame,
keeping only left rows. Right rows sort before left rows at equal ts
(tag 0 < 1) so ties match (``left_ts >= right_ts`` inclusive).

Scale: ONE shuffle on the key + an in-partition sort — same cost as a
regular equi-join, versus the naive range-join cross-product. Hot keys
(one user with millions of events) are the skew risk; the mitigation is
time-bucketing the key (salt by coarse time bucket, carry forward the
last value per bucket boundary) — documented, not needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    value_alias: str = "asof_value",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join of `right[value_col]` onto `left` rows.

    ``tolerance`` (SQL interval string, e.g. "30 minutes") bounds
    staleness: a match older than ``left_ts − tolerance`` is nulled —
    the feature-store freshness contract (pandas merge_asof tolerance).
    Implemented by carrying the matched right timestamp forward in the
    same window pass; no extra shuffle.
    """
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("__ts"),
        F.col(value_col).alias("__val"),
        F.lit(0).alias("__tag"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(  # noqa: E741
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__val"].dataType).alias("__val"),
        F.lit(1).alias("__tag"),
    )
    # Align schemas: right side gets nulls for left-only columns.
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    unioned = l.unionByName(r.select(*l.columns))

    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "__asof", F.last("__val", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        src_ts = F.when(F.col("__tag") == 0, F.col("__ts"))
        out = out.withColumn(
            "__match_ts", F.last(src_ts, ignorenulls=True).over(w)
        ).withColumn(
            "__asof",
            F.when(
                F.col("__match_ts")
                >= F.expr(f"__ts - INTERVAL {tolerance}"),
                F.col("__asof"),
            ),
        )
    return (
        out.filter(F.col("__tag") == 1)
        .select(*left_cols, F.col("__asof").alias(value_alias))
    )
