"""Extended relational surface: full/cross joins, pivot, exact
percentiles, SQL subqueries (IN / EXISTS / scalar), analytic window
distributions, map functions, union-by-name.

Rounds out SURVEY.md §2.2 categories beyond plans/relational.py. The
subquery entries run through ``spark.sql`` on registered temp views —
exercising the engine's SQL surface (Catalyst rewrites IN → left-semi,
EXISTS → semi, scalar subquery → broadcast scalar) rather than the
DataFrame builder path used elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Joins: full outer, cross
# --------------------------------------------------------------------------


@query(
    "join_full",
    extra=True,
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(n_cust, 0)  AS n_cust,
           coalesce(n_supp, 0)  AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (customer vs supplier presence
    per nation). Both sides pre-aggregate to |nations| rows before the
    join, so the full-outer shuffle is tiny regardless of fact size —
    the aggregate-then-join shape that survives 100 TB.
    """
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.coalesce(c["nk"], s["nk"]).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_cross",
    extra=True,
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (cartesian) of two tiny dimensions — BroadcastNested-
    LoopJoin. Only ever valid when one side is provably small; the plan
    broadcasts the distinct-status side (≤3 rows).
    """
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(s))


# --------------------------------------------------------------------------
# Pivot + exact percentiles
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS p_urgent,
           CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
                AS BIGINT) AS p_high,
           CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
                AS BIGINT) AS p_medium,
           CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                         THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT) AS p_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values.

    Passing the value list skips Catalyst's extra distinct-collect job
    (without it, pivot first runs a query just to discover the columns) —
    at 100 TB that's one full scan saved. Pivot compiles to a single
    hash aggregate with one CASE-filtered column per value: one shuffle.
    """
    renames = {
        "1-URGENT": "p_urgent",
        "2-HIGH": "p_high",
        "3-MEDIUM": "p_medium",
        "4-NOT SPECIFIED": "p_notspec",
        "5-LOW": "p_low",
    }
    out = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    out = out.select(
        "o_orderstatus", *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(renames[v]) for v in _PRIORITIES]
    )
    return out


@query(
    "agg_unpivot",
    extra=True,
    oracle="""
    WITH long AS (
        SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
    SELECT l_returnflag, metric,
           count(*) AS n,
           CAST(sum(CAST(round(val * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total,
           CAST(round(min(val) * 100) AS BIGINT) / 100.0 AS lo,
           CAST(round(max(val) * 100) AS BIGINT) / 100.0 AS hi
    FROM long GROUP BY l_returnflag, metric
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns → long (metric, val) rows,
    then a per-(flag, metric) profile — the inverse of ``agg_pivot`` and
    the standard reshape before generic per-metric aggregation or
    plotting pipelines.

    ``DataFrame.unpivot`` compiles to an Expand node: each input row is
    emitted once per measure column in the SAME task — no shuffle, no
    join, and the downstream aggregate is an ordinary hash agg on
    (flag, metric). The oracle spells it as UNION ALL of per-column
    scans, which DuckDB folds over one scan; values are identical,
    fixed-point-summed for cross-engine parity.
    """
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    long = l.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    cents = lambda c: (F.round(c * 100, 0).cast("long") / F.lit(100.0))  # noqa: E731
    return long.groupBy("l_returnflag", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("val") * 100, 0).cast("long")).cast("double")
            / F.lit(100.0)
        ).alias("total"),
        cents(F.min("val")).alias("lo"),
        cents(F.max("val")).alias("hi"),
    )


@query(
    "agg_percentile",
    extra=True,
    oracle="""
    SELECT o_orderstatus,
           CAST(round(quantile_cont(o_totalprice, 0.25) * 100) AS BIGINT)
               / 100.0 AS p25,
           CAST(round(quantile_cont(o_totalprice, 0.50) * 100) AS BIGINT)
               / 100.0 AS p50,
           CAST(round(quantile_cont(o_totalprice, 0.75) * 100) AS BIGINT)
               / 100.0 AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (SQL PERCENTILE_CONT
    semantics). Exact percentile buffers each group's values — fine for
    bounded groups; the 100 TB path for high-cardinality groups is
    `approx_percentile(col, p, accuracy)` (KLL-sketch, mergeable,
    map-side combinable) with identical plan shape.

    Both engines interpolate (1-f)*lo + f*hi on the same sorted doubles,
    so the pre-round values are bit-identical; the cents round is
    portable (round-to-integer of the same double).
    """
    o = _t(spark, sf_dir, "orders")

    def pct(p: float, name: str):
        c = F.percentile("o_totalprice", F.lit(p))
        return (F.round(c * 100, 0).cast("long") / F.lit(100.0)).alias(name)

    return o.groupBy("o_orderstatus").agg(
        pct(0.25, "p25"), pct(0.50, "p50"), pct(0.75, "p75")
    )


# --------------------------------------------------------------------------
# Subqueries (Spark SQL surface)
# --------------------------------------------------------------------------


@query(
    "subquery_in",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via spark.sql — Catalyst rewrites to a left-semi join
    (broadcast here: the filtered customer side is small). Same shuffle
    economics as join_semi, but exercises the SQL front door.
    """
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        """
    )


@query(
    "subquery_exists",
    extra=True,
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via spark.sql — decorrelated by Catalyst into a
    semi join on the correlation key. No driver-side iteration; the
    correlated predicate becomes an equi-join condition.
    """
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


@query(
    "subquery_scalar",
    extra=True,
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice >
        (SELECT CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
                / 100.0 / count(*)
         FROM part)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (rows above mean retail price). The scalar
    aggregate is computed once and broadcast into the filter. Mean built
    from an integer fixed-point sum so the threshold is bit-identical
    across engines (see functions/fixedpoint.py).
    """
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice >
            (SELECT CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                         AS DOUBLE) / 100.0 / count(*)
             FROM part)
        """
    )


# --------------------------------------------------------------------------
# Analytic distribution windows
# --------------------------------------------------------------------------


@query(
    "agg_minmax_by",
    extra=True,
    oracle="""
    WITH m AS (SELECT max(o_orderkey) + 1 AS mult FROM orders),
    k AS (
        SELECT o_orderstatus, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) * m.mult
                   + o_orderkey AS ord_key
        FROM orders CROSS JOIN m)
    SELECT o_orderstatus,
           arg_max(o_orderkey, ord_key) AS priciest_order,
           arg_min(o_orderkey, ord_key) AS cheapest_order
    FROM k GROUP BY o_orderstatus
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (argmin/argmax aggregates): which order is the
    priciest/cheapest per status — one hash aggregate instead of the
    window-rank detour. Both engines leave ties unspecified, so the
    ordering key is made UNIQUE: price cents scaled by a multiplier
    derived from the DATA (max orderkey + 1, a broadcast one-row
    scalar) rather than a constant — a fixed constant is only injective
    while orderkeys stay under it, which silently breaks at higher
    scale factors. Packed key stays < 2^63 up to ~sf10000 (cents ≤
    ~6e7 × multiplier ≤ ~6e10).
    """
    o = _t(spark, sf_dir, "orders")
    mult = o.agg((F.max("o_orderkey") + 1).alias("mult"))
    k = o.crossJoin(F.broadcast(mult)).select(
        "o_orderstatus",
        "o_orderkey",
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
            * F.col("mult")
            + F.col("o_orderkey")
        ).alias("ord_key"),
    )
    return k.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "ord_key").alias("priciest_order"),
        F.min_by("o_orderkey", "ord_key").alias("cheapest_order"),
    )


@query(
    "agg_boolean",
    extra=True,
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0)  AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(count(*) FILTER (WHERE o_custkey % 2 = 0) AS BIGINT)
               AS n_even_cust,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000.0) AS BIGINT)
               AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: bool_and / bool_or over group
    predicates and count_if (the FILTER-clause aggregate) — the
    data-quality assertion shapes ("are ALL rows valid", "does ANY row
    trip a flag", "how many violate X") that run as ordinary one-shuffle
    hash aggregates with map-side partials.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias(
            "any_urgent"
        ),
        F.count_if(F.col("o_custkey") % 2 == 0).alias("n_even_cust"),
        F.count_if(F.col("o_totalprice") > 200000.0).alias("n_big"),
    )


@query(
    "join_lateral",
    extra=True,
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per customer through
    the SQL front door. Same semantics as the window-based
    ``topk_per_group``, but exercises Catalyst's lateral-join
    decorrelation (the per-row subquery becomes a distributed join +
    per-key limit, NOT a driver loop over customers). Deterministic via
    the orderkey tiebreak; customers with no orders drop out (inner
    lateral), matching the oracle.
    """
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@query(
    "window_value_fns",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS cheapest,
           last_value(o_totalprice)  OVER w AS priciest,
           nth_value(o_totalprice, 2) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions with an explicit full-partition ROWS frame:
    first_value / last_value / nth_value per customer. The frame matters
    — under the DEFAULT frame (range to current row), last_value is just
    the current row and nth_value is NULL until row n; pinning
    UNBOUNDED..UNBOUNDED on BOTH engines is what makes the semantics
    (and the oracle) well-defined. Deterministic ordering via the
    orderkey tiebreak.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


@query(
    "scalar_bitwise",
    extra=True,
    oracle="""
    SELECT event_id,
           event_id & 255                      AS low_byte,
           event_id | 4096                     AS with_flag,
           xor(event_id, 1431655765)           AS toggled,
           event_id << 3                       AS shifted_up,
           event_id >> 2                       AS shifted_down,
           CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor, shifts, popcount — the
    primitives the engine's own SimHash banding builds on
    (operators/dedup.py), exposed as a query. Pure JVM expressions,
    embarrassingly parallel.
    """
    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(1431655765)).alias("toggled"),
        F.shiftleft(eid, 3).alias("shifted_up"),
        F.shiftright(eid, 2).alias("shifted_down"),
        F.bit_count(eid).cast("long").alias("popcount"),
    )


@query(
    "sql_recursive",
    extra=True,
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT s_suppkey AS node, s_suppkey AS cur,
               CAST(0 AS BIGINT) AS depth
        FROM supplier
        UNION ALL
        SELECT node, cur // 2, depth + 1
        FROM walk WHERE cur > 1)
    SELECT node, max(depth) AS depth_to_root,
           CAST(sum(cur) AS BIGINT) AS path_key_sum
    FROM walk GROUP BY node
    """,
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk each supplier up
    the binary-halving key hierarchy to the root, reporting depth and
    the path-key checksum. The iterate-until-empty pattern behind org
    charts, BOM explosions, and graph reachability, expressed on the SQL
    front door — each recursion step is one distributed join/projection
    over the previous step's frontier, bounded here by log2(max key)
    (~14 steps at sf0.1), with no driver-side looping.

    (The engine's other fixed-point iteration, dedup's
    connected-components, uses an explicit DataFrame loop because it
    needs a per-round convergence check; this entry covers the
    declarative recursion surface.)
    """
    register_views(spark, sf_dir, ("supplier",))
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT s_suppkey AS node, s_suppkey AS cur,
                   CAST(0 AS BIGINT) AS depth
            FROM supplier
            UNION ALL
            SELECT node, cur DIV 2 AS cur,
                   depth + CAST(1 AS BIGINT) AS depth
            FROM walk WHERE cur > 1)
        SELECT node, max(depth) AS depth_to_root,
               sum(cur) AS path_key_sum
        FROM walk GROUP BY node
        """
    )


@query(
    "window_ntile",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4) OVER w                                       AS quartile,
           CAST(round(percent_rank() OVER w * 1000000) AS BIGINT)
               / 1000000.0                                       AS pct_rank,
           CAST(round(cume_dist() OVER w * 1000000) AS BIGINT)
               / 1000000.0                                       AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    Deterministic ordering (price, then key as tiebreak) makes ranks
    reproducible; the ratios are exact rationals on both engines, rounded
    to 1e-6 to drop any double-formatting noise.
    """
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    r6 = lambda c: (F.round(c * 1000000, 0).cast("long") / F.lit(1000000.0))  # noqa: E731
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )


# --------------------------------------------------------------------------
# Map functions + union-by-name
# --------------------------------------------------------------------------


@query(
    "map_fns",
    oracle="""
    WITH s AS (SELECT user_id,
                      CAST(sum(CASE WHEN event_type = 'click'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                      CAST(sum(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                      count(DISTINCT event_type) AS n_types
               FROM events GROUP BY user_id)
    SELECT user_id, n_click, n_view, n_types FROM s
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column construction and access: per-user map of
    event_type → count (map_from_entries over collect_list), then
    element_at lookups and map_keys cardinality.

    The map is built and probed Spark-side; the oracle checks the same
    scalars via conditional aggregation (DuckDB map cell hashing is not
    comparable cross-engine, extracted values are).
    """
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias(
            "type_counts"
        )
    )
    return m.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("type_counts", "view"), F.lit(0)).alias("n_view"),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
    )


@query(
    "agg_grouping_id",
    extra=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT)  AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT)  AS g_ls,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with grouping() markers — distinguishes a real NULL group
    key from a subtotal row, which consumers of rollup output need
    whenever the grouping columns are nullable.
    """
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_corr",
    extra=True,
    oracle="""
    SELECT l_returnflag,
           CAST(round(corr(l_quantity, l_extendedprice) * 1000000) AS BIGINT)
               / 1000000.0 AS qty_price_corr,
           CAST(round(covar_samp(l_quantity, l_extendedprice) * 100) AS BIGINT)
               / 100.0 AS qty_price_covar,
           CAST(round(stddev_samp(l_extendedprice) * 100) AS BIGINT)
               / 100.0 AS price_stddev,
           CAST(round(var_samp(l_quantity) * 1000000) AS BIGINT)
               / 1000000.0 AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: Pearson correlation, sample covariance,
    stddev, variance per group — single-pass mergeable moments
    (map-side partial like any sum), one shuffle of O(groups).
    Cross-engine deltas measured ≤1e-11 absolute (both engines use
    stable one-pass updates), far inside the 1e-6/cents rounding.
    """
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    r6 = lambda c: (F.round(c * 1000000, 0).cast("long") / F.lit(1000000.0))  # noqa: E731
    cents = lambda c: (F.round(c * 100, 0).cast("long") / F.lit(100.0))  # noqa: E731
    return l.groupBy("l_returnflag").agg(
        r6(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        cents(F.covar_samp("l_quantity", "l_extendedprice")).alias(
            "qty_price_covar"
        ),
        cents(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
        r6(F.var_samp("l_quantity")).alias("qty_var"),
    )


@query(
    "retention_cohorts",
    extra=True,
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        FROM events),
    cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id)
    SELECT c.cohort_week, a.week, count(DISTINCT a.user_id) AS n_active
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, a.week
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in every week they return. Two aggregates + one equi-join on
    user_id — no per-user driver logic; the activity dedup happens
    before the join so the join input is |users × active-weeks|, not
    |events|.
    """
    ev = _t(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("timestamp")).alias("week"),
        )
        .distinct()
        # r14 (VERDICT r13 #8): act is a diamond — it feeds BOTH the
        # cohort aggregate and the join probe, and Catalyst re-derives
        # the scan+distinct on each branch (the same no-subplan-sharing
        # reality as text_tfidf). One lazy checkpoint = one
        # scan+distinct per invocation, both branches read it.
        .localCheckpoint(eager=False)
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "agg_histogram",
    extra=True,
    oracle="""
    SELECT greatest(0, least(12, CAST(floor(o_totalprice / 50000) AS BIGINT)))
               AS bucket,
           count(*) AS n,
           CAST(round(min(o_totalprice) * 100) AS BIGINT) / 100.0 AS lo,
           CAST(round(max(o_totalprice) * 100) AS BIGINT) / 100.0 AS hi
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k-wide buckets, clamped
    to [0,12]) with per-bucket bounds — one hash aggregate; the binning
    expression is plain integer arithmetic so any engine agrees.
    """
    o = _t(spark, sf_dir, "orders")
    bucket = F.greatest(
        F.lit(0),
        F.least(F.lit(12), F.floor(F.col("o_totalprice") / 50000).cast("long")),
    )
    cents = lambda c: (F.round(c * 100, 0).cast("long") / F.lit(100.0))  # noqa: E731
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        cents(F.min("o_totalprice")).alias("lo"),
        cents(F.max("o_totalprice")).alias("hi"),
    )


@query(
    "text_source_entropy",
    extra=True,
    oracle="""
    WITH c AS (SELECT source, lang, count(*) AS n
               FROM documents GROUP BY source, lang),
    t AS (SELECT source, lang, n,
                 CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source) AS p
          FROM c)
    SELECT source,
           CAST(round(sum(-p * ln(p)) * 1000000) AS BIGINT) / 1000000.0
               AS lang_entropy,
           CAST(count(*) AS BIGINT) AS n_langs
    FROM t GROUP BY source
    """,
)
def text_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix diagnostic: Shannon entropy of the language distribution
    per source stream (counts → window-normalized probabilities →
    −Σ p·ln p). Low entropy flags a source collapsing to one language —
    the check a training-data pipeline runs before fixing mixture
    weights.
    """
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n").cast("double") / F.sum("n").over(
        Window.partitionBy("source")
    )
    return (
        c.withColumn("p", p)
        .groupBy("source")
        .agg(
            (
                F.round(F.sum(-F.col("p") * F.log("p")) * 1000000, 0).cast(
                    "long"
                )
                / F.lit(1000000.0)
            ).alias("lang_entropy"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
        )
    )


@query(
    "join_sixway_revenue",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_sixway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join (local-supplier revenue by nation
    within one region). The canonical join-ordering workload: region →
    nation prune supplier/customer via broadcasts BEFORE the fact-fact
    lineitem⋈orders work; revenue in fixed-point for oracle parity.

    r14 measured-and-rejected (VERDICT r13 #5): folding the
    supplier⋈nation⋈region chain into ONE broadcast build (driver
    collect of nation⋈region → isin prune + literal nationkey→n_name
    map on supplier) removes a BroadcastExchange but LOSES interleaved
    A/B: 1.048 → 1.206 s clean median at sf0.1 — the synchronous
    collect job costs more than the second (thread-overlapped) tiny
    broadcast build it replaces. The two-build chain stays; numbers in
    OPTIMIZATION_r14.md.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")  # noqa: E741
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    sn = F.broadcast(
        s.join(nr, s.s_nationkey == nr.n_nationkey).select(
            "s_suppkey", "s_nationkey", "n_name"
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(sn, l.l_suppkey == sn.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (sn.s_nationkey == c.c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        (
            F.sum(F.round(rev * 1000000, 0).cast("long")).cast("double")
            / F.lit(1000000.0)
        ).alias("revenue")
    )


@query(
    "funnel_conversion",
    extra=True,
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END)     AS first_view,
               min(CASE WHEN event_type = 'click' THEN ts END)    AS first_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN first_click > first_view THEN 1 ELSE 0 END)
                AS BIGINT) AS clicked_after_view,
           CAST(sum(CASE WHEN first_purchase > first_click
                          AND first_click > first_view THEN 1 ELSE 0 END)
                AS BIGINT) AS full_funnel
    FROM per_user
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel analytics: view → click → purchase ordered per user.

    One conditional-min aggregate per user (single shuffle on user_id),
    then a global roll-up of stage counts — the funnel pattern that
    stays two-shuffle no matter how many events, because stage ordering
    is resolved with conditional mins instead of self-joins.
    """
    ev = _t(spark, sf_dir, "events")

    def first(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        one_if(F.col("first_view").isNotNull()).alias("viewed"),
        one_if(F.col("first_click") > F.col("first_view")).alias(
            "clicked_after_view"
        ),
        one_if(
            (F.col("first_purchase") > F.col("first_click"))
            & (F.col("first_click") > F.col("first_view"))
        ).alias("full_funnel"),
    )


@query(
    "agg_collect",
    extra=True,
    oracle="""
    SELECT o_orderstatus,
           list_sort(list_distinct(list(o_orderpriority)))   AS priorities,
           list_aggregate(list_sort(list_distinct(list(o_orderpriority))),
                          'string_agg', '|')                 AS priorities_csv,
           CAST(len(list_distinct(list(o_orderpriority))) AS BIGINT)
                                                             AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: collect_set → sorted array, ordered string
    aggregation, distinct count. Sorting the collected set makes the
    result partition-order-independent — the only way collect_* can be
    deterministic (and oracle-comparable) on a distributed engine.
    """
    o = _t(spark, sf_dir, "orders")
    arr = F.array_sort(F.collect_set("o_orderpriority"))
    return o.groupBy("o_orderstatus").agg(
        arr.alias("priorities"),
        F.array_join(arr, "|").alias("priorities_csv"),
        F.size(arr).cast("long").alias("n_priorities"),
    )


@query(
    "scalar_try",
    extra=True,
    oracle="""
    SELECT event_id,
           TRY_CAST(event_type AS INTEGER)        AS bad_cast,
           TRY_CAST(CAST(round(value * 100) AS BIGINT) AS INTEGER)
                                                  AS cents_int,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(round(value / (event_id % 3) * 1000000) AS BIGINT)
                     / 1000000.0 END              AS safe_div,
           event_type IS NOT DISTINCT FROM 'click' AS is_click
    FROM events
    """,
)
def scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar semantics under ANSI mode (Spark 4 default):
    try_cast (bad casts → NULL instead of runtime error), try_divide
    (÷0 → NULL), and null-safe equality (<=>), the data-cleaning trio
    for ingesting untrusted records without job-killing exceptions.
    """
    ev = _t(spark, sf_dir, "events")
    div = F.try_divide(F.col("value"), F.pmod("event_id", F.lit(3)))
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("bad_cast"),
        F.round(F.col("value") * 100, 0)
        .cast("long")
        .cast("int")
        .alias("cents_int"),
        (F.round(div * 1000000, 0).cast("long") / F.lit(1000000.0)).alias(
            "safe_div"
        ),
        F.col("event_type").eqNullSafe(F.lit("click")).alias("is_click"),
    )


@query(
    "union_by_name",
    extra=True,
    oracle="""
    SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src,
           CAST(NULL AS BIGINT) AS supp_id
    FROM customer WHERE c_acctbal > 9900.0
    UNION ALL
    SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src,
           s_suppkey AS supp_id
    FROM supplier WHERE s_acctbal > 9900.0
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-aligned union of
    heterogeneous sources (missing columns null-padded) — the
    position-independent union you want when merging evolving schemas.
    """
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900.0)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("src"),
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9900.0)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("src"),
            F.col("s_suppkey").alias("supp_id"),
        )
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "sql_front_door",
    oracle="""
    WITH monthly AS (
        SELECT o_custkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS spend
        FROM orders
        WHERE o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)
        GROUP BY o_custkey, date_trunc('month', o_orderdate)),
    ranked AS (
        SELECT o_custkey, month, spend,
               row_number() OVER (PARTITION BY month
                                  ORDER BY spend DESC, o_custkey) AS rnk
        FROM monthly)
    SELECT r.o_custkey, r.month, r.spend, r.rnk
    FROM ranked r
    WHERE r.rnk <= 5
      AND EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = r.o_custkey
                    AND c.c_mktsegment <> 'MACHINERY')
      AND r.spend > (SELECT CAST(sum(CAST(round(o_totalprice * 100)
                                          AS BIGINT)) AS DOUBLE)
                            / 100.0 / count(*)
                     FROM orders)
    """,
)
def sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's full SQL surface in one statement: chained CTEs, an
    aggregate, a ranking window, an uncorrelated IN-subquery (Catalyst →
    left-semi join), a correlated EXISTS (decorrelated to a semi join on
    the correlation key), and a scalar subquery (computed once,
    broadcast into the filter) — exactly as a SQL user would write it.
    Consolidates the former sql_cte_window / subquery_in /
    subquery_exists / subquery_scalar entries (kept as extras). The
    scalar threshold is a fixed-point mean so it is bit-identical across
    engines.
    """
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH monthly AS (
            SELECT o_custkey,
                   date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
                       AS month,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS spend
            FROM orders
            WHERE o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)
            GROUP BY o_custkey, date_trunc('month',
                                           CAST(o_orderdate AS TIMESTAMP))),
        ranked AS (
            SELECT o_custkey, month, spend,
                   row_number() OVER (PARTITION BY month
                                      ORDER BY spend DESC, o_custkey) AS rnk
            FROM monthly)
        SELECT r.o_custkey, r.month, r.spend, r.rnk
        FROM ranked r
        WHERE r.rnk <= 5
          AND EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = r.o_custkey
                        AND c.c_mktsegment <> 'MACHINERY')
          AND r.spend > (SELECT CAST(sum(CAST(round(o_totalprice * 100)
                                              AS BIGINT)) AS DOUBLE)
                                / 100.0 / count(*)
                         FROM orders)
        """
    )
