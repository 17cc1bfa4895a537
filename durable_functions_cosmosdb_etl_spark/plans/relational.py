"""Relational operator surface (SURVEY.md §2.2) as registered queries.

Every operator category absent from the reference (which has none —
/root/reference/EtlProcess.cs is a 420-line ETL sample with no joins,
aggregates, windows, or sorts) is provided here via built-in Spark
DataFrame/SQL operators, each paired with a DuckDB oracle.

Float policy: aggregates over doubles are rounded (sums → 2dp, avgs and
transcendentals → 4-6dp) in BOTH engines so fp-addition-order noise
(~1e-5 relative at 60k rows) cannot break the value-hash compare.

Scale posture (applies to every query here):
- filters/projections are expressed declaratively → Catalyst pushes them
  into the parquet scan (verify: ``.explain`` shows PushedFilters /
  pruned ReadSchema);
- dimension joins broadcast explicitly (``F.broadcast``) — at 100 TB a
  shuffle of lineitem to join a 25-row nation table is the classic
  anti-pattern;
- fact-fact joins shuffle on their equi-keys and AQE handles skew;
- window functions partition by their natural key — no global windows
  except the documented small-batch parity path in operators/transform.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.fixedpoint import fixed, unfixed
from ..operators.asof import asof_join
from ..operators.transform import transform_items
from ..sources.generator import generate_sample_items
from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    WITH f AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 10000) AS BIGINT)      AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT)   AS p,
               CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT) AS dp,
               CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
                    AS BIGINT)                                AS ch,
               CAST(round(l_discount * 10000) AS BIGINT)      AS d
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(q) AS DOUBLE) / 10000.0              AS sum_qty,
           CAST(sum(p) AS DOUBLE) / 100.0                AS sum_base_price,
           CAST(sum(dp) AS DOUBLE) / 1000000.0           AS sum_disc_price,
           CAST(sum(ch) AS DOUBLE) / 1000000.0           AS sum_charge,
           CAST(sum(q) AS DOUBLE) / 10000.0 / count(*)   AS avg_qty,
           CAST(sum(p) AS DOUBLE) / 100.0 / count(*)     AS avg_price,
           CAST(sum(d) AS DOUBLE) / 10000.0 / count(*)   AS avg_disc,
           count(*)                                      AS count_order
    FROM f GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial+final hash aggregate.

    Flagship aggregate. Catalyst plans a partial (map-side) HashAggregate
    before the exchange, so the shuffle carries ~|groups| rows per
    partition, not |lineitem| — the property that makes this viable at
    100 TB (shuffle volume is O(groups × partitions)).

    Measures aggregate in fixed-point (functions/fixedpoint.py): exact
    integer sums are associative, so the result is independent of
    partition count/order — required for oracle parity and a free
    determinism win at scale.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q = fixed("l_quantity", 10000)
    p = fixed("l_extendedprice", 100)
    dp = fixed(disc_price, 1000000)
    ch = fixed(disc_price * (1 + F.col("l_tax")), 1000000)
    d = fixed("l_discount", 10000)
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        unfixed(F.sum(q), 10000).alias("sum_qty"),
        unfixed(F.sum(p), 100).alias("sum_base_price"),
        unfixed(F.sum(dp), 1000000).alias("sum_disc_price"),
        unfixed(F.sum(ch), 1000000).alias("sum_charge"),
        (unfixed(F.sum(q), 10000) / cnt).alias("avg_qty"),
        (unfixed(F.sum(p), 100) / cnt).alias("avg_price"),
        (unfixed(F.sum(d), 10000) / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           count(*)                                            AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0                                         AS sum_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*)                              AS avg_price,
           min(l_extendedprice)                                AS min_price,
           max(l_extendedprice)                                AS max_price,
           count(DISTINCT l_partkey)                           AS n_parts,
           count(DISTINCT l_suppkey)                           AS n_supps,
           CAST(round(corr(l_quantity, l_extendedprice) * 1000000) AS BIGINT)
               / 1000000.0                                     AS qty_price_corr,
           CAST(round(covar_samp(l_quantity, l_extendedprice) * 100) AS BIGINT)
               / 100.0                                         AS qty_price_covar,
           CAST(round(stddev_samp(l_extendedprice) * 100) AS BIGINT)
               / 100.0                                         AS price_stddev,
           CAST(round(var_samp(l_quantity) * 1000000) AS BIGINT)
               / 1000000.0                                     AS qty_var,
           CAST(round(quantile_cont(l_extendedprice, 0.25) * 100) AS BIGINT)
               / 100.0                                         AS p25,
           CAST(round(quantile_cont(l_extendedprice, 0.50) * 100) AS BIGINT)
               / 100.0                                         AS p50,
           CAST(round(quantile_cont(l_extendedprice, 0.75) * 100) AS BIGINT)
               / 100.0                                         AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full statistical-aggregate surface in ONE grouped pass:
    count/sum/avg/min/max, exact multi-column distincts, correlation /
    covariance / stddev / variance (single-pass mergeable moments), and
    exact interpolated percentiles (PERCENTILE_CONT semantics).

    Consolidates the former agg_distinct / agg_corr / agg_percentile
    entries (kept as extras). Scale notes: moments are map-side partial
    like any sum; exact multi-distinct costs an expand (the 2%-error HLL
    path is ``approx_distinct``); exact percentile buffers each group's
    values — for high-cardinality groups switch to
    ``approx_percentile`` (KLL sketch, mergeable) with the same plan
    shape. Floats are fixed-point-rounded in BOTH engines so fp
    addition order can't break the value hash.
    """
    r6 = lambda c: (F.round(c * 1000000, 0).cast("long") / F.lit(1000000.0))  # noqa: E731
    cents = lambda c: (F.round(c * 100, 0).cast("long") / F.lit(100.0))  # noqa: E731
    cnt = F.count(F.lit(1))
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            cnt.alias("n_rows"),
            unfixed(F.sum(fixed("l_extendedprice"))).alias("sum_price"),
            (unfixed(F.sum(fixed("l_extendedprice"))) / cnt).alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            r6(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
            cents(F.covar_samp("l_quantity", "l_extendedprice")).alias(
                "qty_price_covar"
            ),
            cents(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
            r6(F.var_samp("l_quantity")).alias("qty_var"),
            cents(F.percentile("l_extendedprice", F.lit(0.25))).alias("p25"),
            cents(F.percentile("l_extendedprice", F.lit(0.50))).alias("p50"),
            cents(F.percentile("l_extendedprice", F.lit(0.75))).alias("p75"),
        )
    )


@query(
    "agg_distinct",
    extra=True,
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (Catalyst expands + re-aggregates).

    Scale note: exact multi-distinct costs an expand (row per distinct
    column); when 2% error is fine, ``approx_distinct`` (HLL, below) cuts
    the shuffle to sketch size.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query("approx_distinct", extra=True)  # sketch output → rows-only
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for distincts.

    No oracle: HLL estimates are engine-specific by construction. The
    exact counterpart is ``agg_distinct``; tests assert the estimate is
    within rsd bounds of the exact count.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_rollup",
    extra=True,
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            unfixed(F.sum(fixed("o_totalprice"))).alias("sum_price"),
        )
    )


@query(
    "agg_cube",
    extra=True,
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           CAST(sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
               AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            unfixed(F.sum(fixed("l_quantity", 10000)), 10000).alias("sum_qty"),
        )
    )


@query(
    "agg_grouping_sets",
    extra=True,
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_grouping",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority)
                AS BIGINT)                           AS gid,
           count(*)                                  AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0                               AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multidimensional grouping surface in one query: CUBE over
    (status, priority) — all four grouping sets, subsuming ROLLUP — with
    grouping() flags and grouping_id() so consumers can tell a subtotal
    row from a NULL group key. Consolidates the former agg_rollup /
    agg_cube / agg_grouping_sets / agg_grouping_id entries (kept as
    extras exercising the dedicated rollup()/GROUPING SETS APIs).
    Catalyst plans one Expand + hash aggregate: shuffle rows = groups ×
    sets, never a re-scan per set.
    """
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            unfixed(F.sum(fixed("o_totalprice"))).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Filters / projections
# --------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) / 10000.0
               AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_discount > 0.05
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection, fully pushed into the parquet scan.

    ``.explain("formatted")`` shows both filters in PushedFilters and a
    3-column ReadSchema — at 100 TB this is the difference between
    scanning 3 columns of late rows and scanning everything.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            unfixed(
                fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000),
                10000,
            ).alias("net_price"),
        )
    )


@query(
    "case_when",
    extra=True,
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'delinquent'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(trim(c_mktsegment), ''), 'UNKNOWN') AS segment
    FROM customer
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN + the reference's blank-coalesce idiom (EtlProcess.cs:251)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(
            F.nullif(F.trim("c_mktsegment"), F.lit("")), F.lit("UNKNOWN")
        ).alias("segment"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "join_inner_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name
    """,
)
def join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way inner join → aggregate (TPC-H Q3 family), with the lineitem
    side PARTIALLY AGGREGATED below the join (guide §2.3 "aggregate
    before you shuffle", r13 optimization).

    Every orderkey joins exactly one order (FK), so summing revenue /
    counting lines per orderkey FIRST and summing the partial sums after
    the joins is algebraically identical (fixed-point integer sums are
    associative — bit-equal, oracle-verified). What it buys:

    - the join input shrinks from |lineitem| rows to ~|orders| rows
      BEFORE anything is joined or shuffled — at 100 TB the fact-fact
      exchange carries one row per order instead of one per line (and
      the per-orderkey aggregate is itself map-side partial);
    - locally (measured, r13): the planner had been broadcasting the
      600k-row 3-column lineitem side (its compressed-size estimate sat
      under the 32 MB threshold) — a single-threaded 600k-entry
      HashedRelation build per run; the pre-aggregate replaces it with
      a ~150k-row build: 1.22 s → 0.97 s clean median at sf0.1
      (OPTIMIZATION_r13.md).

    customer/orders joins stay size-based (AQE broadcast/skew-split) —
    nothing here forces a strategy that could not scale.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(
            fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
        ).alias("rev_fp"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            unfixed(F.sum("rev_fp"), 10000).alias("revenue"),
            F.sum("n_lines").alias("n_items"),
        )
    )


@query(
    "join_left_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS order_count,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
                AS DOUBLE) / 100.0 AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    r13 optimization (guide §2.3, same move as join_inner_revenue):
    orders are aggregated per o_custkey BEFORE the join, so the join and
    its exchange carry one row per customer-with-orders instead of one
    per order, and the outer join's null side becomes a coalesce(…, 0).
    count over a left-joined null group ≡ 0 and the fixed-point sums are
    associative, so the output is bit-identical (oracle-verified).
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        # count('o_orderkey'), not count(*) (ADVICE r13): the oracle's
        # count(o_orderkey) skips null keys; identical on this data but
        # kept exact in case orders ever carried a null o_orderkey.
        F.count("o_orderkey").alias("n_orders"),
        F.sum(fixed("o_totalprice")).alias("spend_fp"),
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("order_count"),
        unfixed(F.coalesce("spend_fp", F.lit(0))).alias("total_spend"),
    )


@query(
    "join_semi",
    extra=True,
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with a >400k order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    extra=True,
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no >400k order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_big_order' AS side FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT c_custkey, c_name, 'no_big_order' AS side FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (EXISTS / NOT EXISTS) in one tagged
    result: customers partitioned by whether they placed a >400k order.
    Both joins probe the same filtered-and-broadcast orders side, so the
    customer scan is the only large input and it is never shuffled.
    (Former join_semi / join_anti entries kept as extras.)
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", F.lit("has_big_order").alias("side")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit("no_big_order").alias("side")
    )
    return semi.union(anti)


@query(
    "join_outer_cross",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey),
         t AS (SELECT count(*) AS total_cust FROM customer)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(n_cust, 0)  AS n_cust,
           coalesce(n_supp, 0)  AS n_supp,
           total_cust
    FROM c FULL OUTER JOIN s ON c.nk = s.nk CROSS JOIN t
    """,
)
def join_outer_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (customer vs supplier presence
    per nation) cross-joined with a broadcast 1-row global total.

    Both sides pre-aggregate to |nations| rows before the full-outer
    shuffle — tiny regardless of fact size (aggregate-then-join). The
    CROSS JOIN is the legitimate kind: a broadcast scalar attached to
    every row. (Former join_full / join_cross entries kept as extras.)
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
    t = _t(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).alias("total_cust")
    )
    return (
        c.join(s, "nk", "full_outer")
        .crossJoin(F.broadcast(t))
        .select(
            F.coalesce(c["nk"], s["nk"]).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            "total_cust",
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × 3 broadcast dimensions, zero fact shuffles.

    All three dims are explicitly broadcast, so lineitem is never
    shuffled for the joins — the only exchange is the final tiny
    aggregate. This is THE 100 TB star-schema plan: map-side joins over
    the fact scan.
    """
    l = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            unfixed(F.sum(fixed("l_extendedprice"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_range_bands",
    oracle="""
    SELECT band, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events
    JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 200.0),
                 ('high', 200.0, 300.0), ('top', 300.0, 500.0)) b(band, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a broadcast band table.

    Non-equi joins can't hash-partition; the scalable plan is broadcast
    nested loop with the *small* side broadcast — which Spark picks here
    because the band table is 4 rows. Range joins against a LARGE band
    table would instead bucket both sides by coarse range then equi-join
    on the bucket (see dedup/similarity for that pattern).
    """
    import pyarrow as pa

    e = _t(spark, sf_dir, "events")
    # pa.Table → Arrow local relation (LocalTableScan, pure JVM). A
    # plain-list createDataFrame is RDD-backed and spins a pickled
    # Python task to produce these 4 constant rows on every execution.
    bands = F.broadcast(
        spark.createDataFrame(
            pa.table(
                {
                    "band": ["low", "mid", "high", "top"],
                    "lo": [0.0, 100.0, 200.0, 300.0],
                    "hi": [100.0, 200.0, 300.0, 500.0],
                }
            )
        )
    )
    return (
        e.join(bands, (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior click.

    Spark has no native ASOF; implemented via union + partitioned window
    (operators/asof.py) — one shuffle on user_id, no range cross-product.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    return asof_join(
        purchases.select("event_id", "user_id", "ts"),
        clicks.select("user_id", "ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="ts",
        value_alias="last_click_ts",
    )


@query(
    "join_asof_tolerance",
    extra=True,
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.ts END
               AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: prior clicks older than 30
    minutes are treated as no-match (feature-store freshness semantics).
    Same single-shuffle window plan — the matched timestamp rides the
    same pass.
    """
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    return asof_join(
        purchases.select("event_id", "user_id", "ts"),
        clicks.select("user_id", "ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="ts",
        value_alias="last_click_ts",
        tolerance="30 MINUTE",
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------


@query(
    "window_rank",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
    FROM orders
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions; row_number is tiebroken for determinism."""
    o = _t(spark, sf_dir, "orders")
    w_tb = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_tb).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_fns",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank()       OVER wd AS rnk,
           dense_rank() OVER wd AS drnk,
           ntile(4)     OVER wa AS quartile,
           CAST(round(percent_rank() OVER wa * 1000000) AS BIGINT)
               / 1000000.0 AS pct_rank,
           CAST(round(cume_dist() OVER wa * 1000000) AS BIGINT)
               / 1000000.0 AS cume,
           lag(o_totalprice)  OVER wa AS prev_price,
           lead(o_totalprice) OVER wa AS next_price
    FROM orders
    WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
           wa AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface in one pass over orders: ranking
    (row_number/rank/dense_rank), distribution (ntile/percent_rank/
    cume_dist), and analytic offsets (lag/lead). Consolidates the former
    window_rank / window_ntile / window_lag_lead entries (kept as
    extras). All specs share the o_custkey partitioning, so Catalyst
    plans a single exchange + sort feeding every window operator —
    shuffle once, compute eight functions.
    """
    w_tb = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wd = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wa = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    r6 = lambda c: (F.round(c * 1000000, 0).cast("long") / F.lit(1000000.0))  # noqa: E731
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_tb).alias("rn"),
        F.rank().over(wd).alias("rnk"),
        F.dense_rank().over(wd).alias("drnk"),
        F.ntile(4).over(wa).alias("quartile"),
        r6(F.percent_rank().over(wa)).alias("pct_rank"),
        r6(F.cume_dist().over(wa)).alias("cume"),
        F.lag("o_totalprice").over(wa).alias("prev_price"),
        F.lead("o_totalprice").over(wa).alias("next_price"),
    )


@query(
    "window_running",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_sum,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
               / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg3,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS sum_1h
    FROM events
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + ROWS-frame moving average + trailing-1-hour RANGE
    frame per user (absorbs the former window_range_frame entry, kept as
    an extra). ROWS and RANGE frames share the user_id partitioning —
    one exchange serves all three windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    w1h = (
        Window.partitionBy("user_id")
        # cast: parquet naive timestamps arrive as TIMESTAMP_NTZ, which
        # unix_micros rejects; the cast is a no-op on tz-aware data and
        # interprets NTZ in the session tz (UTC) — same integers DuckDB's
        # epoch_us(ts) produces on the naive values.
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        unfixed(F.sum(fixed("value")).over(w_run)).alias("running_sum"),
        (unfixed(F.sum(fixed("value")).over(w3)) / F.count(F.lit(1)).over(w3)).alias(
            "moving_avg3"
        ),
        unfixed(F.sum(fixed("value")).over(w1h)).alias("sum_1h"),
    )


@query(
    "window_lag_lead",
    extra=True,
    oracle="""
    SELECT event_id, user_id, ts,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 2) AS delta
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics with null boundaries."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "window_range_frame",
    extra=True,
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS sum_1h
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing 1-hour sum per user (ordered by epoch micros)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # cast for TIMESTAMP_NTZ parquet input — see window_running.
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        unfixed(F.sum(fixed("value")).over(w)).alias("sum_1h"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k / set ops
# --------------------------------------------------------------------------


@query(
    "sort_limit",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition
    top-N + merge on driver), never a full sort — O(N) memory at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranked window + filter (no per-group sort-all:
    Spark 3.5+ inserts WindowGroupLimit to push the k-limit into the sort)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "set_union",
    extra=True,
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    extra=True,
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    extra=True,
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, nationkey, 'building' AS src_filter FROM (
        SELECT c_nationkey AS nationkey FROM customer
        WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', nationkey, NULL FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', nationkey, NULL FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface in one tagged result: UNION (distinct),
    INTERSECT, and EXCEPT over customer/supplier nation-key sets,
    combined with unionByName(allowMissingColumns=True) — the
    schema-aligned union (the union branch carries a src_filter column
    the others null-pad). Consolidates the former set_union /
    set_intersect / set_except / union_by_name entries (kept as extras).
    Each set op is a hash-partitioned aggregate/join on the key —
    linear shuffles, no driver-side set logic.
    """
    cb = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = (
        cb.union(s)
        .distinct()
        .select(
            F.lit("union").alias("op"),
            "nationkey",
            F.lit("building").alias("src_filter"),
        )
    )
    i = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
    e = c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
    return u.unionByName(i, allowMissingColumns=True).unionByName(
        e, allowMissingColumns=True
    )


# --------------------------------------------------------------------------
# Scalar function surface (anchored on the reference's own scalars —
# split/element_at EtlProcess.cs:257, format_string :233-236, trim-blank
# :251-252, date handling :231,:234, json :146,:199,:240)
# --------------------------------------------------------------------------


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           lower(c_mktsegment)                             AS seg_lower,
           substr(c_name, 1, 8)                            AS name_prefix,
           length(c_name)                                  AS name_len,
           string_split(c_name, '#')[2]                    AS cust_num,
           printf('%s/%d', c_mktsegment, c_custkey)        AS seg_key,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS padded_key,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           replace(c_name, 'Customer', 'Cust')             AS short_name,
           CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT)
                                                           AS n_digit_runs,
           regexp_matches(c_name, '00')                    AS has_double_zero,
           length(regexp_replace(lower(c_name), '[aeiou]', '', 'g'))
                                                           AS novowel_len,
           CASE WHEN c_acctbal < 0 THEN 'delinquent'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END                         AS tier,
           coalesce(nullif(trim(c_mktsegment), ''), 'UNKNOWN') AS segment
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regex + conditional scalar surface in one select,
    incl. the reference's split-first idiom
    (``PreferredLocations.Split(',')[0]``, EtlProcess.cs:257), regex
    extract/extract-all/rlike/global-replace, CASE/WHEN tiers, and the
    reference's blank-coalesce rule (EtlProcess.cs:251). Consolidates
    the former scalar_regex / case_when entries (kept as extras).
    Patterns restricted to syntax Java regex and RE2 parse identically.
    """
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.element_at(F.split("c_name", "#"), 2).alias("cust_num"),
        F.format_string("%s/%d", F.col("c_mktsegment"), F.col("c_custkey")).alias(
            "seg_key"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("short_name"),
        F.size(F.regexp_extract_all("c_name", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_digit_runs"),
        F.col("c_name").rlike("00").alias("has_double_zero"),
        F.length(F.regexp_replace(F.lower("c_name"), "[aeiou]", "")).alias(
            "novowel_len"
        ),
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(
            F.nullif(F.trim("c_mktsegment"), F.lit("")), F.lit("UNKNOWN")
        ).alias("segment"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                   AS order_year,
           month(o_orderdate)                                  AS order_month,
           dayofweek(o_orderdate) + 1                          AS order_dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           strftime(o_orderdate, '%Y-%m')                      AS ym,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
           o_orderdate + INTERVAL 30 DAY                       AS due_date,
           epoch_us(o_orderdate)                               AS epoch_micros
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (reference analogs: DateTime.Now :231,:258,
    AddMinutes :299, interval subtraction :125, date ToString :234)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofweek("o_orderdate").cast("long").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        # NTZ → TZ cast interprets in session tz (UTC here), matching
        # DuckDB's naive-as-UTC epoch_us.
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micros"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) / 10000.0
                                                             AS net,
           CAST(round(abs(l_discount - 0.05) * 10000) AS BIGINT) / 10000.0
                                                             AS dev,
           CAST(ceil(l_quantity) AS BIGINT)                  AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)                 AS qty_floor,
           l_orderkey % 7                                    AS bucket7,
           CAST(round(sqrt(l_quantity) * 10000) AS BIGINT) / 10000.0
                                                             AS qty_sqrt,
           CAST(round(pow(1 + l_tax, 2) * 1000000) AS BIGINT) / 1000000.0
                                                             AS tax_sq,
           CAST(round(ln(l_extendedprice) * 1000000) AS BIGINT) / 1000000.0
                                                             AS log_price,
           greatest(l_tax, l_discount)                       AS max_rate,
           TRY_CAST(l_returnflag AS INTEGER)                 AS bad_cast,
           CASE WHEN l_orderkey % 3 = 0 THEN NULL
                ELSE CAST(round(l_quantity / (l_orderkey % 3) * 1000000)
                          AS BIGINT) / 1000000.0 END         AS safe_div,
           l_returnflag IS NOT DISTINCT FROM 'R'             AS is_return
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + error-safe scalar surface (reference analogs: rnd.Next
    :224, modulo round-robin :236) incl. the ANSI-mode data-cleaning
    trio absorbed from the former scalar_try entry (kept as an extra):
    try_cast (bad casts → NULL, not runtime error), try_divide (÷0 →
    NULL), and null-safe equality (<=>)."""
    l = _t(spark, sf_dir, "lineitem")
    div = F.try_divide(F.col("l_quantity"), F.pmod("l_orderkey", F.lit(3)))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        unfixed(
            fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000), 10000
        ).alias("net"),
        unfixed(fixed(F.abs(F.col("l_discount") - 0.05), 10000), 10000).alias("dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("bucket7"),
        unfixed(fixed(F.sqrt("l_quantity"), 10000), 10000).alias("qty_sqrt"),
        unfixed(fixed(F.pow(1 + F.col("l_tax"), 2), 1000000), 1000000).alias("tax_sq"),
        unfixed(fixed(F.log("l_extendedprice"), 1000000), 1000000).alias("log_price"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.col("l_returnflag").try_cast("int").alias("bad_cast"),
        unfixed(fixed(div, 1000000), 1000000).alias("safe_div"),
        F.col("l_returnflag").eqNullSafe(F.lit("R")).alias("is_return"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON re-parse with an explicit schema — the Spark analog of the
    reference's per-doc deserialize (JsonConvert…, EtlProcess.cs:199).

    r13 optimization: the parse input is fanned out
    (:func:`operators.dedup.fan_out` — conditional repartition up to the
    cluster parallelism, a no-op whenever the scan already carries ≥
    cores partitions, i.e. at any real scale). The test tables are
    single-row-group parquet files, so the scan is ONE task and the
    from_json of every row otherwise runs single-threaded; spreading the
    2-column projection first parallelizes the parse: 0.41 s → 0.33 s
    clean median at sf0.1 (guide §2.5 "input skew: one huge unsplittable
    file → repartition immediately after the read"). Projecting before
    the exchange keeps only (event_id, props) in the shuffle."""
    from ..operators.dedup import fan_out
    from ..schemas import EVENT_PROPS_SCHEMA

    e = fan_out(_t(spark, sf_dir, "events").select("event_id", "props"))
    parsed = e.select(
        "event_id", F.from_json("props", EVENT_PROPS_SCHEMA).alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.pmod(F.col("p.k"), F.lit(10)).alias("k_bucket"),
    )


@query(
    "array_fns",
    extra=True,
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                       AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)            AS first_val,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS arr_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT)       AS n_pos
    FROM embeddings
    """,
)
def array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda surface over the embedding column — all JVM-side
    higher-order functions, no Python in the loop."""
    em = _t(spark, sf_dir, "embeddings")
    x = F.col("x")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda a, v: a + v.cast("double") * v.cast("double"),
                )
            ),
            4,
        ).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("arr_max"),
        F.size(F.filter("embedding", lambda v: v > 0)).alias("n_pos"),
    )


@query(
    "array_explode",
    extra=True,
    oracle="""
    SELECT vec_id, x.pos, x.val FROM (
        SELECT vec_id,
               unnest(list_transform(embedding,
                     (v, i) -> struct_pack(pos := CAST(i - 1 AS INT),
                                           val := round(CAST(v AS DOUBLE), 4)))) AS x
        FROM embeddings WHERE vec_id < 10)
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array (lateral expansion)."""
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 4).alias("val"))


@query(
    "array_agg_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                       AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)            AS first_val,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS arr_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT)       AS n_pos,
           list_aggregate(list_transform(embedding[1:3],
                 x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                           AS VARCHAR)), 'string_agg', '|')           AS head_csv
    FROM embeddings WHERE vec_id < 50
    """,
)
def array_agg_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array round-trip: posexplode each embedding to (pos, val) rows,
    re-assemble per vector with array_sort(collect_list(struct(pos,
    val))) — the deterministic form of collection aggregation — then
    apply the higher-order-function surface (aggregate fold, array_max,
    filter, slice + array_join) on the rebuilt array. Consolidates the
    former array_fns / array_explode / agg_collect entries (kept as
    extras). Everything is JVM-side; collect_list is made
    partition-order-independent by sorting on the carried position.
    """
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    ex = em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    rebuilt = (
        ex.groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("pv")
        )
        .select(
            "vec_id", F.transform("pv", lambda s: s["val"]).alias("arr")
        )
    )
    return rebuilt.select(
        "vec_id",
        F.size("arr").alias("dim"),
        F.round(F.element_at("arr", 1), 4).alias("first_val"),
        F.round(
            F.sqrt(F.aggregate("arr", F.lit(0.0), lambda a, v: a + v * v)), 4
        ).alias("l2_norm"),
        F.round(F.array_max("arr"), 4).alias("arr_max"),
        F.size(F.filter("arr", lambda v: v > 0)).alias("n_pos"),
        F.array_join(
            F.transform(
                F.slice("arr", 1, 3),
                lambda v: F.round(v * 10000, 0).cast("long").cast("string"),
            ),
            "|",
        ).alias("head_csv"),
    )


# --------------------------------------------------------------------------
# ETL parity (generator O12 + transform O9, deterministic)
# --------------------------------------------------------------------------

_ETL_CLOCK = datetime(2026, 1, 15, 10, 30, 0)

@query(
    "etl_transform",
    oracle="""
    WITH src AS (
        SELECT i,
               substr(md5(CAST(i AS VARCHAR)), 1, 8) || '-' ||
               substr(md5(CAST(i AS VARCHAR)), 9, 4) || '-' ||
               substr(md5(CAST(i AS VARCHAR)), 13, 4) || '-' ||
               substr(md5(CAST(i AS VARCHAR)), 17, 4) || '-' ||
               substr(md5(CAST(i AS VARCHAR)), 21, 12)           AS id,
               printf('Sample item #%d of %d generated', i, 200) AS "desc",
               printf('Item_2026011030_%d', i)                   AS name
        FROM range(1, 201) t(i)
    ), counted AS (
        SELECT *, row_number() OVER (ORDER BY id) AS ctr FROM src
    )
    SELECT id,
           '01/15/2026 10:30:00'                                  AS source_date,
           TIMESTAMP '2026-01-15 10:30:00'                        AS transform_timestamp,
           "desc"                                                 AS description,
           'true'                                                 AS done,
           name,
           'Additional field info'                                AS pr,
           printf('Data added from transform function [%d]', ctr) AS additional_data,
           'batch-0001'                                           AS transform_batch,
           'West Europe'                                          AS update_location
    FROM counted
    """,
)
def etl_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic generator→transform parity query (operators O12+O9).

    Runs the reference's whole per-row semantic surface — rename,
    blank-coalesce, enrichment counter, lineage stamp, region provenance
    (EtlProcess.cs:227-239, 245-260) — with injected clock/batch/ids so
    the DuckDB oracle reproduces it exactly.
    """
    src = generate_sample_items(
        spark, count=200, clock=_ETL_CLOCK, deterministic_ids=True
    )
    return transform_items(src, batch_id="batch-0001", clock=_ETL_CLOCK)
