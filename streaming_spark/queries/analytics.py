"""Decision-support query shapes II: the TPC-H patterns not already
covered by ``joins.py`` (Q3/Q4/Q5/Q7/Q10 shapes live there), adapted to
the reduced fixture schemas.

These exist because the reference's users compose its stream operator
with a full relational host language (SURVEY.md §2.3 — the AFL host
surface); a replacement engine has to supply the analytical surface those
compositions assume.  Each query documents its 100 TB physical plan: what
shuffles, what broadcasts, where the predicate lands.

Shapes covered here:
  Q6   pure scan-filter-aggregate (zero joins, full pushdown)
  Q8   per-year market share (broadcast dims + two fact shuffles)
  Q13  outer-join fact distribution (two-level aggregation)
  Q14  conditional-aggregate ratio over a broadcast dim join
  Q15  argmax against a scalar subquery (top supplier)
  Q17  correlated per-key average (window formulation)
  Q18  having-filtered semi join (large-volume orders)
  Q19  disjunction-of-conjunctions pushdown
  Q21  only-late-supplier (multi-exists rewritten as one grouped pass)
  Q22  anti join + scalar subquery (idle high-balance customers)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_spark.queries.registry import T, query


@query(
    "q_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by order count.

    Scale plan: one shuffle joins orders to customers on custkey (LEFT
    OUTER keeps order-less customers at c_count=0); the first aggregate
    is partial-agg'd on custkey, the second collapses to at most
    max-order-count rows — the expensive part is exactly one fact
    shuffle, same as the oracle's nested-aggregate formulation."""
    customer = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: share of revenue from promotional parts in one
    month — a conditional-aggregate ratio.

    Scale plan: the ship-date range pushes into the lineitem scan
    (month-partitioned layouts prune to ~1/84 of the data); part is a
    broadcast dim, so there is NO fact shuffle at all — the two sums
    partial-aggregate map-side and reduce to a single row."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = F.broadcast(T(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    an argmax against a scalar subquery over a derived aggregate.

    Scale plan: one shuffle aggregates lineitem to supplier cardinality;
    the max is a broadcast scalar (cross join with a 1-row frame), NOT a
    global sort; the supplier dim joins broadcast.  The equality filter
    keeps ties, matching the SQL subquery semantics.  Raw (unrounded)
    revenue feeds the comparison; rounding is display-only (CLAUDE.md:
    never threshold on rounded values)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
    )
    max_rev = revenue.agg(F.max("__rev").alias("__max_rev"))
    supplier = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("__rev") == F.col("__max_rev"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.round("__rev", 2).alias("total_revenue"))
    )


@query(
    "q_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand — the canonical correlated per-key average.

    Scale plan: the brand filter shrinks part to ~1/25 and broadcasts;
    only the matching lineitems survive the join, then ONE shuffle on
    l_partkey computes the per-part average as a window (every lineitem
    of a selected part is present post-join, so the window average
    equals the correlated subquery over the full table).  The classic
    two-scan formulation (self-join against a grouped average) would
    read lineitem twice; the window reads it once."""
    part = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS orderdate_str,
           o_totalprice AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: customers behind the largest-volume orders.

    Scale plan: the HAVING subquery is one partial-agg'd shuffle of
    (orderkey, quantity) producing a tiny key set (99.xth percentile of
    orders), which then LEFT SEMI joins back — at 100 TB that key set is
    broadcastable and AQE converts the semi join to a broadcast probe,
    so lineitem is scanned twice but shuffled once.  Top-100 runs as
    TakeOrderedAndProject with a deterministic orderkey tie-break."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 250)
        .select("l_orderkey")
    )
    orders = T(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    customer = F.broadcast(T(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate_str"),
            # stored per-row value, passed through UNROUNDED: rounding a
            # raw double is the boundary-divergence risk CLAUDE.md bans,
            # and a pure no-op for 2-dp fixture prices
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "q_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity <= 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 30)
    """,
)
def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a disjunction of (brand, size,
    quantity) conjunctions spanning both join sides.

    Scale plan: Catalyst factors side-local implications out of the OR —
    `p_brand IN (...) AND p_size <= 35` prunes the part scan and
    `l_quantity <= 15 OR l_quantity >= 10 ...` collapses on lineitem —
    so each scan reads only candidate rows before the broadcast join
    evaluates the full mixed predicate.  This is the pattern where
    hand-written pipelines usually give up on pushdown; declaring it
    lets the optimizer keep both scans pruned."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") <= 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & (F.col("l_quantity") >= 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
             max(CASE WHEN late THEN l_suppkey END) AS late_supp
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    """,
)
def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier orders (late = shipped >90 days after order date).

    The textbook formulation is EXISTS + NOT EXISTS — two correlated
    self-joins of the fact table.  Rewritten here as ONE grouped pass:
    join order dates (the only fact-fact shuffle), then per-order
    distinct-supplier counts decide `n_supp >= 2 AND n_late = 1`, and
    `max(CASE WHEN late)` recovers the unique late supplier exactly when
    n_late = 1.  At 100 TB this is one shuffle on orderkey instead of
    three; the oracle uses the identical aggregation so both engines
    compute the same relation."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    flagged = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    supplier = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supplier, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q_idle_customers",
    oracle="""
    SELECT c_nationkey AS nation_key,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def q_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: high-balance customers with no recent orders,
    grouped by nation — scalar subquery + anti join.

    Scale plan: the positive-balance average is a broadcast scalar (one
    map-side-combined aggregate, cross-joined as a 1-row frame); the
    NOT EXISTS becomes a LEFT ANTI join against orders pre-filtered to
    the recency window — the date filter pushes into the orders scan, so
    the anti join shuffles only the recent slice's custkeys.  AQE turns
    that side into a broadcast when the window is selective."""
    customer = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue increase from dropping small discounts —
    a pure scan-filter-aggregate with zero joins.

    Scale plan: every predicate (ship-date range, discount band, quantity
    cap) is a parquet-pushable comparison on a scanned column, so the
    scan reads only three columns and prunes row groups by min/max stats;
    the single sum partial-aggregates map-side to one row per task.  At
    100 TB this is the canonical full-scan-bandwidth query — no shuffle
    at all (asserted in tests/test_plans.py)."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue_delta")
        )
    )


@query(
    "q_market_share",
    oracle="""
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's revenue for one
    part type, per order year.

    Scale plan: part (type-filtered), supplier, nation, region are
    broadcast dims, so lineitem never shuffles for them; the two real
    exchanges are lineitem⋈orders on orderkey and orders⋈customer on
    custkey — the unavoidable fact-fact pair.  The order-date range
    pushes into the orders scan, shrinking the custkey shuffle to the
    two-year slice before it happens.  The share divides two partial-
    aggregated sums per year — no second pass over the join."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    part = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    asia_nations = F.broadcast(
        nation.join(
            region,
            (nation.n_regionkey == region.r_regionkey)
            & (region.r_name == "ASIA"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    customer = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    asia_cust = customer.join(
        asia_nations, customer.c_nationkey == F.col("cn_key")
    ).select("c_custkey")
    supp_nation = F.broadcast(
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
                    0.0
                )
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50_rows,
           CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_rows,
           round(max(n) * 1.0 / avg(n), 4) AS skew_factor
    FROM per_key
    """,
)
def q_skew_report(spark, sf_dir):
    """Join-key skew diagnostics: per-key row counts of the fact table
    collapsed to the distribution numbers an operator needs BEFORE
    picking a join/agg strategy — max, p50, p99, and max/mean skew
    factor.  This is the profiling pass behind the engine's salting and
    AQE-skew defaults (q_salted_agg): run it on the join key, and a
    skew_factor near 1 means plain hash exchange; large means salt or
    rely on AQE skew-join splitting.

    Plan: one map-side-combined count per key, then a single collapsing
    aggregate over the (distinct-key)-sized frame — exact percentiles
    via sort-based percentile_approx at accuracy=max (the frame is
    already small); nothing data-sized crosses a second exchange."""
    li = T(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.percentile_approx("n", 0.5, 2147483647).alias("p50_rows"),
        F.percentile_approx("n", 0.99, 2147483647).alias("p99_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
    )


@query(
    "q_corr_matrix",
    oracle="""
    SELECT 'quantity_price' AS pair,
           round(corr(l_quantity, l_extendedprice), 4) AS pearson_r,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov
    FROM lineitem
    UNION ALL
    SELECT 'quantity_discount',
           round(corr(l_quantity, l_discount), 4),
           round(covar_samp(l_quantity, l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'price_discount',
           round(corr(l_extendedprice, l_discount), 4),
           round(covar_samp(l_extendedprice, l_discount), 4)
    FROM lineitem
    ORDER BY pair
    """,
)
def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation + sample covariance over the fact
    table's numeric columns — the feature-screening pass before any
    modeling.  All three pairs compute in ONE scan / one aggregate
    (corr and covar are algebraic: each is a handful of running sums
    that combine map-side), then unpivot to the (pair, r, cov) shape —
    three full scans in the oracle's UNION ALL become one here."""
    li = T(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("r_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "c_qp"
        ),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("r_qd"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("c_qd"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias("r_pd"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias(
            "c_pd"
        ),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("price_discount").alias("pair"),
                    F.col("r_pd").alias("pearson_r"),
                    F.col("c_pd").alias("cov"),
                ),
                F.struct(
                    F.lit("quantity_discount").alias("pair"),
                    F.col("r_qd").alias("pearson_r"),
                    F.col("c_qd").alias("cov"),
                ),
                F.struct(
                    F.lit("quantity_price").alias("pair"),
                    F.col("r_qp").alias("pearson_r"),
                    F.col("c_qp").alias("cov"),
                ),
            )
        ).alias("s")
    ).select("s.pair", "s.pearson_r", "s.cov")


@query(
    "q_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
           CAST(floor(value / 50) * 50 AS DOUBLE) AS bucket_lo,
           count(*) AS n,
           round(avg(value), 4) AS mean_value
    FROM events
    GROUP BY 1, 2 ORDER BY bucket
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of the event value distribution (width 50)
    — the profiling primitive behind dashboards and drift checks.  One
    map-side-combining aggregate keyed by the bucket expression; output
    is histogram-sized, never data-sized."""
    from streaming_spark.queries.registry import events_table

    return (
        events_table(spark, sf_dir)
        .groupBy(
            F.floor(F.col("value") / 50).cast("bigint").alias("bucket"),
            (F.floor(F.col("value") / 50) * 50)
            .cast("double")
            .alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_value"),
        )
        .orderBy("bucket")
    )


@query(
    "q_quantile_bins",
    oracle="""
    WITH b AS (
      SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
             round(quantile_cont(l_extendedprice, 0.50), 6) AS q2,
             round(quantile_cont(l_extendedprice, 0.75), 6) AS q3
      FROM lineitem)
    SELECT CASE WHEN l_extendedprice <= b.q1 THEN 0
                WHEN l_extendedprice <= b.q2 THEN 1
                WHEN l_extendedprice <= b.q3 THEN 2
                ELSE 3 END AS bin,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS price_mass
    FROM lineitem, b
    GROUP BY 1 ORDER BY bin
    """,
)
def q_quantile_bins(spark, sf_dir):
    """Equi-depth (quartile) binning of the price column — the
    discretization pass behind stratified analyses and monotone feature
    encoding.  Two stages, both bounded: ONE exact-percentile aggregate
    produces the three boundaries (exact `percentile`, linear
    interpolation — the same definition as the oracle's quantile_cont;
    boundaries are rounded to 6 dp on BOTH sides so engine-internal
    last-ulp interpolation differences cannot flip a row at a bin
    edge), then one map-side-combining aggregate buckets the corpus by
    broadcast comparison.  A global sort/ntile formulation would give
    the same answer with a full-corpus range shuffle — this shape
    scans, never sorts."""
    li = T(spark, sf_dir, "lineitem")
    b = li.agg(
        F.round(F.percentile("l_extendedprice", 0.25), 6).alias("q1"),
        F.round(F.percentile("l_extendedprice", 0.50), 6).alias("q2"),
        F.round(F.percentile("l_extendedprice", 0.75), 6).alias("q3"),
    )
    joined = li.select("l_extendedprice").crossJoin(F.broadcast(b))
    bin_col = (
        F.when(F.col("l_extendedprice") <= F.col("q1"), 0)
        .when(F.col("l_extendedprice") <= F.col("q2"), 1)
        .when(F.col("l_extendedprice") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        joined.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_mass"),
        )
        .orderBy("bin")
    )
