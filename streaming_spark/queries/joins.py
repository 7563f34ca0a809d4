"""Join-centric queries: multiway star joins, top-k, the reference's
overlap (interval) join, and the as-of join extension.

The overlap join is the reference's flagship analytical workload — the
1000-genomes variants×genes vignette (reference r_pkg/vignettes/
ranges.Rmd:218-237: equal chromosome AND coordinate-range overlap, then
count per gene).  The fixture set has no genomes tables, so variants and
genes are derived deterministically from lineitem/part with pure SQL
expressions — both engines compute identical inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_spark.operators.asof import asof_join
from streaming_spark.operators.overlap import overlap_join
from streaming_spark.operators.stream import ensure_parallelism
from streaming_spark.queries.registry import T, events_table, query


@query(
    "q_revenue_by_nation",
    oracle="""
    SELECT n_name, r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def q_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5-style star join: fact × 4 dims → revenue per nation.

    Scale shape: lineitem⋈orders is the only big shuffle; customer,
    nation, region are broadcast (explicit hints for the dims — at 100 TB
    the fact side never moves for those)."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    customer = F.broadcast(T(spark, sf_dir, "customer"))
    nation = F.broadcast(T(spark, sf_dir, "nation"))
    region = F.broadcast(T(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_top_customers",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 10
    """,
)
def q_top_customers(spark, sf_dir):
    """Top-10 customers by revenue — aggregate then distributed top-k
    (TakeOrderedAndProject; no global sort)."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    customer = T(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.round("__rev", 2).alias("revenue"))
    )


# Deterministic derivation of the genomes-vignette shapes from fixtures.
# variants: one row per lineitem; genes: one per part (broadcast-sized dim,
# like the vignette's ~23k genes vs large variants).
_VARIANTS_SQL = """
    SELECT l_orderkey AS vid,
           l_partkey % 23 AS chrom,
           CAST(floor(l_extendedprice * 7) AS BIGINT) % 200000 AS vstart,
           CAST(floor(l_extendedprice * 7) AS BIGINT) % 200000
             + l_linenumber % 8 AS vend
    FROM lineitem
"""
_GENES_SQL = """
    SELECT p_name AS gene,
           p_partkey % 23 AS chrom,
           (p_partkey * 9973) % 150000 AS gstart,
           (p_partkey * 9973) % 150000 + 1000 + (p_size * 97) % 50000 AS gend
    FROM part
"""


@query(
    "q_overlap_join",
    oracle=f"""
    WITH variants AS ({_VARIANTS_SQL}), genes AS ({_GENES_SQL})
    SELECT gene, count(*) AS n_variants
    FROM variants v JOIN genes g
      ON v.chrom = g.chrom AND v.vstart <= g.gend AND v.vend >= g.gstart
    GROUP BY gene
    """,
)
def q_overlap_join(spark, sf_dir):
    """Interval-overlap join + count per gene (reference
    ranges.Rmd:218-237).

    Physical strategy: equi-join on chromosome with the range predicate as
    a post-condition, genes broadcast — the fact side never shuffles.
    This mirrors the vignette's chunk-per-chromosome layout
    (ranges.Rmd:131) and is the scale-correct plan while the dimension
    side stays broadcastable; for two large sides, bucketize both on
    (chrom, start DIV range_width) first."""
    li = ensure_parallelism(
        T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice"
        )
    )
    part = T(spark, sf_dir, "part")
    vstart = F.floor(F.col("l_extendedprice") * 7).cast("bigint") % 200000
    variants = li.select(
        F.col("l_orderkey").alias("vid"),
        (F.col("l_partkey") % 23).alias("chrom"),
        vstart.alias("vstart"),
        (vstart + F.col("l_linenumber") % 8).alias("vend"),
    )
    gstart = (F.col("p_partkey") * 9973) % 150000
    genes = part.select(
        F.col("p_name").alias("gene"),
        (F.col("p_partkey") % 23).alias("chrom"),
        gstart.alias("gstart"),
        (gstart + 1000 + (F.col("p_size") * 97) % 50000).alias("gend"),
    )
    joined = overlap_join(
        variants,
        genes,
        key="chrom",
        left_start="vstart",
        left_end="vend",
        right_start="gstart",
        right_end="gend",
        bin_width=16384,
        broadcast_right=True,
    )
    return joined.groupBy("gene").agg(F.count(F.lit(1)).alias("n_variants"))


@query(
    "q_asof_join",
    oracle="""
    SELECT e.event_id,
           CAST(max(epoch(o.o_orderdate)) AS BIGINT) AS matched_order_epoch
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND epoch(o.o_orderdate) <= epoch(ts)
    GROUP BY e.event_id
    """,
)
def q_asof_join(spark, sf_dir):
    """Point-in-time (as-of) join: each event matched to the latest order
    of the same customer at or before the event time.  See
    operators/asof.py for the one-shuffle carry-forward plan; the oracle
    is the O(n·m) greatest-match formulation (fine at oracle scale,
    wrong plan at 100 TB)."""
    events = events_table(spark, sf_dir).select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s")
    )
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.unix_timestamp("o_orderdate").alias("order_s"),
    )
    joined = asof_join(
        events, orders, on="user_id", left_time="ts_s", right_time="order_s",
        value_cols=[],
    )
    return joined.select(
        "event_id", F.col("order_s_right").alias("matched_order_epoch")
    )


@query(
    "q_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate_str
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): selective filters on all three
    tables reach the scans as pushed predicates; the segment filter
    shrinks customer before the join."""
    cutoff = "1995-03-15"
    customer = T(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
        .orderBy(F.col("__rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round("__rev", 2).alias("revenue"),
            F.col("o_orderdate").cast("string").alias("orderdate_str"),
        )
    )


@query(
    "q_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): fact filter pushed to
    the lineitem scan, nation broadcast, top-20 customers by lost
    revenue."""
    customer = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(T(spark, sf_dir, "nation"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev")
        )
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", F.round("__rev", 2).alias("revenue"), "n_name")
    )


@query(
    "q_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year.  Scale plan: the ship-date filter pushes into the lineitem
    scan; supplier/customer/nation broadcast (dims), so the ONLY fact
    shuffle is lineitem⋈orders on the order key; the nation-pair filter
    applies before the grouped aggregation, which is partial-agg'd on a
    tiny (nation, nation, year) key space."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = F.broadcast(T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    supplier = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders of a year that had a late shipment (>90
    days after order date), counted per priority class — the canonical
    EXISTS/semi-join aggregation.  Scale plan: both date filters push to
    the scans, the semi join shuffles only (orderkey, dates) — a LEFT
    SEMI join never materializes lineitem columns — and the final
    aggregate has priority-class cardinality."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )
