"""Registry query module (mechanical split of the former monolithic registry.py,
round 11 — registration order preserved by the package __init__ import order)."""

from __future__ import annotations

from ._common import *  # noqa: F401,F403
from ._common import (  # noqa: F401 — underscore names not covered by *
    _epoch,
    _events,
    _math,
    _register,
    _Win,
)

# =========================================================================
# Bench / TPC-H-style (Phase 6; fixture star schema)
# =========================================================================

_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)(lambda spark, sf: load_table(spark, "lineitem", sf)
    .filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
        F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
        F.sum((revenue() * (1 + F.col("l_tax"))).cast("decimal(18,6)")).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    ))


def _q3(spark: SparkSession, sf: str) -> DataFrame:
    customer = load_table(spark, "customer", sf).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf).filter(
        F.col("o_orderdate") < F.lit("1998-06-30 00:00:00").cast("timestamp")
    )
    lineitem = load_table(spark, "lineitem", sf).filter(
        F.col("l_shipdate") > F.lit("1998-06-30 00:00:00").cast("timestamp")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.col("revenue"),
            F.col("o_orderdate").cast("long").alias("o_orderdate_epoch"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           floor(epoch(o_orderdate))::BIGINT AS o_orderdate_epoch
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
)(_q3)


def _q5(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, "region", sf).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf)
    customer = load_table(spark, "customer", sf)
    supplier = load_table(spark, "supplier", sf)
    orders = load_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, "lineitem", sf)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
    )


_register(
    "q5_local_supplier_volume",
    """
    SELECT n_name, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)(_q5)


_register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)(lambda spark, sf: load_table(spark, "lineitem", sf)
    .filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    .agg(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")).cast("double").alias("revenue")))


def _q10(spark: SparkSession, sf: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf).filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, "orders", sf)
    customer = load_table(spark, "customer", sf)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem, orders, customer
    WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)(_q10)


# --- TPC-H-pattern breadth: each query below exercises a distinct relational
# operator class the engine must support at scale (semi/anti joins plan as
# broadcast/shuffled semi joins — no row explosion; correlated aggregates are
# expressed as join-with-agg, the shape Catalyst plans best; disjunctive
# predicates still reach the parquet scan as pushed filters). Adapted to the
# fixture schema (no partsupp/shipmode/commitdate columns).


def _q4(spark: SparkSession, sf: str) -> DataFrame:
    # EXISTS → left_semi join: orders with at least one returned lineitem
    orders = load_table(spark, "orders", sf).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    returned = load_table(spark, "lineitem", sf).filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_register(
    "q4_priority_semijoin",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)(_q4)


def _q7(spark: SparkSession, sf: str) -> DataFrame:
    # nation-pair trade volume by year: two independent dimension paths to
    # nation (via supplier and via customer), both broadcast
    n1 = load_table(spark, "nation", sf).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    lineitem = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        lineitem.join(
            F.broadcast(load_table(spark, "supplier", sf)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(load_table(spark, "orders", sf), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(load_table(spark, "customer", sf)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("volume"))
    )


_register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate)::INT AS l_year,
             l_extendedprice, l_discount
      FROM lineitem, supplier, orders, customer, nation n1, nation n2
      WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)(_q7)


def _q14(spark: SparkSession, sf: str) -> DataFrame:
    # conditional-aggregation share: promo revenue % of total for one month
    lineitem = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    joined = lineitem.join(
        F.broadcast(load_table(spark, "part", sf)),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", revenue()).otherwise(F.lit(0.0)).cast("decimal(18,4)")
    ).cast("double")
    total = F.sum(revenue().cast("decimal(18,4)")).cast("double")
    return joined.agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))


_register(
    "q14_promo_share",
    """
    SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)(_q14)


def _q15(spark: SparkSession, sf: str) -> DataFrame:
    # argmax via scalar subquery: supplier(s) with the max quarterly revenue.
    # Equality join on the DECIMAL total (exact, order-independent) — the
    # double cast happens only at the output boundary.
    rev = (
        load_table(spark, "lineitem", sf)
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue().cast("decimal(18,4)")).alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("max_dec"))
    return (
        rev.join(F.broadcast(mx), F.col("total_dec") == F.col("max_dec"))
        .join(
            F.broadcast(load_table(spark, "supplier", sf)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


_register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM rev, supplier
    WHERE l_suppkey = s_suppkey
      AND total_dec = (SELECT max(total_dec) FROM rev)
    """,
)(_q15)


def _q17(spark: SparkSession, sf: str) -> DataFrame:
    # correlated scalar aggregate → join-with-agg: lineitems far below the
    # part's average order quantity. Portable because l_quantity is integral
    # (exact double sums ⇒ identical avg in any fold order on any engine).
    lineitem = load_table(spark, "lineitem", sf)
    part = load_table(spark, "part", sf).filter(F.col("p_brand") == "Brand#23")
    half_avg = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(half_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("small_qty_revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


_register(
    "q17_small_quantity",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_qty_revenue,
           count(*) AS n_lineitems
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)(_q17)


def _q18(spark: SparkSession, sf: str) -> DataFrame:
    # HAVING on a grouped sum, then join the survivors back to their header
    # rows — the aggregate runs FIRST so only qualifying orderkeys re-join
    big = (
        load_table(spark, "lineitem", sf)
        .groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        load_table(spark, "orders", sf)
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"))
        .join(
            F.broadcast(load_table(spark, "customer", sf)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("long").alias("o_orderdate_epoch"),
            "o_totalprice",
            "sum_qty",
        )
    )


_register(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           floor(epoch(o_orderdate))::BIGINT AS o_orderdate_epoch,
           o_totalprice, sum_qty
    FROM orders, customer,
         (SELECT l_orderkey AS big_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
    WHERE o_orderkey = big_orderkey AND o_custkey = c_custkey
    """,
)(_q18)


def _q19(spark: SparkSession, sf: str) -> DataFrame:
    # disjunctive multi-attribute predicate across the join: Catalyst splits
    # the OR into per-side pushed filters (brand/size to the part scan,
    # quantity to the lineitem scan) before evaluating the residual
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        load_table(spark, "lineitem", sf)
        .join(
            F.broadcast(load_table(spark, "part", sf)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("revenue"))
    )


_register(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
    """,
)(_q19)


def _q22(spark: SparkSession, sf: str) -> DataFrame:
    # anti-join + scalar subquery: above-average-balance customers with NO
    # recent orders, per nation. The average comparison is done as an exact
    # DECIMAL cross-multiply (bal * n > total) — dividing first would compare
    # against an engine-dependent rounded quotient.
    customer = load_table(spark, "customer", sf)
    pos = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.count("*").alias("n_pos"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("total_pos"),
    )
    recent = load_table(spark, "orders", sf).filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        customer.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,4)") * F.col("n_pos") > F.col("total_pos"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            F.broadcast(load_table(spark, "nation", sf)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_dormant"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_acctbal"),
        )
    )


_register(
    "q22_dormant_customers",
    """
    WITH pos AS (
      SELECT count(*) AS n_pos, sum(CAST(c_acctbal AS DECIMAL(18,4))) AS total_pos
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name, count(*) AS n_dormant,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer, nation, pos
    WHERE c_nationkey = n_nationkey
      AND CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > total_pos
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
)(_q22)


def _q8(spark: SparkSession, sf: str) -> DataFrame:
    # market-share: one nation's suppliers' slice of a region's PROMO
    # market per order-year — conditional share over a 6-table star join,
    # every dimension broadcast, division deferred to exact decimal sums
    n_cust = load_table(spark, "nation", sf).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = load_table(spark, "nation", sf).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, "region", sf).filter(F.col("r_name") == "ASIA")
    part = load_table(spark, "part", sf).filter(F.col("p_type") == "PROMO")
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", revenue())
        .otherwise(F.lit(0.0))
        .cast("decimal(18,4)")
    ).cast("double")
    share_den = F.sum(revenue().cast("decimal(18,4)")).cast("double")
    return (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(load_table(spark, "orders", sf), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(load_table(spark, "customer", sf)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == F.col("r_regionkey"))
        .join(
            F.broadcast(load_table(spark, "supplier", sf)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((share_num / share_den).alias("mkt_share"))
    )


_register(
    "q8_market_share",
    """
    SELECT year(o_orderdate)::INT AS o_year,
           CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS mkt_share
    FROM lineitem, part, orders, customer, supplier, nation n1, nation n2, region
    WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND s_nationkey = n2.n_nationkey
      AND r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY year(o_orderdate)
    """,
)(_q8)


def _q9(spark: SparkSession, sf: str) -> DataFrame:
    # profit rollup by supplier nation × order year over a part-name
    # substring filter (LIKE stays a pushed scan filter)
    part = load_table(spark, "part", sf).filter(F.col("p_name").contains("widget"))
    return (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(load_table(spark, "supplier", sf)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(load_table(spark, "nation", sf)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(load_table(spark, "orders", sf), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(revenue().cast("decimal(18,4)")).cast("double").alias("profit"))
    )


_register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem, part, supplier, nation, orders
    WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)(_q9)


def _q16(spark: SparkSession, sf: str) -> DataFrame:
    # NOT IN (null-free key) → broadcast anti join; distinct-count grid
    bad_suppliers = load_table(spark, "supplier", sf).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, "part", sf).filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_register(
    "q16_supplier_part_grid",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#45'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)(_q16)


def _q21(spark: SparkSession, sf: str) -> DataFrame:
    # chained EXISTS / NOT EXISTS with non-equi correlation: suppliers in
    # one nation who returned items on multi-supplier finished orders where
    # NO other supplier returned — a semi join then an anti join, both on
    # (orderkey, suppkey≠) compound conditions
    lineitem = load_table(spark, "lineitem", sf)
    orders = load_table(spark, "orders", sf).filter(F.col("o_orderstatus") == "F")
    nation = load_table(spark, "nation", sf).filter(F.col("n_name") == "NATION_3")
    supplier = load_table(spark, "supplier", sf)
    l1 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("s_key")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(orders, F.col("o_key") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("o_key") == F.col("l2_orderkey"))
            & (F.col("s_key") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o_key") == F.col("l3_orderkey"))
            & (F.col("s_key") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                    "left_semi",
                )
            ),
            F.col("s_key") == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


_register(
    "q21_sole_returning_supplier",
    """
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM lineitem l1, supplier, nation
    WHERE l1.l_suppkey = s_suppkey AND l1.l_returnflag = 'R'
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_suppkey, s_name
    """,
)(_q21)


def _q13(spark: SparkSession, sf: str) -> DataFrame:
    # outer-join histogram (TPC-H Q13 pattern): orders-per-customer
    # distribution. The LEFT join keeps zero-order customers and
    # count(o_orderkey) counts only matched rows; pre-filtering the right
    # side is equivalent to the ON-clause predicate for an outer join.
    orders = load_table(spark, "orders", sf).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        load_table(spark, "customer", sf)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_register(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
)(_q13)


def _q2(spark: SparkSession, sf: str) -> DataFrame:
    # correlated per-group MIN subquery (TPC-H Q2 pattern, adapted: no
    # partsupp table — the supply relation is the distinct (part, supplier)
    # pairs observed in lineitem). For each sized part, keep the region's
    # supplier(s) with the minimum account balance among those who shipped
    # it. The min-comparison is on a raw stored double (no arithmetic), so
    # it is engine-exact without decimal detours.
    region = load_table(spark, "region", sf).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf).join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    supplier = load_table(spark, "supplier", sf).join(
        F.broadcast(nation.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    part = load_table(spark, "part", sf).filter(F.col("p_size") == 15)
    supply = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_bal = supply.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supply.join(
            F.broadcast(min_bal),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
    )


_register(
    "q2_min_balance_supplier",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey, s_suppkey, s_name, s_acctbal
      FROM lineitem, supplier, nation, region, part
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND l_partkey = p_partkey AND p_size = 15
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
    FROM supply, part
    WHERE l_partkey = p_partkey
      AND s_acctbal = (SELECT min(s_acctbal) FROM supply s2
                       WHERE s2.l_partkey = supply.l_partkey)
    """,
)(_q2)


def _q11(spark: SparkSession, sf: str) -> DataFrame:
    # HAVING against a scalar-fraction subquery (TPC-H Q11 pattern): parts
    # whose inventory value from one nation's suppliers exceeds 0.1% of
    # that nation's total. The fraction compare is cross-multiplied to
    # part_value * 1000 > total (exact DECIMALs) — no engine-dependent
    # quotient decides group membership.
    nation = load_table(spark, "nation", sf).filter(F.col("n_name") == "NATION_7")
    supplier = load_table(spark, "supplier", sf).join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    value = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
    )
    per_part = (
        load_table(spark, "lineitem", sf)
        .join(F.broadcast(supplier.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(value.alias("part_value_dec"))
        # feeds BOTH the total aggregate and the filter: materialize the
        # |parts|-row relation once (lazy) instead of re-running the
        # lineitem semi-join + aggregation for the total branch
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(F.sum("part_value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value_dec") * 1000 > F.col("total_dec"))
        .select(
            "l_partkey",
            F.col("part_value_dec").cast("double").alias("part_value"),
        )
    )


_register(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS part_value_dec
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE part_value_dec * 1000 > (SELECT sum(part_value_dec) FROM pv)
    """,
)(_q11)


def _q12(spark: SparkSession, sf: str) -> DataFrame:
    # two-level conditional counting after a join (TPC-H Q12 pattern,
    # adapted to this schema: line-status plays ship-mode, order priority
    # is bucketed high/low): per status, how many shipped lines in one
    # year belong to urgent-ish orders vs not.
    li = load_table(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            load_table(spark, "orders", sf),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_register(
    "q12_priority_line_counts",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)(_q12)


def _q20(spark: SparkSession, sf: str) -> DataFrame:
    # nested semi-join chain (TPC-H Q20 pattern, adapted): suppliers in one
    # nation who are the TOP shipper (by total quantity) of some PROMO part.
    # A fixed share threshold (TPC-H's 0.5*sum) empties as supplier count
    # grows with SF; the per-part argmax is scale-invariant. The max
    # comparison is an exact DECIMAL-sum equality; ties keep all maximal
    # suppliers identically in both engines.
    part = load_table(spark, "part", sf).filter(F.col("p_type") == "PROMO")
    li = load_table(spark, "lineitem", sf).join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("supp_qty")
    )
    per_part_max = per_pair.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.max("supp_qty").alias("max_qty")
    )
    top_shippers = (
        per_pair.join(
            F.broadcast(per_part_max),
            (F.col("l_partkey") == F.col("t_partkey"))
            & (F.col("supp_qty") == F.col("max_qty")),
        )
        .select("l_suppkey")
    )
    nation = load_table(spark, "nation", sf).filter(F.col("n_name") == "NATION_2")
    return (
        load_table(spark, "supplier", sf)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(top_shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_register(
    "q20_top_part_supplier",
    """
    WITH li AS (
      SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,4)) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    ),
    pair AS (SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty
             FROM li GROUP BY l_partkey, l_suppkey),
    mx AS (SELECT l_partkey AS t_partkey, max(supp_qty) AS max_qty
           FROM pair GROUP BY l_partkey)
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_2'
      AND s_suppkey IN (SELECT l_suppkey FROM pair, mx
                        WHERE l_partkey = t_partkey AND supp_qty = max_qty)
    """,
)(_q20)


def _cohort(spark: SparkSession, sf: str) -> DataFrame:
    # classic event-analytics cohort retention: users grouped by signup
    # week, activity counted per whole-week offset. Weeks are Monday-
    # aligned midnights in both engines, so day-diffs are exact multiples
    # of 7 and the offset division is portable.
    ev = _events(spark, sf)
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    return (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("activity_week"))
        .join(cohorts, on="user_id")
        .filter(F.col("activity_week") >= F.col("cohort_week"))
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week_epoch"),
            (F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


_register(
    "cohort_retention_weekly",
    """
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT floor(epoch(cohort_week))::BIGINT AS cohort_week_epoch,
           (date_diff('day', cohort_week, date_trunc('week', e.ts)) / 7)::INT
               AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e, cohorts c
    WHERE e.user_id = c.user_id
      AND date_trunc('week', e.ts) >= cohort_week
    GROUP BY 1, 2
    """,
)(_cohort)


_register(
    "percentile_quantity",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)(lambda spark, sf: load_table(spark, "lineitem", sf)
    .groupBy("l_returnflag")
    .agg(
        # ordered statistics are portable here because l_quantity is
        # integral and the interpolation fractions are powers of two:
        # every term ((1-h)·lo + h·hi, h ∈ {.25,.5,.75}) is exact, so both
        # engines' formulas produce the same double bit-for-bit
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count("*").alias("n"),
    ))


def _funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") > F.col("signup_ts"))
        & (F.col("p_ts") <= F.col("signup_ts") + F.expr("interval 7 days"))
    )
    joined = signups.join(purchases, cond, "left")
    return joined.groupBy("signup_id", "user_id", "signup_ts").agg(
        (F.min(F.col("p_ts").cast("long")) - F.col("signup_ts").cast("long")).alias(
            "secs_to_first_purchase"
        )
    ).select("signup_id", "user_id", "secs_to_first_purchase")


_register(
    "funnel_signup_to_purchase",
    """
    SELECT s.event_id AS signup_id, s.user_id AS user_id,
           min(floor(epoch(p.ts))::BIGINT) - floor(epoch(s.ts))::BIGINT
               AS secs_to_first_purchase
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id AND p.ts > s.ts
     AND p.ts <= s.ts + INTERVAL '7 days'
    GROUP BY s.event_id, s.user_id, s.ts
    """,
)(_funnel)

_register(
    "events_daily_rollup",
    """
    SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS day_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)(lambda spark, sf: _events(spark, sf)
    .groupBy(
        (F.floor(F.col("ts").cast("long") / 86400) * 86400).alias("day_start"),
        F.col("event_type"),
    )
    .agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ))


_register(
    "rollup_user_type",
    """
    SELECT user_id, event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY ROLLUP (user_id, event_type)
    """,
)(lambda spark, sf: _events(spark, sf)
    .rollup("user_id", "event_type")
    .agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ))


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_register(
    "pivot_user_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)(lambda spark, sf: _events(spark, sf)
    .groupBy("user_id")
    .pivot("event_type", _EVENT_TYPES)
    .count()
    .na.fill(0, _EVENT_TYPES))


def _analytic_rank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as Win

    totals = _events(spark, sf).groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total")
    )
    w = Win.partitionBy("event_type").orderBy(F.desc("total"), F.asc("user_id"))
    return totals.select(
        "event_type",
        "user_id",
        "total",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("user_id", 1).over(w).alias("prev_user"),
        F.ntile(4).over(w).alias("quartile"),
    )


_register(
    "analytic_rank_users",
    """
    SELECT event_type, user_id, total,
           rank() OVER w::INT AS rnk,
           dense_rank() OVER w::INT AS drnk,
           lag(user_id, 1) OVER w AS prev_user,
           ntile(4) OVER w::INT AS quartile
    FROM (
      SELECT event_type, user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type, user_id
    )
    WINDOW w AS (PARTITION BY event_type ORDER BY total DESC, user_id ASC)
    """,
)(_analytic_rank)


