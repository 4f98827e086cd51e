"""Adapted TPC-H query suite (SURVEY.md §2.M extension).

The fixture tables are TPC-H-shaped but trimmed (TESTDATA.md): no
partsupp table; no l_commitdate/l_receiptdate/l_shipmode, o_comment/
o_shippriority, c_address/c_phone, p_mfgr/p_container columns; synthetic
domains (nations NATION_0..24, p_type in {ECONOMY,..,PROMO,..}, p_name
"<adj> <noun>"). Each query below keeps the reference query's JOIN/
aggregation/subquery SHAPE — the part that exercises the engine — and
adapts filters to the available columns, documented per query. The
partsupp-dependent queries (Q2/Q11/Q20) were dropped through round 4;
round 5 recovered all three by DERIVING the part-supplier relation
from lineitem (min observed unit price per (partkey, suppkey) for Q2's
supplycost; shipped revenue/quantity for Q11/Q20's value and
comparison) — derived from observed rows, not invented. Q20's
availqty, the one column with no observable stand-in, becomes a
relative threshold against the part's best-supplier quantity; the
nested semi-join + correlated-aggregate shape is intact (see each
docstring). Q12's receipt-commit lateness survives as l_shipdate -
o_orderdate ship-lag buckets (see tpch_q12); Q9/Q16/Q21 likewise
adapt. The full 22-query suite is now covered.

Determinism note: reference Q3/Q10/Q18 end in ORDER BY revenue LIMIT N.
A float-revenue tie near the cut line would make the kept set
engine-dependent, so the LIMIT is replaced by an equivalent HAVING
revenue-threshold (the driver compare is order-insensitive, making
ORDER BY moot). Thresholds are tuned to keep sf0.01 results non-empty.

Scale notes (100 TB): every query is pure DataFrame API — Catalyst gets
filter/projection pushdown to the parquet scans and reorders the joins;
nation/region (25/5 rows at any SF) are explicit broadcasts, customer/
part/supplier joins are left to AQE, which picks broadcast at bench SFs
and shuffle-hash beyond; lineitem only ever shuffles on its join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from basis_spark.io import load
from basis_spark.registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------- Q3 ----
@register(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    HAVING sum(l_extendedprice * (1 - l_discount)) > 50000.5
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: unshipped-order revenue for one segment.

    Adaptation: no o_shippriority column (dropped from grouping); ORDER
    BY/LIMIT 10 replaced with HAVING revenue > 50000 for cross-engine
    determinism (see module docstring)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_raw"),
        )
        .filter(F.col("_raw") > 50000.5)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------- Q4 ----
@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o.o_orderkey
            AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking: orders with at least one late line.

    Adaptation: no l_commitdate/l_receiptdate, so "late" is l_shipdate
    more than 60 days after o_orderdate. Same shape: correlated EXISTS
    -> left-semi join on (key, inequality); the semi join shuffles only
    order keys, never duplicates orders."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01")) & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------- Q5 ----
@register(
    "tpch_q5",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-way star join, revenue per nation.

    Faithful shape (all columns exist). nation/region broadcast
    explicitly; the customer-supplier nation equality rides on the join
    chain exactly like the reference query."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------- Q6 ----
@register(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue change: single-table scan+filter+agg.
    Faithful. The whole predicate pushes to the parquet scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------- Q7 ----
@register(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by direction and year.

    Adaptation: FRANCE/GERMANY -> NATION_1/NATION_2 (synthetic domain).
    Shape faithful: two aliased broadcasts of nation, disjunctive
    cross-nation predicate, derived-column grouping."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------- Q8 ----
@register(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share inside a region for one part type.

    Adaptation: BRAZIL/AMERICA/'ECONOMY ANODIZED STEEL' ->
    NATION_3/ASIA/'ECONOMY'. Shape faithful: 8-way join, two nation
    roles (customer-side for region scoping, supplier-side for the
    share), conditional-sum ratio."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") <= _ts("1997-12-31"))
    )
    cust = load(spark, sf_dir, "customer")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------- Q9 ----
@register(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 6) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by supplier nation and order year.

    Adaptation: no partsupp, so amount omits ps_supplycost * l_quantity
    (gross revenue instead of net profit); '%green%' -> '%red%' for the
    synthetic p_name domain. Join shape otherwise faithful."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 6).alias("sum_profit"))
    )


# -------------------------------------------------------------- Q10 ----
@register(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    HAVING sum(l_extendedprice * (1 - l_discount)) > 100000.5
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: lost revenue per customer.

    Adaptation: c_address/c_phone/c_comment don't exist (dropped from
    the projection); ORDER BY revenue LIMIT 20 -> HAVING > 100000 for
    determinism."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_raw"),
        )
        .filter(F.col("_raw") > 100000.5)
        .select(
            "c_custkey", "c_name", "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"), "n_name",
        )
    )


# -------------------------------------------------------------- Q12 ----
@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > 90 THEN 'LATE'
                WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > 30 THEN 'SLOW'
                ELSE 'FAST' END AS lateness,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (shipping modes & order priority), adapted: the fixture has
    no l_shipmode/l_commitdate/l_receiptdate, so the reference's
    "was the line late?" dimension becomes ship-lag buckets
    (l_shipdate - o_orderdate: FAST <=30d, SLOW 31-90d, LATE >90d) and
    the GROUP BY shifts from ship mode to that bucket. The engine shape
    is intact: orders x lineitem equi-join, a shipdate range filter
    pushed to the scan, and the signature high/low conditional counts
    on o_orderpriority."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1996-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(lag > 90, "LATE")
            .when(lag > 30, "SLOW")
            .otherwise("FAST")
            .alias("lateness"),
            F.when(high, 1).otherwise(0).alias("h"),
        )
        .groupBy("lateness")
        .agg(
            F.sum("h").alias("high_line_count"),
            F.sum(1 - F.col("h")).alias("low_line_count"),
        )
    )


# -------------------------------------------------------------- Q13 ----
@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (including 0-order tail).

    Adaptation: the o_comment NOT LIKE filter becomes an
    o_orderpriority filter (no comment column). Shape faithful:
    filtered LEFT OUTER join inside a double aggregation — count(col)
    not count(*) so unmatched customers land in the c_count=0 bucket."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# -------------------------------------------------------------- Q14 ----
@register(
    "tpch_q14",
    oracle="""
    SELECT round(
        100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion-revenue share. Adaptation: p_type = 'PROMO' exact
    match (synthetic domain has no 'PROMO%' prefixes). Conditional-sum
    ratio over a fact-dim join, faithful."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


# -------------------------------------------------------------- Q15 ----
@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier by quarterly revenue (max-subquery shape).

    The scalar-max subquery becomes a rank-1 window over the aggregated
    (100-row) revenue view — one extra tiny exchange instead of a
    separate collect, and ties keep every argmax row exactly like the
    reference's equality predicate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = (
        revenue.withColumn(
            "_rk", F.rank().over(Window.orderBy(F.col("total_revenue").desc()))
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


# -------------------------------------------------------------- Q16 ----
@register(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count by part attributes.

    Adaptation: no partsupp — the (part, supplier) relation comes from
    lineitem instead; the NOT-IN "complaints" subfilter has no source
    column and is dropped. COUNT(DISTINCT) over a 3-column grouping is
    the load-bearing shape (two-phase distinct aggregation in Spark)."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -------------------------------------------------------------- Q17 ----
@register(
    "tpch_q17",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS ap_key, 0.5 * avg(l_quantity) AS qty_cut
          FROM lineitem GROUP BY l_partkey) pa
      ON p_partkey = ap_key
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_cut
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue for one brand.

    Adaptation: no p_container (dropped filter). The correlated avg
    subquery becomes an explicit per-part aggregate joined back — same
    semantics, one scan of lineitem for the cutoffs instead of a
    re-executed correlated subquery."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    cuts = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(cuts, F.col("p_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# -------------------------------------------------------------- Q18 ----
@register(
    "tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers (orders above a quantity threshold).

    IN-subquery -> left-semi join against the grouped-HAVING key set;
    LIMIT 100 dropped (deterministic HAVING threshold already bounds
    the result)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
    )


# -------------------------------------------------------------- Q19 ----
@register(
    "tpch_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive-predicate revenue (three brand/size/qty arms).

    Adaptation: p_container/l_shipmode arms don't exist; the disjunction
    mixes part and lineitem columns exactly like the reference, so the
    filter can only apply post-join — the shape that exercises join +
    residual-predicate handling."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    arm1 = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# -------------------------------------------------------------- Q21 ----
@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (sole late supplier).

    Adaptation: no l_receiptdate/l_commitdate — "late" is shipping more
    than 90 days after the order date; FRANCE -> NATION_1. Shape
    faithful: EXISTS -> left-semi, NOT EXISTS -> left-anti, both
    correlated on the order key with a supplier-inequality residual."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    nation = F.broadcast(
        load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_others = l1.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# -------------------------------------------------------------- Q22 ----
@register(
    "tpch_q22",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
      AND c_acctbal > (
          SELECT avg(c_acctbal) FROM customer
          WHERE c_acctbal > 0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: rich customers with no RECENT
    orders (none since 2001-01-01 — the fixture's final 7 months).

    Adaptations: phone-prefix country codes -> c_nationkey membership
    (no c_phone column); and the reference's "no orders at all" is
    recency-scoped because EVERY fixture customer has orders at sf0.01,
    which made the round-1..3 form return 0 rows — a vacuous oracle
    pass (0 == 0) that hid nothing only by luck (found by the round-4
    zero-row oracle audit). Shape faithful: scalar-avg subquery
    (1-row cross-joined aggregate, broadcast), NOT EXISTS ->
    left-anti join against the filtered orders."""
    nats = [0, 1, 2, 3, 4, 5, 6]
    cust = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nats))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ------------------------------------------------------------ Q1 ----
# Q1 is the repo's flagship (agg_groupby_multi, bench q1); registered
# under the tpch_ namespace too so the suite reads complete. The alias
# registration lives in operators/__init__.py AFTER all module imports
# so importing aggregates here doesn't hijack registration order (the
# driver's correctness gate verifies the first 50 registered keys).


# --------------------------------------------------------------- Q2 ----
@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2),
    eur AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name,
               min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS best
        FROM ps JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, round(ps_supplycost, 4) AS supplycost
    FROM eur JOIN part ON p_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'PROMO' AND ps_supplycost = best
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (recovered in round 5): the fixture has
    no partsupp, but the part-supplier cost relation Q2 aggregates is
    DERIVED from lineitem — min observed unit price per (partkey,
    suppkey) — not invented. The engine shape is intact: build the
    part×supplier cost relation, restrict suppliers to one region
    (region→nation→supplier broadcast chain), and keep each part's
    minimum-cost supplier(s) via the correlated-min predicate. The
    reference's correlated subquery decorrelates to a per-part window
    min over the region-filtered cost relation — one extra exchange on
    ps_partkey instead of a re-executed subquery, and float equality is
    safe because both engines compute the identical IEEE double min.

    Scale: lineitem shuffles once for the (part, supp) aggregate; the
    window partitions on ps_partkey (millions of parts — no skew); all
    dims broadcast. p_size/p_type filters replace p_mfgr/p_container
    (columns absent from the fixture)."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn(
            "best",
            F.min("ps_supplycost").over(Window.partitionBy("ps_partkey")),
        )
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    return (
        eur.filter(F.col("ps_supplycost") == F.col("best"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
    )


# -------------------------------------------------------------- Q11 ----
@register(
    "tpch_q11",
    oracle="""
    WITH value_by_part AS (
        SELECT l_partkey AS p_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 3
        GROUP BY 1)
    SELECT p_partkey, round(val, 2) AS part_value
    FROM value_by_part
    WHERE val > (SELECT 1.75 * avg(val) FROM value_by_part)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important-stock identification (recovered in round 5): the
    reference sums ps_supplycost*ps_availqty per part for one nation's
    suppliers and keeps parts above a fraction-of-total scalar
    subquery. Without partsupp, part value is DERIVED as the revenue of
    each part shipped by one region's suppliers; the HAVING-share
    scalar subquery survives, re-expressed scale-free as 1.75x the
    average part value (TPC-H's fraction is 0.0001/SF — SF-dependent by
    design; an avg multiple keeps the cut meaningful at every fixture
    SF). Shape: group-aggregate → 1-row scalar aggregate → broadcast
    back as a filter — no collect, no cartesian (BroadcastNestedLoop
    on a single row).

    Scale: lineitem shuffles once on l_partkey after the supplier/
    nation broadcast prefilter; the scalar cut is a 1-row broadcast."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    vbp = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
        )
    )
    cut = vbp.agg((F.lit(1.75) * F.avg("val")).alias("cut"))
    return (
        vbp.join(F.broadcast(cut))
        .filter(F.col("val") > F.col("cut"))
        .select("p_partkey", F.round("val", 2).alias("part_value"))
    )


# -------------------------------------------------------------- Q20 ----
@register(
    "tpch_q20",
    oracle="""
    WITH sq AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY 1, 2),
    sqm AS (
        SELECT l_suppkey, qty,
               max(qty) OVER (PARTITION BY l_partkey) AS part_max
        FROM sq
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%'))
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3
      AND s_suppkey IN (SELECT l_suppkey FROM sqm
                        WHERE qty >= 0.5 * part_max)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential-part-promotion suppliers (recovered in round 5):
    the reference keeps suppliers whose ps_availqty exceeds half the
    quantity they shipped of 'forest%' parts in a year, nested two
    semi-joins deep. availqty cannot be derived, so the correlated
    comparison becomes "supplier shipped >= half of the part's
    best-supplier quantity" — the same nested shape: year-filtered
    per-(part, supplier) aggregate, part-name semi-join, correlated
    per-part aggregate threshold (window max), then a semi-join up to
    the region's suppliers.

    Scale: one lineitem shuffle on (partkey, suppkey); the part-name
    filter semi-joins BEFORE the window so only matching parts flow
    into the per-part max; the final supplier semi-join is
    broadcast-sized (distinct suppkeys ≪ suppliers)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1996-01-01"))
    )
    small_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    sq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    sqm = sq.join(
        F.broadcast(small_parts), sq.l_partkey == F.col("p_partkey"), "leftsemi"
    ).withColumn("part_max", F.max("qty").over(Window.partitionBy("l_partkey")))
    qualified = (
        sqm.filter(F.col("qty") >= 0.5 * F.col("part_max"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            supp.s_suppkey == F.col("l_suppkey"),
            "leftsemi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )
