"""Projection, filter, and row-level ops (SURVEY.md §2.B).

Pure narrow transformations — no shuffle at any scale. All expressions
are built-in Column ops so they stay inside whole-stage codegen and the
filters are eligible for parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register


@register(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
           l_extendedprice * l_discount AS discount_amt
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row products are NOT rounded: both engines compute the identical
    # IEEE double (same op order) so raw values hash-match, whereas
    # rounding hits decimal-half boundaries (x.xx5) where Spark and DuckDB
    # disagree. Rounding is reserved for aggregates (R1 refined).
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "net_price"
        ),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_amt"),
    )


@register(
    "filter_conj",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      AND NOT (o_orderpriority = '5-LOW')
    """,
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%a%' AND regexp_matches(p_type, '^(PROMO|ECONOMY)')
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%") & F.col("p_type").rlike("^(PROMO|ECONOMY)")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "drop_rename_cast",
    oracle="""
    SELECT o_orderkey AS okey,
           CAST(o_custkey AS INTEGER) AS ckey_int,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor
    FROM orders
    """,
)
def drop_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.drop("o_orderstatus", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "okey")
        .select(
            "okey",
            F.col("o_custkey").cast("int").alias("ckey_int"),
            F.col("o_orderdate").cast("date").alias("odate"),
            F.col("o_totalprice").cast("bigint").alias("price_floor"),
        )
    )


@register(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 75000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                ELSE 'large' END AS bucket
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 75000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
        .alias("bucket"),
    )


@register(
    "union_increments",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice < 100000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_totalprice >= 100000 AND o_orderstatus = 'O'
    """,
)
def union_increments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # basis block-append primitive: two increments unioned by name.
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    inc1 = o.filter(F.col("o_totalprice") < 100000)
    inc2 = o.filter((F.col("o_totalprice") >= 100000) & (F.col("o_orderstatus") == "O"))
    return inc1.unionByName(inc2)


@register(
    "union_schema_evolution",
    oracle="""
    SELECT event_id, user_id, value, channel FROM (
        SELECT event_id, user_id, value, NULL AS channel
        FROM events WHERE event_id < 100
        UNION ALL BY NAME
        SELECT event_id, user_id, value, event_type AS channel
        FROM events WHERE event_id >= 100 AND event_id < 200) t
    """,
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-append across a schema change (basis blocks evolve: a later
    increment gains a column). unionByName(allowMissingColumns=True)
    aligns by NAME and null-fills the missing column — positional union
    would silently misalign. The oracle is DuckDB's UNION ALL BY NAME.
    """
    ev = load(spark, sf_dir, "events")
    old_block = ev.filter(F.col("event_id") < 100).select("event_id", "user_id", "value")
    new_block = (
        ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
        .select("event_id", "user_id", "value", F.col("event_type").alias("channel"))
    )
    return old_block.unionByName(new_block, allowMissingColumns=True)


@register(
    "merge_upsert",
    oracle="""
    SELECT coalesce(c.c_custkey, b.c_custkey) AS c_custkey,
           coalesce(c.c_name, b.c_name) AS c_name,
           round(coalesce(c.new_bal, b.c_acctbal), 2) AS acctbal,
           CASE WHEN b.c_custkey IS NULL THEN 'insert'
                WHEN c.c_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 1200) b
    FULL OUTER JOIN
         (SELECT c_custkey, c_name, c_acctbal + 100 AS new_bal
          FROM customer WHERE c_custkey > 1000) c
      ON b.c_custkey = c.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert (MERGE INTO semantics, engine-agnostic form): a changes
    set applied onto a base table — matched keys update, unmatched
    changes insert, untouched base rows persist, each row tagged with
    the action taken. Expressed as full-outer join + coalesce, which is
    exactly the join Delta/Iceberg MERGE compiles to; at 100 TB both
    sides shuffle on the key once (or the changes side broadcasts when
    small, the common CDC case)."""
    cust = load(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_custkey") <= 1200).select("c_custkey", "c_name", "c_acctbal")
    changes = (
        cust.filter(F.col("c_custkey") > 1000)
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100).alias("new_bal"))
    )
    b, c = base.alias("b"), changes.alias("c")
    return b.join(c, F.col("b.c_custkey") == F.col("c.c_custkey"), "full_outer").select(
        F.coalesce(F.col("c.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("c.c_name"), F.col("b.c_name")).alias("c_name"),
        F.round(F.coalesce(F.col("c.new_bal"), F.col("b.c_acctbal")), 2).alias("acctbal"),
        F.when(F.col("b.c_custkey").isNull(), "insert")
        .when(F.col("c.c_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


@register(
    "parse_try_cast_quarantine",
    oracle="""
    WITH raw AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0
                    THEN CAST(o_totalprice AS VARCHAR) || 'x'
                    ELSE CAST(o_totalprice AS VARCHAR) END AS raw_price
        FROM orders)
    SELECT o_orderkey,
           round(TRY_CAST(raw_price AS DOUBLE), 2) AS price,
           CASE WHEN TRY_CAST(raw_price AS DOUBLE) IS NULL
                THEN 'quarantine' ELSE 'ok' END AS status
    FROM raw
    """,
)
def parse_try_cast_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver ingestion with rescue: try_cast the untyped column,
    route unparseable rows to a quarantine status instead of failing the
    job (ANSI mode makes a plain CAST throw on the first bad row — at
    100 TB you never want one malformed record killing a 6-hour load).

    Malformed input is synthesized deterministically (every 97th key
    gets a trailing junk char) so the split is oracle-checkable. Pure
    map-only stage: no shuffle, fully pushdown-transparent; in
    production the two statuses fan out to separate partitioned sinks
    (partitionBy('status')) in the same single pass."""
    orders = load(spark, sf_dir, "orders")
    raw = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.concat(F.col("o_totalprice").cast("string"), F.lit("x")),
        )
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("raw_price"),
    )
    val = F.expr("try_cast(raw_price AS double)")
    return raw.select(
        "o_orderkey",
        F.round(val, 2).alias("price"),
        F.when(val.isNull(), F.lit("quarantine")).otherwise(F.lit("ok")).alias("status"),
    )
