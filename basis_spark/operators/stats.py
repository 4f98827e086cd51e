"""Distribution-comparison statistics (two-sample tests).

Both operators compare the `value` distribution of two event
populations (click vs purchase) — the drift test a data pipeline runs
when a new ingest batch, scraper version, or upstream model change
might have shifted a feature distribution.

Scale design (100 TB): both tests reduce to ONE aggregation keyed on
the (grouped) value followed by a distributed two-pass prefix sum over
value order — the same range-partition + P-row-offset shape as
windows.global_rank/global_cumsum, never a data-sized single-partition
window. The final statistic is a 1-row combine (declared in the
single-partition ratchet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register

GROUP_A = "click"
GROUP_B = "purchase"


def two_group_value_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per distinct value v of the two populations: group counts
    (na, nb), inclusive prefix counts in value order (cna, cnb, cab),
    and grand totals (ta, tb) — the shared scaffold of every rank-based
    two-sample statistic.

    Distributed two-pass prefix sum (global_cumsum's shape, carried for
    three columns at once): range-partition on v + local sort, P-row
    per-partition subtotal table -> broadcast prefix offsets, local
    running sums offset per partition. The only driver-sized object is
    the P-row offset table; totals ride along as a window over those
    same P rows."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(GROUP_A, GROUP_B)
    )
    g = (
        ev.select(
            F.col("value").alias("v"),
            F.when(F.col("event_type") == GROUP_A, 1).otherwise(0).alias("ca"),
            F.when(F.col("event_type") == GROUP_B, 1).otherwise(0).alias("cb"),
        )
        .groupBy("v")
        .agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    )
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loc = (
        g.repartitionByRange(P, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
    )
    psum = loc.groupBy("pid").agg(
        F.sum("na").alias("sa"), F.sum("nb").alias("sb")
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.partitionBy(F.lit(1))
    offs = psum.select(
        "pid",
        F.coalesce(F.sum("sa").over(woff), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("sb").over(woff), F.lit(0)).alias("offb"),
        F.sum("sa").over(wtot).alias("ta"),
        F.sum("sb").over(wtot).alias("tb"),
    )
    wloc = Window.partitionBy("pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        loc.join(F.broadcast(offs), "pid")
        .withColumn("cna", F.col("offa") + F.sum("na").over(wloc))
        .withColumn("cnb", F.col("offb") + F.sum("nb").over(wloc))
        .withColumn("cab", F.col("cna") + F.col("cnb"))
        .drop("pid", "offa", "offb")
    )


@register(
    "stat_ks_two_sample",
    oracle=f"""
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type='{GROUP_A}' THEN 1 ELSE 0 END AS ca,
             CASE WHEN event_type='{GROUP_B}' THEN 1 ELSE 0 END AS cb
      FROM events WHERE event_type IN ('{GROUP_A}','{GROUP_B}')),
    g AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM s GROUP BY v),
    c AS (SELECT v,
             sum(na) OVER (ORDER BY v) AS cna,
             sum(nb) OVER (ORDER BY v) AS cnb,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb
          FROM g)
    SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
           round(max(abs(CAST(cna AS DOUBLE)/ta - CAST(cnb AS DOUBLE)/tb)), 6)
               AS ks_stat
    FROM c
    """,
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: the max gap between the
    two empirical CDFs, evaluated at every observed value — the
    standard nonparametric drift detector for continuous features
    (no binning choices to tune, sensitive to shape changes a mean
    check misses). Built entirely on the distributed prefix-sum
    scaffold; the max-gap reduction is a 1-row combine."""
    c = two_group_value_cum(spark, sf_dir)
    gap = F.abs(
        F.col("cna").cast("double") / F.col("ta")
        - F.col("cnb").cast("double") / F.col("tb")
    )
    return c.agg(
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
        F.round(F.max(gap), 6).alias("ks_stat"),
    )


@register(
    "stat_mann_whitney_u",
    oracle=f"""
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type='{GROUP_A}' THEN 1 ELSE 0 END AS ca,
             CASE WHEN event_type='{GROUP_B}' THEN 1 ELSE 0 END AS cb
      FROM events WHERE event_type IN ('{GROUP_A}','{GROUP_B}')),
    g AS (SELECT v, sum(ca) AS na, sum(cb) AS nb FROM s GROUP BY v),
    c AS (SELECT v, na, nb,
             sum(na+nb) OVER (ORDER BY v) AS cab,
             sum(na) OVER () AS ta, sum(nb) OVER () AS tb
          FROM g),
    a AS (SELECT ta, tb,
             sum(na * (cab - na - nb + 1 + (na + nb - 1)/2.0)) AS rsum_a
          FROM c GROUP BY ta, tb)
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           round(rsum_a - ta*(ta+1)/2.0, 4) AS u_a,
           round(ta*tb - (rsum_a - ta*(ta+1)/2.0), 4) AS u_b
    FROM a
    """,
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) statistic with exact midrank tie
    handling: does one population stochastically dominate the other —
    the location-shift companion to the KS shape test. Average ranks
    come straight from the prefix-sum scaffold (rank of a tied block =
    count of smaller values + midpoint of the block), so no global sort
    or data-sized window exists; u_a + u_b = n_a*n_b by construction
    (the oracle pins both, so the identity is checked on every run)."""
    c = two_group_value_cum(spark, sf_dir)
    avg_rank = (
        F.col("cab") - F.col("na") - F.col("nb") + 1
        + (F.col("na") + F.col("nb") - 1) / 2.0
    )
    a = c.groupBy("ta", "tb").agg(
        F.sum(F.col("na") * avg_rank).alias("rsum_a")
    )
    u_a = F.col("rsum_a") - F.col("ta") * (F.col("ta") + 1) / 2.0
    return a.select(
        F.col("ta").cast("long").alias("n_a"),
        F.col("tb").cast("long").alias("n_b"),
        F.round(u_a, 4).alias("u_a"),
        F.round(F.col("ta") * F.col("tb") - u_a, 4).alias("u_b"),
    )
