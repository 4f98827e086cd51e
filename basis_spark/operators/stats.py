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


@register(
    "stat_anova_oneway",
    oracle="""
    WITH g AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
               avg(value) AS m, var_samp(value) AS s2
        FROM events GROUP BY 1),
    t AS (
        SELECT sum(n) AS n_total, count(*) AS k,
               sum(n * m) / sum(n) AS grand_mean
        FROM g)
    SELECT CAST(t.k AS BIGINT) AS k_groups,
           CAST(t.n_total AS BIGINT) AS n_total,
           round(sum(g.n * (g.m - t.grand_mean) * (g.m - t.grand_mean)), 4)
               AS ss_between,
           round(sum((g.n - 1) * g.s2), 4) AS ss_within,
           round((sum(g.n * (g.m - t.grand_mean) * (g.m - t.grand_mean))
                      / (t.k - 1))
                 / (sum((g.n - 1) * g.s2) / (t.n_total - t.k)), 6) AS f_stat
    FROM g CROSS JOIN t
    GROUP BY t.k, t.n_total, t.grand_mean
    """,
)
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic: does mean(value) differ across the
    k event-type populations? The decomposition SS_total = SS_between
    + SS_within needs only per-group (n, mean, var) — ONE hash
    aggregation over the data, k rows out — then a 1-row combine
    against the grand mean (declared single-partition; k is
    group-cardinality, never data-sized). This is the
    sufficient-statistics shape every moment-based test reduces to at
    100 TB: the data is touched exactly once, map-side partials
    combine associatively, and the F ratio is arithmetic on a k-row
    table. ss_* rounded to 4 (they are ~1e6-scale sums whose float
    association order differs across engines at the 1e-9 relative
    level the sweep's 6-decimal rounding would surface)."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("s2"),
        )
    )
    t = g.agg(
        F.sum("n").alias("n_total"),
        F.count(F.lit(1)).alias("k"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand_mean"),
    )
    j = g.crossJoin(F.broadcast(t))
    dm = F.col("m") - F.col("grand_mean")
    ssb = F.sum(F.col("n") * dm * dm)
    ssw = F.sum((F.col("n") - 1) * F.col("s2"))
    return j.groupBy("k", "n_total", "grand_mean").agg(
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(
            (ssb / (F.first("k") - 1))
            / (ssw / (F.first("n_total") - F.first("k"))),
            6,
        ).alias("f_stat"),
    ).select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_total").cast("long").alias("n_total"),
        "ss_between",
        "ss_within",
        "f_stat",
    )


@register(
    "stat_ttest_welch",
    oracle=f"""
    WITH g AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
               avg(value) AS m, var_samp(value) AS s2
        FROM events WHERE event_type IN ('{GROUP_A}', '{GROUP_B}')
        GROUP BY 1),
    w AS (
        SELECT
            max(CASE WHEN event_type = '{GROUP_A}' THEN n END) AS na,
            max(CASE WHEN event_type = '{GROUP_B}' THEN n END) AS nb,
            max(CASE WHEN event_type = '{GROUP_A}' THEN m END) AS ma,
            max(CASE WHEN event_type = '{GROUP_B}' THEN m END) AS mb,
            max(CASE WHEN event_type = '{GROUP_A}' THEN s2 END) / 
                max(CASE WHEN event_type = '{GROUP_A}' THEN n END) AS va,
            max(CASE WHEN event_type = '{GROUP_B}' THEN s2 END) /
                max(CASE WHEN event_type = '{GROUP_B}' THEN n END) AS vb
        FROM g)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ma - mb, 6) AS mean_diff,
           round((ma - mb) / sqrt(va + vb), 6) AS t_stat,
           round((va + vb) * (va + vb)
                 / (va * va / (na - 1) + vb * vb / (nb - 1)), 4) AS df_welch
    FROM w
    """,
)
def stat_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the click and purchase
    value populations — the two-sample mean test that does NOT assume
    pooled variance, with the Welch–Satterthwaite degrees of freedom.
    Same sufficient-statistics contract as stat_anova_oneway: one hash
    aggregation (2 rows out), then pure arithmetic in a 1-row combine.
    df rounded to 4, means/t to 6 (engine-order float association)."""
    g = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(GROUP_A, GROUP_B))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("s2"),
        )
    )
    pick = lambda col, grp: F.max(F.when(F.col("event_type") == grp, F.col(col)))  # noqa: E731
    w = g.agg(
        pick("n", GROUP_A).alias("na"),
        pick("n", GROUP_B).alias("nb"),
        pick("m", GROUP_A).alias("ma"),
        pick("m", GROUP_B).alias("mb"),
        (pick("s2", GROUP_A) / pick("n", GROUP_A)).alias("va"),
        (pick("s2", GROUP_B) / pick("n", GROUP_B)).alias("vb"),
    )
    va, vb = F.col("va"), F.col("vb")
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(va + vb), 6).alias(
            "t_stat"
        ),
        F.round(
            (va + vb) * (va + vb)
            / (va * va / (F.col("na") - 1) + vb * vb / (F.col("nb") - 1)),
            4,
        ).alias("df_welch"),
    )
