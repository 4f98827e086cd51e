"""Unit tests for the large-star/small-star connected-components loop
behind dedup_cluster_cc (SURVEY.md §2.M): the oracle test covers the
fixture graph, these pin the algorithm on adversarial shapes the fixture
doesn't contain — a long path (worst case for naive label propagation)
and disjoint components."""

from __future__ import annotations

from pyspark.sql import functions as F

from basis_spark.operators.llm import _large_star, _small_star


def _converge(spark, edge_rows, max_rounds=16):
    edges = spark.createDataFrame(edge_rows, "u: long, v: long")
    prev = None
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        chk = edges.agg(
            F.count(F.lit(1)).alias("c"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).first()
        cur = (chk["c"], chk["h"])
        if cur == prev:
            return edges
        prev = cur
    raise AssertionError("did not converge")


def test_cc_path_graph(spark):
    # 0-1-2-...-63 chain: diameter 63, but star iterations need O(log n)
    # rounds. Every node must label to 0.
    edges = _converge(spark, [(i, i + 1) for i in range(63)])
    labels = {r["u"]: r["v"] for r in edges.collect()}
    assert labels == {i: 0 for i in range(1, 64)}


def test_cc_disjoint_components(spark):
    # Two triangles + an isolated edge; roots are the component minima.
    rows = [(10, 11), (11, 12), (10, 12), (20, 21), (21, 22), (30, 31)]
    edges = _converge(spark, rows)
    labels = {r["u"]: r["v"] for r in edges.collect()}
    assert labels == {11: 10, 12: 10, 21: 20, 22: 20, 31: 30}


# ---------------------------------------------------------------------
# Degree-ordered triangle counting (node-iterator++): correctness on
# known shapes + the power-law hub property the r4 verdict asked for —
# a 10^3-degree hub must NOT become a wedge center (with naive u < v
# orientation it would emit C(1000, 2) ≈ 5·10^5 wedges; degree ordering
# caps the oriented out-degree at O(sqrt(|E|))).
from basis_spark.operators.joins import degree_oriented_edges, triangles_per_node


def test_triangles_known_graph(spark):
    # Two triangles sharing edge (1,2), plus a dangling edge.
    rows = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (5, 6)]
    e = spark.createDataFrame(rows, "u: long, v: long")
    got = {r["node"]: r["n_tri"] for r in triangles_per_node(e).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangles_star_has_none(spark):
    e = spark.createDataFrame([(0, i) for i in range(1, 50)], "u: long, v: long")
    assert triangles_per_node(e).count() == 0


def test_hub_graph_counts_and_bounded_fanout(spark):
    # Hub 0 joined to leaves 1..1000; consecutive leaves also joined, so
    # triangles are exactly (0, i, i+1) for i in 1..999: hub closes 999
    # triangles, each leaf is in 1 or 2.
    hub_edges = [(0, i) for i in range(1, 1001)]
    leaf_edges = [(i, i + 1) for i in range(1, 1000)]
    e = spark.createDataFrame(hub_edges + leaf_edges, "u: long, v: long")

    got = {r["node"]: r["n_tri"] for r in triangles_per_node(e).collect()}
    assert got[0] == 999
    assert got[1] == 1 and got[1000] == 1
    assert all(got[i] == 2 for i in range(2, 1000))

    # The scale property: the hub's oriented out-degree must be 0 (all
    # its edges point INTO it — every leaf has lower degree), and no
    # vertex's wedge fan-out may approach the hub degree.
    fan = {
        r["src"]: r["c"]
        for r in degree_oriented_edges(e)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert 0 not in fan, "hub must emit no wedges under degree ordering"
    assert max(fan.values()) <= 3, f"fan-out should be leaf-sized, got {max(fan.values())}"


def test_kcore_peel_depth_within_oracle_unroll(spark):
    """graph_kcore's DuckDB oracle unrolls a FIXED number of peeling
    rounds; that is sound only while the Spark fixpoint converges
    within the unroll. Pin the actual depth at the oracle SF with
    headroom, so a fixture change that deepens the peel fails HERE
    with a message, not as an opaque value mismatch in the sweep."""
    from basis_spark.operators.joins import (
        _KCORE_K,
        _KCORE_ORACLE_ROUNDS,
        proximity_edges,
    )
    from tests.conftest import SF_ORACLE

    cur = proximity_edges(spark, SF_ORACLE)
    n_edges = cur.count()
    rounds = 0
    while n_edges:
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        keep = deg.filter(F.col("c") >= _KCORE_K).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        rounds += 1
        cur, n_edges = nxt, n_next
    assert rounds + 2 <= _KCORE_ORACLE_ROUNDS, (
        f"peel depth {rounds} leaves <2 rounds of headroom under the "
        f"{_KCORE_ORACLE_ROUNDS}-round oracle unroll — raise the unroll"
    )


def test_kcore_every_survivor_has_core_degree_ge_k(spark):
    """Definitional invariant at the fixpoint, on a synthetic graph
    with a known answer: a 5-clique with a pendant path attached. The
    3-core is exactly the clique; path nodes peel off."""
    from basis_spark.operators import joins as J

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    path = [(4, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(clique + path, "u: long, v: long")
    cur, n_edges = e, e.count()
    for _ in range(32):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        keep = deg.filter(F.col("c") >= J._KCORE_K).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
    got = {
        r["node"]: r["c"]
        for r in cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(c >= J._KCORE_K for c in got.values())
