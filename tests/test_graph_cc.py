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
