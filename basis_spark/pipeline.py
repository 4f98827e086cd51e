"""Functional-reactive pipeline layer (SURVEY.md §1.1/§3.1, M3).

The reference's model, re-expressed on Spark:

- DataBlock (immutable record set + schema)  → DataFrame.
- Node (python fn / SQL template over inputs) → Node wrapping a
  DataFrame→DataFrame transform or a SQL string over named inputs.
- Graph + Environment.produce(node)          → Graph.produce(name):
  topological resolution of upstream nodes, each materialized lazily —
  the "DAG execution" is Catalyst's logical plan; we never collect.
- Incremental consumption (metadata DB high-watermark) →
  HighWatermarkState over a monotone column, persisted as JSON.
- accumulator / dedupe_keep_latest            → accumulate(),
  dedupe_keep_latest() below (same semantics as the §2.J operator keys).

No scheduler, no threads: Spark's lazy DAG already gives the
functional-reactive contract (recompute = re-evaluate the plan over new
inputs; blocks processed at most once via the watermark predicate).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class Node:
    name: str
    fn: Callable[..., DataFrame] | None = None
    sql: str | None = None
    inputs: list[str] = field(default_factory=list)


class Graph:
    """A tiny declarative node graph: python nodes and SQL-template nodes."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._nodes: dict[str, Node] = {}

    def node(self, name: str, inputs: list[str] | None = None):
        """Decorator: register a python node fn(*upstream_dfs) -> DataFrame."""

        def deco(fn: Callable[..., DataFrame]):
            self._nodes[name] = Node(name=name, fn=fn, inputs=inputs or [])
            return fn

        return deco

    def source(self, name: str, df: DataFrame) -> None:
        self._nodes[name] = Node(name=name, fn=lambda: df, inputs=[])

    def sql_node(self, name: str, sql: str, inputs: list[str]) -> None:
        """SQL node: inputs are registered as temp views named after nodes."""
        self._nodes[name] = Node(name=name, sql=sql, inputs=inputs)

    @classmethod
    def from_yaml(
        cls,
        spark: SparkSession,
        text: str,
        sources: dict[str, DataFrame] | None = None,
    ) -> "Graph":
        """Build a graph from a YAML spec (the reference's graph.yml shape):

        nodes:
          - name: big_orders
            sql: SELECT * FROM orders WHERE o_totalprice > 100
            inputs: [orders]

        Python nodes are code, so YAML carries only SQL nodes; DataFrame
        sources (fixture tables, upstream graphs) are passed in `sources`
        and become named source nodes.
        """
        import yaml

        spec = yaml.safe_load(text)
        g = cls(spark)
        for name, df in (sources or {}).items():
            g.source(name, df)
        for nd in spec.get("nodes", []):
            g.sql_node(nd["name"], nd["sql"], list(nd.get("inputs", [])))
        return g

    def produce(self, name: str, _seen: set[str] | None = None) -> DataFrame:
        """Resolve upstream nodes (topologically) and return the node's
        DataFrame. Lazy: nothing materializes until an action runs."""
        seen = _seen if _seen is not None else set()
        if name in seen:
            raise ValueError(f"cycle detected at node {name!r}")
        seen.add(name)
        node = self._nodes[name]
        ups = [self.produce(u, seen) for u in node.inputs]
        if node.sql is not None:
            for uname, udf_ in zip(node.inputs, ups):
                udf_.createOrReplaceTempView(uname)
            return self.spark.sql(node.sql)
        return node.fn(*ups)


    def materialize(self, name: str, base_dir: str) -> dict:
        """Produce a node and persist its output as an immutable block
        (the reference's Environment.produce + BlockLog/FunctionLog):
        writes `base_dir/<node>/block=<n>/` parquet — blocks are
        append-only, a re-run adds block=n+1, never mutates — plus a
        run-log line in `base_dir/<node>/log.jsonl` (node, block, rows,
        wall seconds, ISO timestamp). Returns the log entry."""
        import datetime
        import glob
        import json
        import time

        out_dir = os.path.join(base_dir, name)
        block_n = len(glob.glob(os.path.join(out_dir, "block=*")))
        block_dir = os.path.join(out_dir, f"block={block_n}")
        t0 = time.time()
        df = self.produce(name)
        df.write.mode("errorifexists").parquet(block_dir)
        rows = self.spark.read.parquet(block_dir).count()
        entry = {
            "node": name,
            "block": block_n,
            "rows": rows,
            "wall_s": round(time.time() - t0, 3),
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "log.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
        return entry


def accumulate(*increments: DataFrame) -> DataFrame:
    """basis accumulator: fold append-only increments into one table."""
    out = increments[0]
    for inc in increments[1:]:
        out = out.unionByName(inc)
    return out


def dedupe_keep_latest(
    df: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """One row per key, latest (by order_cols desc) wins."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


class HighWatermarkState:
    """Persisted monotone-column watermark — the reference's incremental
    block-pruning, as a predicate that parquet scans push down."""

    def __init__(self, path: str, column: str):
        self.path = path
        self.column = column

    def read(self) -> int | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)["watermark"]

    def filter_new(self, df: DataFrame) -> DataFrame:
        wm = self.read()
        return df if wm is None else df.filter(F.col(self.column) > wm)

    def advance(self, df: DataFrame) -> int | None:
        new_wm = df.agg(F.max(self.column).alias("m")).collect()[0]["m"]
        if new_wm is None:
            return self.read()
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"watermark": int(new_wm), "column": self.column}, f)
        return new_wm
