"""Transaction-log table format (mini-lakehouse) — SURVEY.md §2.M.

The storage pattern behind Delta Lake / Iceberg, reduced to its load-
bearing core: a table is (a) a set of immutable parquet data objects
and (b) an append-only, monotonically versioned commit log of add /
remove actions over those objects. Readers never list the data
directory — they replay the log to the requested version and scan
exactly the live objects, which is what makes snapshot isolation,
time travel, and O(1) "updates" (remove old object + add rewritten
object) possible on an object store with no rename semantics.

Scale posture (100 TB): the log is metadata — KBs per commit,
replayed driver-side in O(#commits) — while every data byte stays in
distributed parquet scans with normal pushdown/pruning. Production
formats add log checkpointing (fold actions ≤ N into one parquet
manifest) so replay stays O(1); that fold is a trivial extension of
`_live_objects` and is documented rather than simulated here. The
fixture table commits two versions: v0 writes the committed orders in
two objects (even / odd orderkey), v1 "repricing update" removes the
odd object and adds a rewritten one — so the latest snapshot, the
as-of-v0 snapshot, and the commit history are all independently
recomputable by the SQL oracles from the orders fixture.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register
from basis_spark.operators.scans import _sf_scratch

_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def _commit(table_dir: str, version: int, actions: list[dict]) -> None:
    """Append one commit to the log, atomically (temp + rename): a
    reader listing the log directory sees either the whole commit or
    nothing — the same all-or-nothing contract a real log store needs."""
    log_dir = os.path.join(table_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{version:08d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "actions": actions}, f)
    os.replace(tmp, final)


def _build_table(spark: SparkSession, sf_dir: str, subdir: str = "txn_log") -> str:
    """Materialize the two-commit fixture table once per session
    (appId-scoped scratch, exists-guarded on the LAST commit so a
    partially built table is never read as complete)."""
    table_dir = _sf_scratch(spark, subdir, sf_dir)
    if os.path.exists(os.path.join(table_dir, "log", "00000001.json")):
        return table_dir
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(*_COLS)
    )
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    even.write.mode("overwrite").parquet(os.path.join(table_dir, "files", "p0"))
    odd.write.mode("overwrite").parquet(os.path.join(table_dir, "files", "p1"))
    # v1: reprice the odd-key orders (x2 — exact in binary floating
    # point, so Spark and DuckDB agree bit-for-bit). An update in this
    # format is remove(old object) + add(rewritten object); p1's bytes
    # are never touched, which is exactly why v0 stays readable.
    odd.withColumn("o_totalprice", F.col("o_totalprice") * 2).write.mode(
        "overwrite"
    ).parquet(os.path.join(table_dir, "files", "p2"))
    _commit(table_dir, 0, [{"op": "add", "path": "files/p0"},
                           {"op": "add", "path": "files/p1"}])
    _commit(table_dir, 1, [{"op": "remove", "path": "files/p1"},
                           {"op": "add", "path": "files/p2"}])
    return table_dir


def _read_log(table_dir: str) -> list[dict]:
    log_dir = os.path.join(table_dir, "log")
    commits = []
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json"):
            with open(os.path.join(log_dir, name)) as f:
                commits.append(json.load(f))
    return commits


def _live_objects(table_dir: str, as_of: int | None = None) -> list[str]:
    """Replay the commit log to `as_of` (latest if None) and return the
    live data-object paths. O(#commits) driver-side metadata work —
    the checkpoint fold (manifest every N commits) slots in here."""
    live: list[str] = []
    for rec in _read_log(table_dir):
        if as_of is not None and rec["version"] > as_of:
            break
        for a in rec["actions"]:
            if a["op"] == "add":
                live.append(a["path"])
            elif a["op"] == "remove":
                live.remove(a["path"])
            else:
                raise ValueError(f"unknown log action {a['op']!r}")
    return [os.path.join(table_dir, p) for p in live]


def _snapshot(spark: SparkSession, sf_dir: str, as_of: int | None) -> DataFrame:
    table_dir = _build_table(spark, sf_dir)
    return spark.read.parquet(*_live_objects(table_dir, as_of)).select(*_COLS)


@register(
    "table_log_snapshot",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 1
    """,
)
def table_log_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Latest-version read: replay the log (v0 add p0,p1; v1 remove p1,
    # add repriced p2) and scan the live objects {p0, p2}. The oracle
    # recomputes the same snapshot from the orders fixture, so reading
    # a removed object (stale update) or missing one is a value/row
    # mismatch. Scans are plain distributed parquet reads — pushdown
    # and pruning apply exactly as on any parquet source.
    return _snapshot(spark, sf_dir, as_of=None)


@register(
    "table_log_time_travel",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def table_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of-v0 read over the SAME table the snapshot key reads: replay
    # stops before v1, so the scan hits {p0, p1} — the pre-update rows
    # — even though v1's repriced object already exists on disk.
    # Immutable objects + versioned log = time travel with zero data
    # copies, the property that makes reproducible training-data
    # snapshots cheap at 100 TB.
    return _snapshot(spark, sf_dir, as_of=0)


@register(
    "table_log_history",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT))
    ) AS t(version, n_added, n_removed)
    """,
)
def table_log_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Commit-history metadata view (DESCRIBE HISTORY shape): one row
    # per commit with add/remove counts, derived by the same log replay
    # readers use. Driver-side work is O(#commits) on KB-sized JSON —
    # metadata, never data — then handed to Spark as a (tiny) local
    # DataFrame.
    table_dir = _build_table(spark, sf_dir)
    rows = [
        (
            rec["version"],
            sum(1 for a in rec["actions"] if a["op"] == "add"),
            sum(1 for a in rec["actions"] if a["op"] == "remove"),
        )
        for rec in _read_log(table_dir)
    ]
    return spark.createDataFrame(
        rows, "version long, n_added long, n_removed long"
    )


def _merge_cow(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key: str,
    version: int,
) -> None:
    """Copy-on-write MERGE into a logged table: rewrite ONLY the live
    objects that contain matched keys (matched rows take the source's
    o_totalprice, unmatched target rows are carried over byte-for-
    byte), land unmatched source rows in one new insert object, and
    commit remove(rewritten olds) + add(rewrites, inserts) as a single
    atomic version. Objects with no matches are never touched — the
    property that makes MERGE affordable at 100 TB, where a day's
    updates hit a handful of partitions out of millions. The per-object
    match probe is one semi-join job per live object: a driver loop
    over METADATA-scale cardinality (#objects), never over rows."""
    live = _live_objects(table_dir)
    src_keys = source.select(key).distinct()
    actions: list[dict] = []
    matched_any = []
    for i, obj in enumerate(live):
        tgt = spark.read.parquet(obj)
        if tgt.join(src_keys, key, "left_semi").limit(1).count() == 0:
            continue  # untouched object stays live — no rewrite, no action
        rewritten = (
            tgt.join(
                source.select(key, F.col("o_totalprice").alias("_src_price")),
                key,
                "left",
            )
            .withColumn(
                "o_totalprice", F.coalesce("_src_price", "o_totalprice")
            )
            .drop("_src_price")
            .select(*_COLS)
        )
        new_rel = f"files/m{version}_{i}"
        rewritten.write.mode("overwrite").parquet(
            os.path.join(table_dir, new_rel)
        )
        rel_old = os.path.relpath(obj, table_dir)
        actions.append({"op": "remove", "path": rel_old})
        actions.append({"op": "add", "path": new_rel})
        matched_any.append(obj)
    inserts = source.join(
        spark.read.parquet(*live).select(key), key, "left_anti"
    ).select(*_COLS)
    ins_rel = f"files/m{version}_ins"
    inserts.write.mode("overwrite").parquet(os.path.join(table_dir, ins_rel))
    actions.append({"op": "add", "path": ins_rel})
    _commit(table_dir, version, actions)


@register(
    "table_log_merge_cow",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice + 100 AS o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 1
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'P'
    """,
)
def table_log_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MERGE INTO the logged table (its own appId-scoped copy, so the
    # snapshot/time-travel keys keep their pristine two-commit table):
    # source = even-key committed orders repriced +100 (updates — they
    # live only in object p0) plus every 'P'-status order (inserts).
    # COW rewrites p0 -> m2_0, leaves the odd-key object p2 untouched,
    # adds m2_ins, and commits all of it as version 2. The oracle
    # recomputes the post-merge snapshot from the orders fixture, so a
    # lost update, a double-applied update, or a clobbered untouched
    # object is a value mismatch. (+100 and *2 are exact in binary
    # doubles on both engines.)
    table_dir = _build_table(spark, sf_dir, subdir="txn_log_merge")
    if not os.path.exists(os.path.join(table_dir, "log", "00000002.json")):
        orders = load(spark, sf_dir, "orders")
        updates = (
            orders.filter(
                (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0)
            )
            .select(*_COLS)
            .withColumn("o_totalprice", F.col("o_totalprice") + 100)
        )
        inserts = orders.filter(F.col("o_orderstatus") == "P").select(*_COLS)
        _merge_cow(spark, table_dir, updates.unionByName(inserts),
                   "o_orderkey", version=2)
    return spark.read.parquet(*_live_objects(table_dir)).select(*_COLS)
