"""Arrow output-type ratchet (SURVEY.md §5; r4 verdict item 2): the
driver's value-hash is type-tagged, so every oracle's DuckDB Arrow
schema must be hash-compatible with Spark's Arrow output schema. The
round-4 failure mode this pins down: DuckDB's sum() over INTEGER
returns HUGEINT → decimal128(38,0), while Spark returns bigint —
identical values, different hash. tpch_q12 shipped driver-red exactly
this way; the fix is CAST(... AS BIGINT) in the oracle, and this test
fails the build if that cast (or any future oracle's) goes missing.

Spark side is derived from the logical plan only (no job runs), DuckDB
executes at sf0.01 — the whole sweep is ~1 min, cheap enough for every
pytest run.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from basis_spark.typecheck import arrow_type_mismatches, spark_arrow_schema
from tests.conftest import SF_ORACLE

_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("key", _KEYS)
def test_oracle_output_types_compatible(spark, duck, key):
    sdf = entrymod.queries()[key](spark, SF_ORACLE)
    duck_schema = (
        duck.execute(entrymod.oracle_sql()[key]).fetch_arrow_table().schema
    )
    bad = arrow_type_mismatches(spark_arrow_schema(sdf), duck_schema)
    assert not bad, f"[{key}] driver-hash-incompatible output types: {bad}"


def test_detects_uncast_hugeint(spark, duck):
    """The un-CASTed q12 oracle (the exact r4 driver-red) must be
    flagged: DuckDB sum(CASE...) → decimal128(38,0) vs Spark bigint."""
    sdf = entrymod.queries()["tpch_q12"](spark, SF_ORACLE)
    uncast = """
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > 90 THEN 'LATE'
                WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > 30 THEN 'SLOW'
                ELSE 'FAST' END AS lateness,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY 1
    """
    duck_schema = duck.execute(uncast).fetch_arrow_table().schema
    bad = arrow_type_mismatches(spark_arrow_schema(sdf), duck_schema)
    assert len(bad) == 2, f"expected both HUGEINT counts flagged, got {bad}"


def test_int_width_and_float_width_are_equivalent():
    import pyarrow as pa

    from basis_spark.typecheck import canon_arrow_type

    assert canon_arrow_type(pa.int32()) == canon_arrow_type(pa.int64())
    assert canon_arrow_type(pa.float32()) == canon_arrow_type(pa.float64())
    assert canon_arrow_type(pa.decimal128(38, 0)) != canon_arrow_type(pa.int64())
    assert canon_arrow_type(pa.decimal128(38, 2)) != canon_arrow_type(
        pa.float64()
    )
    # precision growth under sum is value-preserving; scale is not
    assert canon_arrow_type(pa.decimal128(22, 2)) == canon_arrow_type(
        pa.decimal128(38, 2)
    )
    assert canon_arrow_type(pa.decimal128(38, 2)) != canon_arrow_type(
        pa.decimal128(38, 4)
    )
