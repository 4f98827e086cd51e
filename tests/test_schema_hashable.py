"""Every oracle-checked query must emit only scalar-typed columns.

The driver's correctness gate canonicalizes result rows in pandas; an
array/map/struct cell is unhashable there and crashes the whole check
(CORRECTNESS_r01: agg_collect_sorted, TypeError unhashable type 'list').
This audit catches any future operator that re-introduces a complex-typed
output column before the external gate does.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("key", _KEYS)
def test_no_complex_output_columns(spark, key):
    df = entrymod.queries()[key](spark, SF_SMALL)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{key}: complex-typed output columns {bad} would crash the driver's "
        "pandas canonicalizer — serialize them (array_join / to_json) instead"
    )
