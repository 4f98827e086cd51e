"""Cross-engine output-type compatibility check (the r4 verdict's gate
hardening): the driver's value-hash is Arrow-type-sensitive, so a
DuckDB oracle emitting decimal128(38,0) (HUGEINT sums) against a Spark
bigint hashes differently even when every value is identical — that is
exactly how tpch_q12 shipped driver-red in round 4 while the repr-based
local sweep stayed green.

This module canonicalizes both sides' Arrow types into declared
equivalence classes and reports per-column mismatches:

  * integer widths are equivalent (int8..int64, signed/unsigned) —
    widening changes no hashed value;
  * float32 ≡ float64;
  * decimal(p, s) keys on SCALE only (precision growth under sum is
    engine-specific and value-preserving) but is NOT equivalent to
    integer or float — Decimal('3') reprs/hashes unlike 3 or 3.0;
  * string ≡ large_string, binary ≡ large_binary, date32 ≡ date64,
    timestamps collapse regardless of unit/tz (values are compared
    tz-normalized);
  * list/large_list compare element types recursively; struct compares
    field name→type maps recursively;
  * a null-typed column (DuckDB's type for all-NULL projections) is a
    wildcard.
"""

from __future__ import annotations

import pyarrow as pa


def canon_arrow_type(t: pa.DataType):
    """Collapse an Arrow type into its cross-engine equivalence class."""
    if pa.types.is_null(t):
        return "*"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return ("decimal", t.scale)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", canon_arrow_type(t.value_type))
    if pa.types.is_map(t):
        return ("map", canon_arrow_type(t.key_type), canon_arrow_type(t.item_type))
    if pa.types.is_struct(t):
        return (
            "struct",
            tuple(sorted((f.name, canon_arrow_type(f.type)) for f in t)),
        )
    return str(t)


def _compat(a, b) -> bool:
    if a == "*" or b == "*":
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0]:
        if a[0] == "list":
            return _compat(a[1], b[1])
        if a[0] == "map":
            return _compat(a[1], b[1]) and _compat(a[2], b[2])
        if a[0] == "struct":
            an, bn = dict(a[1]), dict(b[1])
            return an.keys() == bn.keys() and all(
                _compat(an[k], bn[k]) for k in an
            )
        return a == b
    return a == b


def arrow_type_mismatches(
    spark_schema: pa.Schema, duck_schema: pa.Schema
) -> list[str]:
    """Column-name-keyed type incompatibilities between two Arrow schemas.

    Returns [] when every shared column is hash-compatible. Column-set
    differences are the schema check's job, not this one's — only
    columns present on both sides are compared.
    """
    dt = {f.name: f.type for f in duck_schema}
    out = []
    for f in spark_schema:
        if f.name not in dt:
            continue
        a, b = canon_arrow_type(f.type), canon_arrow_type(dt[f.name])
        if not _compat(a, b):
            out.append(f"{f.name}: spark={f.type}({a}) duck={dt[f.name]}({b})")
    return out


def spark_arrow_schema(sdf) -> pa.Schema:
    """Arrow schema Spark would hand the driver for this DataFrame —
    derived from the logical plan (no job is run)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(sdf.schema)
