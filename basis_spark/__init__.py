"""basis_spark — a PySpark-native analytics engine with kvh/basis capabilities.

Spark-first re-expression of the reference's functional-reactive pipeline
model (SURVEY.md §1.2): DataBlocks → DataFrames, streams → Structured
Streaming / incremental high-watermark reads, nodes → DataFrame transforms.

The reference checkout at /root/reference is empty (SURVEY.md §0), so no
file:line citations into it are possible; the normative contract is
SURVEY.md §2 and the DuckDB oracle in __spark_entry__.py.
"""

__version__ = "0.1.0"
