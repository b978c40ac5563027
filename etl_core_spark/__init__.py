"""etl_core_spark — a PySpark-native analytics engine.

A ground-up re-implementation of the query / data-processing
capabilities of ``bidiac-de/etl-core`` (JSON-config-driven ETL DAGs:
sources → transforms → sinks) on Apache Spark.

Design (see SURVEY.md §7):

- One data abstraction: ``pyspark.sql.DataFrame`` with real nested
  ``StructType`` columns — the reference's row/bulk/bigdata strategy
  triplication collapses into a single declarative plan that Catalyst
  optimizes and Tungsten executes.
- Components become *plan-builder nodes*: pure functions
  ``Dict[in_port, DataFrame] -> Dict[out_port, DataFrame]``.
- Config-driven rule trees / mapping rules / join plans compile to
  ``pyspark.sql.Column`` expressions (JVM-side, whole-stage codegen) —
  never row-at-a-time Python.
- Sinks are the only actions; everything upstream stays lazy so
  predicate pushdown / column pruning / AQE apply end-to-end.
"""

from etl_core_spark.session import get_spark, stop_spark
from etl_core_spark.schema import DataType, FieldDef, Schema

# import for registry side effects: every operator and source/sink
# registers itself, so get_operator() works from any entry point
from etl_core_spark import operators as _operators  # noqa: F401,E402
from etl_core_spark import sources as _sources  # noqa: F401,E402

__all__ = ["get_spark", "stop_spark", "DataType", "FieldDef", "Schema"]

__version__ = "0.1.0"
