"""etl_deltalake_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(``Facu6/ETL-DeltaLake``, surveyed in SURVEY.md), extended with the
relational table stakes the reference lacks (joins, group
aggregations, set ops, top-k) and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7):
 - lazy DataFrames end-to-end; every operator is a pure
   ``DataFrame -> DataFrame`` function;
 - declarative plans so Catalyst handles pushdown / pruning /
   join strategy; no hand-scheduling;
 - no row-at-a-time Python in hot paths — built-in column
   expressions first, Arrow-batched pandas UDFs as the escape hatch;
 - storage is columnar Parquet (Delta-on-Spark used when the
   ``delta-spark`` package is present; gated import, see
   ``sources.table_format``).
"""

from etl_deltalake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
