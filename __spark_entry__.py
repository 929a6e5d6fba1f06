"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (the reference pipeline:
parse → time-bucket route → windowed category counts → HAVING) on
sf0.001. `queries()` / `oracle_sql()` expose every implemented
operator from SURVEY.md §2 Part B; the driver compares each against
DuckDB at sf0.01 (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flume_hive_batched_sink_spark import operators as _ops
from flume_hive_batched_sink_spark.operators.pipeline import flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B."""
    return dict(_ops.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; names absent here
    (minhash/simhash/ann/streaming smokes) get rows-only checks."""
    return dict(_ops.ORACLE)
