"""SparkSession factory.

Pins the settings every operator in this engine assumes:

- UTC session timezone (the reference rounds timestamps in a
  configurable TZ, HiveBatchedSink.scala:237-238; we pin UTC so the
  DuckDB oracle and Spark agree on every time bucket),
- AQE on (runtime re-plan: skew joins, partition coalescing — the
  100 TB path relies on it),
- Arrow on (Pandas-UDF fast path),
- shuffle partitions sized to the local core count rather than the
  200 default (on a real cluster this is set to ~2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flume_hive_batched_sink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # write µs timestamps, not deprecated INT96: INT96 reads back
        # as timestamp[ns] through pyarrow, tripping the catalog's
        # ns-column normalization on our own sink outputs
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
