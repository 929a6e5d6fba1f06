"""The landing pipeline — the reference's entire job, Spark-native.

Reference flow per micro-batch (HiveBatchedSink.scala:296-358 +
close/finalize path :349-407 + leader epilogue :177-227):
  drain batch → serde parse → route to time partitions → ORC write →
  register partition → upsert bookkeeping (name, logdate, hostname,
  counts) → leader checks completeness → mark CHECKED → REST notify.

Spark form: ONE `foreachBatch` function. The micro-batch is
checkpoint-bounded (exactly-once for idempotent writes — this
structurally fixes the data-loss FIXME at HiveBatchedSink.scala:335,
commit-before-flush); dynamic partition append replaces the writer
pool + add_partition DDL; the bookkeeping upsert is a last-write-wins
merge; the completeness check is the driver-side epilogue (the driver
is always "leader" — ZK election collapses, SURVEY.md §3.4).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SinkConfig
from ..functions.partition import derive_logdate
from ..sources.parse import parse_column
from .stage import SCRATCH


def route_and_parse(df: DataFrame, cfg: SinkConfig) -> DataFrame:
    """parse (A5) + time-bucket route (A3/A4): pure column ops."""
    out = df
    if cfg.serde_name and "props" in df.columns:
        out = out.withColumn(
            "parsed",
            parse_column(
                "props", cfg.serde_name, cfg.serde_properties.get("schema", "k int")
            ),
        )
    return out.withColumn(
        cfg.partition_col,
        derive_logdate(
            "ts", cfg.round_seconds, cfg.partition_format, cfg.timezone
        ),
    )


def _apply_file_naming(data_path: str, cfg: SinkConfig) -> None:
    """Rename committed part files to `<prefix>part-...<suffix>`
    (Config.scala:25-27). Driver-side but bounded: one os.rename per
    newly committed file (file count per batch is bounded by
    `repartition(partition_col)` × maxRecordsPerFile). Idempotent —
    already-renamed files no longer match the `part-` pattern (or
    already carry the suffix) and are skipped, so append batches
    never double-rename."""
    if not cfg.file_name_prefix and not cfg.file_name_suffix:
        return
    for root, _dirs, files in os.walk(data_path):
        for name in files:
            if not name.startswith("part-") or name.endswith(".crc"):
                continue
            if cfg.file_name_suffix and name.endswith(cfg.file_name_suffix):
                continue
            new = f"{cfg.file_name_prefix}{name}{cfg.file_name_suffix}"
            os.rename(os.path.join(root, name), os.path.join(root, new))


def land_batch(
    batch_df: DataFrame,
    batch_id: int,
    cfg: SinkConfig,
    on_complete: Callable[[list[str]], None] | None = None,
) -> None:
    """One micro-batch landing (the foreachBatch body).

    1. route+parse, 2. partitioned columnar append (partition
    registration is implicit in the directory layout / would be
    `saveAsTable` against a real metastore), 3. bookkeeping upsert,
    4. completeness epilogue (A17/A18/A23/A24): logdates whose
    bucket-window has fully elapsed by this batch's max event time
    are 'CHECKED' and reported via the `on_complete` callback (the
    reference's REST POST, DTEUtils.scala:23-33).
    """
    spark = batch_df.sparkSession
    routed = route_and_parse(batch_df, cfg).persist()
    try:
        data_path = os.path.join(cfg.output_path, cfg.table)
        (
            routed.repartition(cfg.partition_col)
            .write.mode("append")
            .option("maxRecordsPerFile", cfg.max_records_per_file)
            .partitionBy(cfg.partition_col)
            .format(cfg.file_format)
            .save(data_path)
        )
        _apply_file_naming(data_path, cfg)

        # bookkeeping upsert (A20): per (logdate, host-bucket) counts
        book_path = os.path.join(cfg.output_path, f"{cfg.table}__bookkeeping")
        batch_counts = (
            routed.groupBy(cfg.partition_col)
            .agg(
                F.count("*").alias("sinkcount"),
                F.max("ts").alias("updatetime"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .withColumn("state", F.lit("NEW"))
        )
        batch_counts.write.mode("append").parquet(book_path)

        # completeness epilogue (A17/A24): partition final once the
        # batch watermark passes its window end (A11 semantics).
        max_ts = routed.agg(F.max("ts")).collect()[0][0]
        if max_ts is not None and on_complete is not None:
            finished = (
                routed.select(cfg.partition_col)
                .distinct()
                .withColumn(
                    # logdate is a LOCAL wall time (cfg.timezone);
                    # shift back to the true instant before comparing
                    # against the batch's max event time.
                    "window_end",
                    F.to_utc_timestamp(
                        F.to_timestamp(
                            F.col(cfg.partition_col), cfg.partition_format
                        ),
                        cfg.timezone,
                    )
                    + F.expr(f"INTERVAL {cfg.round_seconds} SECOND"),
                )
                .filter(F.col("window_end") <= F.lit(max_ts))
                .select(cfg.partition_col)
            )
            logdates = [r[0] for r in finished.collect()]
            if logdates:
                on_complete(sorted(logdates))
    finally:
        routed.unpersist()


def read_bookkeeping(spark: SparkSession, cfg: SinkConfig) -> DataFrame:
    """Current bookkeeping state: last-write-wins over batch appends
    (A20's upsert semantics reconstructed relationally)."""
    from pyspark.sql.window import Window as W

    book_path = os.path.join(cfg.output_path, f"{cfg.table}__bookkeeping")
    raw = spark.read.parquet(book_path)
    w = W.partitionBy(cfg.partition_col).orderBy(F.col("batch_id").desc())
    return (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def run_landing_stream(
    spark: SparkSession,
    staged_dir: str,
    schema,
    cfg: SinkConfig,
    on_complete: Callable[[list[str]], None] | None = None,
) -> None:
    """The full streaming job: file source (stand-in for the Flume
    channel) → foreachBatch(land_batch), AvailableNow one-shot."""
    shutil.rmtree(os.path.join(cfg.output_path, cfg.table), ignore_errors=True)
    shutil.rmtree(
        os.path.join(cfg.output_path, f"{cfg.table}__bookkeeping"),
        ignore_errors=True,
    )
    ckpt = os.path.join(SCRATCH, "checkpoints", f"land_{cfg.table}")
    shutil.rmtree(ckpt, ignore_errors=True)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
    )
    q = (
        src.writeStream.foreachBatch(
            lambda df, bid: land_batch(df, bid, cfg, on_complete)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
