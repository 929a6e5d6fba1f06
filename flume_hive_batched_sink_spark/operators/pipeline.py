"""The flagship pipeline — the reference's spine as one declarative plan.

Reference job (HiveBatchedSink.scala): drain events (A1) → serde
parse body (A5, TextDeserializer.scala:44-68) → derive time-bucketed
partition value (A3/A4, HiveBatchedSink.scala:311-315) → per-category
5-minute window counts (A14/A15, TimedUtils.scala:44-137) →
completeness check `GROUP BY logdate HAVING count >= N`
(A17, HiveSinkDetailDao.scala:42-61).

Spark form: a single DataFrame expression — parse/route are codegen'd
column ops; the window count is a two-phase hash aggregate (Catalyst
emits the partial/final split the reference hand-rolled with local
maps + locks, TimedUtils.scala:78-111); HAVING is a post-agg filter.
At 100 TB the only shuffle is the one aggregation by
(logdate, event_type); parse/route stay in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partition import derive_logdate
from ..sources.parse import parse_column
from .registry import query, tbl

# DuckDB twin of functions.partition.bucket_ts/derive_logdate:
# naive epoch arithmetic (no TZ functions — see registry docstring).
SQL_BUCKET = "make_timestamp(((CAST(floor(epoch({ts})) AS BIGINT) // {secs}) * {secs}) * 1000000)"
SQL_LOGDATE = "strftime(" + SQL_BUCKET + ", '%Y%m%d%H%M')"


def sql_logdate(ts_expr: str, secs: int = 300) -> str:
    return SQL_LOGDATE.format(ts=ts_expr, secs=secs)


def flagship(spark: SparkSession, sf_dir: str, min_count: int = 2) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    parsed = events.withColumn(
        "parsed", parse_column("props", "json", "k int")
    )
    routed = parsed.withColumn("logdate", derive_logdate("ts", 300))
    counted = routed.groupBy("logdate", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("parsed.k").cast("long")).alias("sum_k"),
    )
    return counted.filter(F.col("n_events") >= min_count)


FLAGSHIP_ORACLE = f"""
SELECT logdate, event_type, n_events, sum_k FROM (
  SELECT {sql_logdate('CAST(ts AS TIMESTAMP)')} AS logdate,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)::BIGINT)
              AS BIGINT) AS sum_k
  FROM events
  GROUP BY 1, 2
) t
WHERE n_events >= 2
"""


@query("flagship_pipeline", FLAGSHIP_ORACLE)
def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship(spark, sf_dir)
