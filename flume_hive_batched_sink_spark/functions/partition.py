"""Time-bucket partition routing + partition-spec parsing.

Reference semantics:
  - `BucketPath.escapeString("%Y%m%d%H%M", headers, tz, round, unit,
    value)` derives the `logdate` partition value from each event's
    timestamp header with optional floor-rounding
    (HiveBatchedSink.scala:311-315, rounding config :258-271;
    CommonUtils.scala:35-40 converts round value+unit to millis).
  - `HiveUtils.getPartitionValue / getPartitionValues` parse
    `k1=v1/k2=v2` partition-spec strings (HiveUtils.scala:126-139).

Spark form: pure column expressions — JVM-side, codegen'd, no UDFs —
so the routing column costs nothing extra at 100 TB and partition
pruning on the derived column works for readers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_ts(
    ts: Column | str, round_seconds: int = 300, tz: str = "UTC"
) -> Column:
    """Floor an event-time column to `round_seconds` buckets.

    Exactly the reference's `floor(ts_millis / roundMillis) * roundMillis`
    (TimedUtils.scala:44-47) expressed over unix seconds. Returns a
    timestamp column (the bucket start).

    `tz`: the reference rounds AND formats logdate in a configurable
    timezone (HiveBatchedSink.scala:237-238, Config.scala:36-38) —
    an hour/day bucket boundary is a *local* wall-clock boundary.
    Non-UTC zones shift the instant by the zone's (DST-aware,
    per-row) offset before flooring, so e.g. an Asia/Shanghai daily
    bucket starts at 16:00 UTC. The returned bucket start is the
    shifted wall time; format it with `date_format` (session tz must
    be UTC, the engine default) to get the reference's local-time
    partition value.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    if tz and tz != "UTC":
        ts = F.from_utc_timestamp(ts, tz)
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds((secs - secs % round_seconds))


def derive_logdate(
    ts: Column | str,
    round_seconds: int = 300,
    fmt: str = "yyyyMMddHHmm",
    tz: str = "UTC",
) -> Column:
    """Routing column: bucket the timestamp (in `tz` wall time), format
    as the partition value string (reference partition spec
    `logdate=%Y%m%d%H%M`, README.md:28)."""
    return F.date_format(bucket_ts(ts, round_seconds, tz), fmt)


def partition_spec_value(spec: Column | str, key: str) -> Column:
    """Extract one key's value from a `k1=v1/k2=v2` partition spec
    (HiveUtils.scala:126-133)."""
    spec = F.col(spec) if isinstance(spec, str) else spec
    return F.regexp_extract(spec, rf"(?:^|/){key}=([^/]*)", 1)


def partition_spec_values(spec: Column | str) -> Column:
    """All values, in spec order, from a `k1=v1/k2=v2` string
    (HiveUtils.scala:135-139) — higher-order functions, no UDF."""
    spec = F.col(spec) if isinstance(spec, str) else spec
    return F.transform(
        F.split(spec, "/"), lambda p: F.element_at(F.split(p, "="), 2)
    )
