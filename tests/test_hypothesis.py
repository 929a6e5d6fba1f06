"""Hypothesis property tests (SURVEY §5.4) for the routing/parsing
functions — the reference behaviors with crisp algebraic contracts
(BucketPath rounding, HiveUtils spec parsing).

Pattern: hypothesis generates a BATCH of inputs per example and ONE
Spark pass evaluates the whole batch against an independent Python
reference — a handful of examples each covering hundreds of random
rows, instead of a Spark round-trip per generated value.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flume_hive_batched_sink_spark.functions.partition import (
    bucket_ts,
    derive_logdate,
    partition_spec_value,
    partition_spec_values,
)

# epoch range well inside both engines' timestamp domains (1971-2033)
_EPOCHS = st.integers(min_value=31_536_000, max_value=2_000_000_000)
_ROUNDS = st.sampled_from([60, 300, 900, 3600, 86400])

SETTINGS = dict(max_examples=5, deadline=None)


@given(epochs=st.lists(_EPOCHS, min_size=1, max_size=200), rnd=_ROUNDS)
@settings(**SETTINGS)
def test_bucket_floor_property(spark, epochs, rnd):
    """bucket = floor(epoch / round) * round, for ANY epoch and round
    (TimedUtils.scala:44-47 semantics); logdate is its %Y%m%d%H%M
    rendering in UTC."""
    df = spark.createDataFrame([(e,) for e in epochs], "epoch long")
    # compare epochs, not collected datetimes: collect() renders
    # timestamps in the PYTHON process's local timezone, so a
    # datetime-based check would only pass on TZ=UTC hosts
    rows = (
        df.select(
            "epoch",
            F.unix_timestamp(
                bucket_ts(F.timestamp_seconds("epoch"), rnd)
            ).alias("b_epoch"),
            derive_logdate(F.timestamp_seconds("epoch"), rnd).alias("ld"),
        )
        .collect()
    )
    for r in rows:
        want = r.epoch - r.epoch % rnd
        assert r.b_epoch == want, (r.epoch, rnd)
        want_ld = datetime.datetime.fromtimestamp(
            want, tz=datetime.timezone.utc
        ).strftime("%Y%m%d%H%M")
        assert r.ld == want_ld, (r.epoch, rnd)


_KEYS = st.sampled_from(["logdate", "loghour", "region", "k", "part_a"])
_VALS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_.", min_size=0, max_size=12
)


@given(
    specs=st.lists(
        st.dictionaries(_KEYS, _VALS, min_size=1, max_size=4),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_partition_spec_roundtrip(spark, specs):
    """Building `k1=v1/k2=v2` then parsing must return the original
    values — for any key subset and any value (incl. empty strings),
    HiveUtils.scala:126-139 semantics."""
    rows = [("/".join(f"{k}={v}" for k, v in d.items()), d) for d in specs]
    df = spark.createDataFrame(
        [(s,) for s, _ in rows], "spec string"
    ).select(
        "spec",
        partition_spec_values("spec").alias("vals"),
        *[
            partition_spec_value("spec", k).alias(f"v_{k}")
            for k in ["logdate", "loghour", "region", "k", "part_a"]
        ],
    )
    got = df.collect()
    for r, (_, d) in zip(got, rows):
        assert list(r.vals) == list(d.values()), (r.spec, d)
        for k, v in d.items():
            assert getattr(r, f"v_{k}") == v, (r.spec, k)
        for k in set(["logdate", "loghour", "region", "k", "part_a"]) - set(d):
            assert getattr(r, f"v_{k}") == "", (r.spec, k)
