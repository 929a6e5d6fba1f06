"""B5 — analytic window functions ([CAT]; absent in the reference
except A20's row_number-backed upsert).

Determinism: every ORDER BY carries a unique-key tiebreaker so
row_number/limit boundaries agree with the oracle; the running sum
accumulates in exact decimal because Spark (incremental) and DuckDB
(segment tree) would otherwise add doubles in different orders.

Scale: all windows here shuffle once on their partition key. None
partitions by a constant (a global window = single-task bottleneck)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import dsum, query, sql_dsum, tbl


@query(
    "win_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_dense_rank
    FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
    )


@query(
    "win_row_number",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@query(
    "win_lag_lead",
    """
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event delta per user (A14's "last update" tracking
    generalized)."""
    ev = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "win_running_frame",
    """
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame; decimal accumulator
    (see module docstring)."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. At scale this is the window top-k
    pattern: rank shuffles once by customer; AQE handles skewed
    customers. (A global sort would be wrong here.)"""
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "win_percent_rank",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(c_acctbal, 2) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_highest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows: percent_rank ((rank-1)/(n-1)),
    cume_dist, and nth_value over the FULL partition frame (the
    default running frame would make nth_value order-dependent).
    Both engines compute the two ratios as one double division of
    identical integers — bit-exact. One shuffle on c_mktsegment.

    Scale note (r8, measured): this shares win_ntile_dist's
    5-value-partition sort shape, and the shared
    `analytics.two_level_rank` decomposition (DESC path) removes the
    ceiling — but on the 30×-smaller customer table the
    decomposition's fixed cost (min/max probe + count pass + offset
    broadcast) dominates: two-level measured 1.20 s @1× / 2.04 s
    @100× vs the builtin's 0.17 s / 0.81 s. The builtin window is
    the cheaper plan at every measured scale, so the decomposition
    is DEFERRED here (the r7 verdict's apply-or-defer); it remains
    one `two_level_rank(..., ascending=False)` call away — the DESC
    path stays builtin-equivalence-tested on adversarial shapes in
    tests/test_properties.py::
    test_distributed_percent_rank_matches_builtin."""
    c = tbl(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_acctbal", 2).over(wfull).alias("second_highest"),
    )


@query(
    "ts_resample_ohlc",
    f"""
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT) // 300 * 300 AS bucket,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           COUNT(*) AS n,
           {sql_dsum("value", "vol")}
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to 5-minute OHLC bars per event_type — the
    hypertable/candlestick rollup every metrics store needs. ONE hash
    aggregate: open/close are `min_by`/`max_by` with a (ts, event_id)
    struct key (deterministic under ties), high/low/count/volume are
    plain aggregates — all map-side combinable, one shuffle on
    (event_type, bucket). No window pass: a sort-based first/last
    would shuffle the same data twice. Buckets are naive epoch
    arithmetic (oracle-exact, see registry docstring)."""
    ev = tbl(spark, sf_dir, "events")
    tie = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            (F.floor(F.col("ts").cast("long") / 300).cast("bigint") * 300)
            .alias("bucket"),
        )
        .agg(
            F.min_by("value", tie).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tie).alias("close"),
            F.count("*").alias("n"),
            dsum("value", "vol"),
        )
    )


@query(
    "ts_gapfill",
    f"""
    WITH daily AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_num,
             COUNT(*) AS n,
             {sql_dsum("value", "day_sum")}
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day_num) AS d0, MAX(day_num) AS d1
      FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id, UNNEST(range(d0, d1 + 1)) AS day_num FROM span
    )
    SELECT s.user_id, s.day_num,
           COALESCE(d.n, 0) AS n_events,
           LAST_VALUE(d.day_sum IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day_num
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day_num = d.day_num
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill: per-user daily rollup,
    missing days materialized from a `sequence()` spine, last
    observed daily sum carried forward with `last(ignorenulls)`.
    The standard telemetry/feature-store densification the reference
    could not express (it only landed raw rows; SURVEY §2 Part A has
    no analytics).

    Scale: the spine explode is per-user (bounded by the date span,
    not the row count) and stays partitioned by user_id; the daily
    aggregate, the spine join, and the fill window all share that one
    key, so Catalyst plans a single shuffle reused across all three.
    No driver-side calendar generation — the spine is distributed.
    Days are epoch-day bigints (naive UTC arithmetic, oracle-exact)."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).cast("bigint").alias("day_num"),
    ).agg(F.count("*").alias("n"), dsum("value", "day_sum"))
    span = daily.groupBy("user_id").agg(
        F.min("day_num").alias("d0"), F.max("day_num").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day_num")
    )
    fill = W.partitionBy("user_id").orderBy("day_num").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        spine.join(daily, ["user_id", "day_num"], "left")
        .select(
            "user_id",
            "day_num",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("day_sum", ignorenulls=True).over(fill).alias("filled_sum"),
        )
    )


@query(
    "win_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS dn
      FROM events
    ),
    isl AS (
      SELECT user_id, dn,
             dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn)
               AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user (the retention metric every activity pipeline computes).
    Day numbers are ints (days since a fixed epoch — identical
    integer arithmetic in both engines); the island anchor is
    `day - row_number()`, constant within a run of consecutive days.
    Scale shape: ONE Exchange for the whole chain (plan-asserted in
    PLANCHECK.json). The explicit repartition("user_id") ahead of the
    distinct is what makes that true: hash(user_id) satisfies the
    clustered-distribution requirement of the (user_id, dn) dedup
    aggregate (partitioning keys ⊆ grouping keys), of the user_id
    window, and of both downstream aggregates — without it, Spark
    shuffles once on (user_id, dn) for the distinct and AGAIN on
    user_id for the window (measured: 2 Exchanges → 1)."""
    e = tbl(spark, sf_dir, "events")
    return streaks_from_activity(
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("bigint")
            .alias("dn"),
        )
    )


def streaks_from_activity(activity: DataFrame) -> DataFrame:
    """The streak chain proper over (user_id, dn) activity rows —
    factored out so the hypothesis contract
    (tests/test_hypothesis.py::test_streaks_match_python_reference)
    exercises THIS code, not a copy."""
    days = activity.repartition("user_id").distinct()
    w = W.partitionBy("user_id").orderBy("dn")
    isl = days.withColumn("anchor", F.col("dn") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


@query(
    "ts_window_funnel",
    """
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT user_id, MIN(ts) AS t1
      FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    s12 AS (
      SELECT s1.user_id, s1.t1, s2.t2
      FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM ev e JOIN s12 ON e.user_id = s12.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s12.t2 AND e.ts <= s12.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     WHEN s1.t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_level
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
)
def ts_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (the product-analytics windowFunnel):
    per user, the earliest strictly-ordered view -> click -> purchase
    chain where every later step lands within 7 days of the first
    step. Output: per-user step timestamps + funnel level 0-3.

    The reference's counter pipeline (TimedUtils.scala:70-112) counts
    per-category volumes; the funnel is the sequenced version of that
    question and has no single Spark primitive, so it is composed as
    k-1 keyed min-aggregate + join rounds (k = 3 steps). Scale shape:
    the scan is filtered to step events (pushed predicate), every
    aggregate and join is keyed on user_id, and each aggregated side
    is at most one row per user, so AQE broadcasts the step frames as
    they shrink; nothing is ever ordered globally and no per-user
    event array is materialized (the collect_list alternative would
    put a whole user's history in one row). Step-k latency columns
    stay NULL-propagating so level is derivable without a second
    pass."""
    ev = tbl(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    steps = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    s1 = (
        steps.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr("INTERVAL 7 DAYS")
    s2 = (
        steps.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s12 = s1.join(s2, "user_id")
    s3 = (
        steps.filter(F.col("event_type") == "purchase")
        .join(s12, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            F.when(F.col("t3").isNotNull(), F.lit(3))
            .when(F.col("t2").isNotNull(), F.lit(2))
            .when(F.col("t1").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("funnel_level"),
        )
    )


@query(
    "ts_retention_cohort",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS dn
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(dn) AS cohort_dn FROM days GROUP BY user_id
    )
    SELECT f.cohort_dn, d.dn - f.cohort_dn AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM days d JOIN firsts f ON d.user_id = f.user_id
    GROUP BY f.cohort_dn, d.dn - f.cohort_dn
    """,
)
def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users cohorted by first-active day,
    counted per (cohort day, day offset) — the retention matrix every
    activity warehouse derives from its event stream (the per-logdate
    bookkeeping of HiveSinkDetailDao.scala:44-49 keyed by first-seen
    instead of event date). Day numbers are integers since a fixed
    epoch (identical arithmetic in both engines, same convention as
    win_streaks).

    Scale shape: one repartition("user_id") up front makes the
    (user_id, dn) distinct, the per-user min, and the activity<->
    firsts join all consume the SAME Exchange (partitioning keys are
    a subset of every downstream key set); the firsts side is one row
    per user so AQE broadcasts it. The final (cohort_dn, offset)
    aggregate is the only second shuffle, and its cardinality is
    O(active_days^2 / 2) — bounded by the calendar, not the data."""
    e = tbl(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("bigint")
            .alias("dn"),
        )
        .repartition("user_id")
        .distinct()
    )
    firsts = days.groupBy("user_id").agg(F.min("dn").alias("cohort_dn"))
    return (
        days.join(firsts, "user_id")
        .groupBy(
            "cohort_dn",
            (F.col("dn") - F.col("cohort_dn")).alias("offset_days"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


@query(
    "ts_cumulative_uniques",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS dn
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(dn) AS first_dn FROM days GROUP BY user_id
    ),
    active AS (
      SELECT dn, CAST(COUNT(*) AS BIGINT) AS active_users
      FROM days GROUP BY dn
    ),
    news AS (
      SELECT first_dn AS dn, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_dn
    )
    SELECT a.dn, COALESCE(n.new_users, 0) AS new_users,
           a.active_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                  OVER (ORDER BY a.dn) AS BIGINT) AS cum_uniques
    FROM active a LEFT JOIN news n ON a.dn = n.dn
    """,
)
def ts_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-uniques growth curve: per day, the active user
    count, the NEW user count (first-ever-seen that day), and the
    running total of distinct users to date — the growth metric that
    naively needs count(distinct) over an ever-growing prefix and is
    here decomposed into first-seen attribution + a running sum
    (each user counted exactly once, on their first day).

    Scale shape: the user_id repartition is shared by the
    (user_id, dn) distinct and the per-user min (same single-Exchange
    chain as ts_retention_cohort); the per-day rollups are calendar-
    bounded aggregates, and the only unpartitioned window runs over
    one row per DAY — O(calendar), not O(users) — so the global
    ordering is trivially small at any corpus size."""
    e = tbl(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("bigint")
            .alias("dn"),
        )
        .repartition("user_id")
        .distinct()
    )
    firsts = days.groupBy("user_id").agg(F.min("dn").alias("first_dn"))
    active = days.groupBy("dn").agg(
        F.count("*").cast("bigint").alias("active_users")
    )
    news = firsts.groupBy(F.col("first_dn").alias("dn")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = W.orderBy("dn").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        active.join(news, "dn", "left")
        .withColumn(
            "new_users", F.coalesce(F.col("new_users"), F.lit(0)).cast("bigint")
        )
        .select(
            "dn",
            "new_users",
            "active_users",
            F.sum("new_users").over(w).cast("bigint").alias("cum_uniques"),
        )
    )


@query(
    "ts_seasonality_profile",
    """
    WITH e AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) % 7
               AS dow,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod
      FROM events
    ),
    cell AS (
      SELECT dow, hod, COUNT(*) AS n_events FROM e GROUP BY dow, hod
    ),
    tot AS (SELECT SUM(n_events) AS total FROM cell)
    SELECT c.dow, c.hod, CAST(c.n_events AS BIGINT) AS n_events,
           CAST(c.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
    FROM cell c, tot t
    """,
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-seasonality heatmap: event volume and share per
    (day-of-week, hour-of-day) cell — the load profile used to pick
    maintenance windows and to seed the time-bucket routing the
    reference performs (A3/A4's %Y%m%d%H%M escapes). Day-of-week is
    integer day-number arithmetic modulo 7 from a fixed Monday epoch
    (2024-01-01), NOT an engine dayname() — locale- and
    week-origin-proof across engines.

    Scale shape: one map-side-combined hash aggregate onto at most
    168 cells, a broadcast 1-row total, and one exact-integer double
    division per cell; the aggregate output is calendar-bounded so
    the plan is identical at any corpus size."""
    e = tbl(spark, sf_dir, "events")
    cells = e.select(
        (
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("bigint")
            % 7
        ).alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).groupBy("dow", "hod").agg(F.count("*").alias("n_events"))
    total = cells.agg(F.sum("n_events").cast("double").alias("total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hod",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("n_events").cast("double") / F.col("total")).alias("share"),
    )
