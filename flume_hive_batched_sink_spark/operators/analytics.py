"""Extended analytics surface — statistics, percentiles, pivot,
lateral explode, distribution windows, sampling, collect aggregates.

The reference implements none of these (SURVEY.md §2 Part A bottom:
"no joins / set ops / ranking windows / distinct agg ..."); they are
[CAT] completeness rows extending Part B so the engine is a full
analytics surface over the same data model.

Oracle-exactness notes:
- stddev/var/corr are NOT computed with the engines' builtin
  aggregates (different summation orders ⇒ different FP rounding).
  Both sides compute the same exact decimal moments (n, Σx, Σx²,
  Σxy — order-independent) and then derive the statistic with an
  IDENTICAL double-arithmetic formula, so results are bit-exact.
- percentile: Spark `percentile()` and DuckDB `quantile_cont()`
  share the interpolation definition pos = 1+(n-1)p; over bigint
  inputs the interpolated doubles are exact.
- sampling uses md5 (same algorithm in both engines) over the key —
  deterministic, partition-independent, reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import dsum, query, tbl

# ---------- moment-derived statistics ----------


def _sql_dsum_big(expr: str, alias: str) -> str:
    """Like sql_dsum, but single-rounded for sums whose scaled value
    exceeds 2^53: DuckDB's direct decimal→double cast double-rounds
    (int128→double, then ÷10^scale); going through VARCHAR is one
    correctly-rounded strtod, matching the JVM's BigDecimal
    .doubleValue exactly."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


_STAT_FORMULAS = """
  CAST(n AS DOUBLE) AS n_rows,
  (n * sxx - sx * sx) / (n * (n - 1)) AS var_qty,
  sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
  (n * syy - sy * sy) / (n * (n - 1)) AS var_price,
  (n * sxy - sx * sy)
    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
  (n * sxy - sx * sy) / (n * (n - 1)) AS covar_qty_price
"""


@query(
    "agg_stats",
    f"""
    SELECT l_returnflag, {_STAT_FORMULAS}
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {_sql_dsum_big('l_quantity', 'sx')},
             {_sql_dsum_big('l_quantity * l_quantity', 'sxx')},
             {_sql_dsum_big('l_extendedprice', 'sy')},
             {_sql_dsum_big('l_extendedprice * l_extendedprice', 'syy')},
             {_sql_dsum_big('l_quantity * l_extendedprice', 'sxy')}
      FROM lineitem
      GROUP BY l_returnflag
    ) m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation / covariance per group, derived
    from exact decimal moments (see module docstring). One shuffle;
    partial aggregation map-side — the moments are plain sums, so the
    100 TB plan is identical to any other grouped sum."""
    li = tbl(spark, sf_dir, "lineitem", parallel=True)
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    moments = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(qty, "sx"),
        dsum(qty * qty, "sxx"),
        dsum(price, "sy"),
        dsum(price * price, "syy"),
        dsum(qty * price, "sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return moments.select(
        "l_returnflag",
        n.alias("n_rows"),
        ((n * sxx - sx * sx) / (n * (n - 1))).alias("var_qty"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - 1))).alias("stddev_qty"),
        ((n * syy - sy * sy) / (n * (n - 1))).alias("var_price"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * (n - 1))).alias("covar_qty_price"),
    )


@query(
    "agg_percentile",
    """
    SELECT l_returnflag,
           quantile_cont(l_orderkey, [0.25, 0.5, 0.75]) AS pcts,
           quantile_cont(l_orderkey, 0.5) AS median_key
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (pos = 1+(n-1)p in
    both engines; bigint inputs ⇒ exact doubles). Spark's exact
    `percentile` sorts within the aggregate state; the approximate
    scale path is `approx_percentile` (see agg_approx_distinct for
    the sketch-aggregate pattern)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(
            F.col("l_orderkey"),
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
        ).alias("pcts"),
        F.percentile(F.col("l_orderkey"), F.lit(0.5)).alias("median_key"),
    )


# ---------- pivot ----------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_counts",
    f"""
    SELECT user_id % 10 AS cohort,
           {', '.join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
                      for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id % 10
    """,
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per cohort × event_type, one row per
    cohort. Explicit pivot values (no discovery pass — at 100 TB the
    two-pass `pivot(col)` without values is a full extra scan)."""
    ev = tbl(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return pivoted.select(
        "cohort",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


# ---------- lateral / explode ----------


@query(
    "lateral_explode",
    """
    SELECT doc_id, i.i - 1 AS pos,
           string_split(lower(trim(text)), ' ')[i.i] AS token
    FROM documents, (SELECT unnest(range(1, 6)) AS i) i
    WHERE i.i <= len(string_split(lower(trim(text)), ' '))
    """,
)
def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / posexplode: first 5 tokens of each document
    with their positions. Generate is pipelined inside the scan stage
    (no shuffle); the slice bounds the fan-out per row."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    return d.select(
        "doc_id", F.posexplode(F.slice(toks, 1, 5)).alias("pos", "token")
    )


# ---------- distribution window functions ----------


@query(
    "win_ntile_dist",
    """
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a unique-keyed ordering
    (o_totalprice ties broken by o_orderkey ⇒ deterministic). Both
    engines share the rank formulas, and (rank-1)/(n-1) over bigints
    is exact in double."""
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_first_last",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the full-partition frame (explicit
    frame — the default RANGE..CURRENT ROW frame would make
    last_value mean 'current row')."""
    o = tbl(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# ---------- cross join ----------


@query(
    "join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (5 × 25). Spark plans
    BroadcastNestedLoopJoin; guarded in real plans by the dims being
    provably bounded (a cross join of two fact tables is a bug, not
    an operator)."""
    r = tbl(spark, sf_dir, "region").select("r_name")
    n = tbl(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


# ---------- deterministic sampling ----------


@query(
    "sample_hash",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '14'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~8% sample: md5(key) prefix threshold. Unlike
    TABLESAMPLE/`df.sample`, this is reproducible across engines,
    partitionings, and retries — the property a 100 TB pipeline needs
    for stable sampled side-tables. Row-local (no shuffle); the
    predicate pushes to the scan stage."""
    o = tbl(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) <= "14"
    )


# ---------- collect aggregates ----------


@query(
    "agg_collect",
    """
    SELECT c_nationkey,
           list_sort(list_distinct(list(c_mktsegment))) AS segments,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array per group (sorted ⇒ deterministic
    array value). Bounded-cardinality column only — collecting an
    unbounded column into array state is the anti-pattern
    minhash_sig_wide's docstring explains."""
    c = tbl(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_set("c_mktsegment")).alias("segments"),
        F.count("*").alias("n_customers"),
    )
