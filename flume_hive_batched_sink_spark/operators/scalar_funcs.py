"""B7 — scalar function surface (string / date / math / array /
json-map / conditional).

Origins: A4's time math (CommonUtils.scala:30-40), A5's parsing,
A13's string surgery (HiveUtils.scala:126-139), A15's
no_category/invalid_timestamp fallbacks (TimedUtils.scala:81-93) —
plus the [CAT] coverage. Everything is a JVM built-in inside
whole-stage codegen; no Python touches these rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tbl


@query(
    "f_string",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           replace(p_type, ' ', '_') AS type_snake,
           CASE WHEN p_name LIKE '%blue%' THEN 1 ELSE 0 END AS has_blue
    FROM part
    """,
)
def f_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.col("p_name").like("%blue%"), 1).otherwise(0).alias("has_blue"),
    )


@query(
    "f_date",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           strftime(o_orderdate, '%Y%m%d%H%M') AS order_logdate,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_mon,
           CAST(dayofweek(o_orderdate) AS INT) AS order_dow,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_95
    FROM orders
    """,
)
def f_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A11's time math: truncation, formatting, epoch, intervals.
    DuckDB `dayofweek` is 0=Sunday..6; Spark `dayofweek` is
    1=Sunday..7 — normalized via dayofweek-1."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyyMMddHHmm").alias("order_logdate"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("days_since_95"),
    )


@query(
    "f_math",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           round(l_extendedprice, 1) AS price_round1,
           abs(l_extendedprice - 50000.0) AS dist_from_50k,
           CAST(pow(l_quantity, 2) AS DOUBLE) AS qty_sq,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 10 AS BIGINT) AS mod10,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 10).cast("bigint").alias("mod10"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "f_array",
    """
    SELECT vec_id,
           dim,
           CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS sum_elems,
           CAST(SUM(CASE WHEN e > 0 THEN CAST(CAST(e AS DOUBLE) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS sum_pos,
           CAST(SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           MAX(CAST(e AS DOUBLE)) AS max_elem
    FROM (SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                 unnest(embedding) AS e
          FROM embeddings) t
    GROUP BY vec_id, dim
    """,
)
def f_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column —
    size/filter/transform/aggregate with an exact decimal fold (the
    oracle unnests; HOFs keep Spark's side shuffle-free)."""
    em = tbl(spark, sf_dir, "embeddings")
    _dec = "decimal(28,6)"  # fold re-cast keeps the accumulator type
    as_dec = lambda x: x.cast("double").cast(_dec)  # noqa: E731
    zero = F.lit(0).cast(_dec)
    return em.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.aggregate(
            "embedding", zero, lambda acc, x: (acc + as_dec(x)).cast(_dec)
        )
        .cast("double")
        .alias("sum_elems"),
        F.aggregate(
            F.filter("embedding", lambda x: x > 0),
            zero,
            lambda acc, x: (acc + as_dec(x)).cast(_dec),
        )
        .cast("double")
        .alias("sum_pos"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.array_max(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "max_elem"
        ),
    )


@query(
    "f_json_map",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS has_k
    FROM events
    """,
)
def f_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5's JSON surface: get_json_object + from_json-as-map + map fns."""
    ev = tbl(spark, sf_dir, "events")
    as_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.array_join(F.map_keys(as_map), ",").alias("prop_keys"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1)
        .otherwise(0)
        .alias("has_k"),
    )


@query(
    "f_conditional",
    """
    SELECT event_id,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS value_band,
           coalesce(nullif(event_type, 'error'), 'no_category') AS category,
           CASE WHEN user_id % 2 = 0 THEN user_id ELSE NULL END AS even_uid,
           coalesce(CASE WHEN user_id % 2 = 0 THEN user_id END, -1) AS even_uid_filled
    FROM events
    """,
)
def f_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15's fallback semantics (no_category / invalid bucket,
    TimedUtils.scala:81-93): when/otherwise, nullif, coalesce."""
    ev = tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 150, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")), F.lit("no_category")
        ).alias("category"),
        F.when(F.col("user_id") % 2 == 0, F.col("user_id")).alias("even_uid"),
        F.coalesce(
            F.when(F.col("user_id") % 2 == 0, F.col("user_id")), F.lit(-1)
        ).alias("even_uid_filled"),
    )


@query(
    "f_struct",
    """
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price_field,
           upper(o_orderstatus) AS status_field,
           concat(o_orderpriority, ':', CAST(o_custkey AS VARCHAR)) AS packed
    FROM orders
    """,
)
def f_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct mechanics: build a struct column with
    named_struct, nest it inside another struct, then project fields
    back out (the oracle sees only the flattened scalars — structs
    are Spark-side plumbing). Catalyst collapses the build/extract
    round trip, so this costs nothing at any scale."""
    o = tbl(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.upper("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_orderpriority").alias("pri"),
                F.col("o_custkey").alias("cust"),
            ).alias("inner"),
        ).alias("s"),
    )
    return nested.select(
        "o_orderkey",
        F.col("s.price").cast("double").alias("price_field"),
        F.col("s.status").alias("status_field"),
        F.concat(
            F.col("s.inner.pri"), F.lit(":"), F.col("s.inner.cust").cast("string")
        ).alias("packed"),
    )


@query(
    "f_bitwise",
    """
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           CAST(bit_count(event_id) AS INT) AS popcount,
           event_id << 3 AS shl3,
           event_id >> 2 AS shr2
    FROM events
    WHERE event_id < 4096
    """,
)
def f_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: AND/OR/XOR, popcount, shifts — the
    primitives behind every hash/bucket/bitmask routine in the
    engine (minhash band packing, simhash bit votes, salted keys).
    All codegen'd JVM intrinsics; the WHERE bound keeps shifts far
    from the int64 sign bit so both engines agree without overflow
    semantics entering (Spark ANSI would throw, DuckDB wraps)."""
    ev = tbl(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 4096).select(
        "event_id",
        F.col("event_id").bitwiseAND(255).alias("low_byte"),
        F.col("event_id").bitwiseOR(4096).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.bit_count("event_id").alias("popcount"),
        F.shiftleft("event_id", 3).alias("shl3"),
        F.shiftright("event_id", 2).alias("shr2"),
    )


@query(
    "f_regexp",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT)
             AS n_vowel_pairs,
           regexp_extract(text, '(s[a-z]+)', 1) AS first_s_word,
           regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(text, '(aa|ee|ll|oo|ss|tt)') AS has_double
    FROM documents
    """,
)
def f_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: count / extract / replace-all / boolean
    match. Patterns stay inside the RE2-compatible subset (no
    backreferences, no lookaround) so Java's engine and the oracle's
    RE2 compile them identically; both engines use leftmost
    non-overlapping match semantics. All row-local codegen'd
    expressions — zero shuffle."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"[aeiou]{2}"))
        .cast("bigint")
        .alias("n_vowel_pairs"),
        F.regexp_extract("text", r"(s[a-z]+)", 1).alias("first_s_word"),
        F.regexp_replace("text", r"[aeiou]", "*").alias("devoweled"),
        F.col("text").rlike(r"(aa|ee|ll|oo|ss|tt)").alias("has_double"),
    )
