"""B6 — sorts / limits / set operations ([CAT]).

`sort_limit_topk` must plan as TakeOrderedAndProject (per-partition
top-N + driver merge of N·partitions rows), never a global sort —
that's the difference between O(N) and a full-shuffle sort at 100 TB.
Set ops use distinct semantics (one hash aggregate) except
`set_except_all`, which exercises bag semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, tbl


@query(
    "sort_limit_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price (unique-key tiebreak). Plans as
    TakeOrderedAndProject — no full sort, no single-task shuffle."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(100)
    )


_BIG_SPENDERS = "SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000"
_AUTO_SEG = "SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
# set_except uses a higher spend bar: at the correctness SF nearly
# every customer clears 150k at least once, which made the EXCEPT
# empty — a vacuous green that can't catch broken semantics. 350k
# leaves a small non-empty remainder at sf0.01 (verified: 17 rows).
_HUGE_SPENDERS = "SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"


@query(
    "set_union",
    f"SELECT custkey FROM (({_BIG_SPENDERS}) UNION ({_AUTO_SEG}))",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): big spenders ∪ automobile-segment customers."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    a = (
        o.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    b = (
        c.filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
        .distinct()
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    f"({_BIG_SPENDERS}) INTERSECT ({_AUTO_SEG})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    a = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "set_except",
    f"({_AUTO_SEG}) EXCEPT ({_HUGE_SPENDERS})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automobile-segment customers who never placed a >350k order."""
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # distinct EXCEPT semantics


@query(
    "set_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware)."""
    o = tbl(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (min multiplicity per key)."""
    o = tbl(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)
