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


# The driver verifies the FIRST 50 entries of queries() per round.
# 142 queries are registered (SURVEY §2 Part B, complete), so full
# driver coverage needs rotation across rounds: r01 checked the first
# 50 in registration order; r02/r03 fronted the six r01-red fixes plus
# 44 oracle-backed never-checked rows (all green). Round 4 fronts the
# remaining 35 queries that have never appeared in a CORRECTNESS file,
# re-checks of the two queries whose semantics changed this round
# (`set_except` and `ns_dedup_embedding` were de-vacuated: thresholds
# tuned so sf0.01 output is non-empty and the hash check is no longer
# trivially satisfied by two empty results), and the thirteen operators
# added this round — 50 rows, filling the window exactly. Every entry
# remains present and locally value-equal-gated
# (tests/test_oracle_parity.py covers all 142) regardless of window
# position.
_ROUND4_FRONT = [
    # never driver-checked — B5 windows + gap-fill:
    "win_rank",
    "win_row_number",
    "win_lag_lead",
    "win_running_frame",
    "win_topk_per_group",
    "ts_gapfill",
    # never driver-checked — B1 scans/sinks:
    "scan_dpp_join",
    "ingest_jsonl",
    "sink_compact_small_files",
    "scan_file_lineage",
    "sink_sorted_layout",
    "scan_schema_evolution",
    "sink_overwrite_dynamic",
    # never driver-checked — joins/aggs:
    "join_bloom_runtime",
    "join_range_bucketed",
    "agg_count_min",
    "agg_incremental_merge",
    "f_bitwise",
    # never driver-checked — streaming:
    "stream_stateful_counter",
    "stream_static_join",
    "stream_stream_join",
    # never driver-checked — UDTF:
    "udtf_python_lateral",
    # never driver-checked — north-star:
    "ns_dedup_containment",
    "ns_dedup_canonical",
    "ns_url_canonicalize",
    "ns_similarity_ann_lsh",
    "ns_similarity_ann_ivf",
    "ns_embedding_profile",
    "ns_pii_scrub",
    "ns_shard_plan",
    "ns_contamination_ngram",
    "ns_corpus_report",
    "ns_quality_gopher",
    "ns_repetition",
    "ns_domain_mixture",
    # changed this round (de-vacuated 0-row greens) — re-check:
    "set_except",
    "ns_dedup_embedding",
    # new this round — first driver check:
    "win_percent_rank",
    "ts_resample_ohlc",
    "ns_dedup_exact_substring",
    "ns_embedding_filter_join",
    "ns_lsh_bucket_stats",
    "ingest_csv_serde",
    "join_asof_tolerance",
    "agg_weighted_avg",
    "scan_static_prune",
    "agg_bitmap_distinct",
    "f_regexp",
    "ns_bigram_stats",
    "ns_url_dedup",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B,
    ordered so the driver's 50-query verification window lands on the
    rows that need (re-)verification this round."""
    front = {n: _ops.QUERIES[n] for n in _ROUND4_FRONT}
    rest = {n: f for n, f in _ops.QUERIES.items() if n not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; names absent here
    (minhash/simhash/ann/streaming smokes) get rows-only checks."""
    return dict(_ops.ORACLE)
