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
# 185 queries are registered (SURVEY §2 Part B, which matches the
# registry exactly in both directions — pinned by
# tests/test_properties.py::test_survey_registry_lockstep); the union
# of CORRECTNESS_r01-r07 covers all of them with zero failures ever
# recorded, and none's latest binding check is older than r04.
# Round 8 rotates the window onto the r04 cohort per the r7 verdict
# (#3: "after r8 no binding check should be older than r05"):
# (a) the 6 operators whose output path changed in r8 —
#     ns_dedup_simhash (token hash switched xxhash64 -> md5 nibbles;
#     OUTPUT CHANGED, first hash-gated driver check after leaving the
#     rows-only list), win_ntile_dist (NaN-price cell fix + the
#     shared two_level_rank refactor), ns_dedup_embedding (band
#     geometry now auto-sized; provably still 8 planes at oracle
#     SFs), stream_foreach_batch_land (now replays the SHARED event
#     staging dir), stream_dedup and stream_watermark_late (staging
#     cache keys; content unchanged, re-checked anyway);
# (b) ALL 43 operators whose latest driver check is r04 (computed by
#     scripts/staleness.py this round — includes win_percent_rank,
#     which also reverted to the builtin window in r8 after the
#     two-level variant measured slower at both scales);
# (c) 1 fill from the oldest r05 row (agg_audience_overlap).
# 6 + 43 + 1 = 50, the window exactly. After this round no
# registered operator's latest binding driver check is older than
# r05. Every entry remains present and locally value-equal-gated
# (tests/test_oracle_parity.py covers all 185, with a vacuity guard)
# regardless of window position.
_ROUND8_FRONT = [
    "ns_dedup_simhash",
    "win_ntile_dist",
    "ns_dedup_embedding",
    "stream_foreach_batch_land",
    "stream_dedup",
    "stream_watermark_late",
    "agg_bitmap_distinct",
    "agg_count_min",
    "agg_incremental_merge",
    "agg_weighted_avg",
    "f_bitwise",
    "f_regexp",
    "ingest_csv_serde",
    "ingest_jsonl",
    "join_range_bucketed",
    "ns_bigram_stats",
    "ns_contamination_ngram",
    "ns_corpus_report",
    "ns_domain_mixture",
    "ns_embedding_filter_join",
    "ns_embedding_profile",
    "ns_lsh_bucket_stats",
    "ns_quality_gopher",
    "ns_repetition",
    "ns_shard_plan",
    "ns_similarity_ann_ivf",
    "ns_similarity_ann_lsh",
    "ns_url_canonicalize",
    "ns_url_dedup",
    "scan_dpp_join",
    "scan_file_lineage",
    "scan_schema_evolution",
    "scan_static_prune",
    "set_except",
    "sink_compact_small_files",
    "sink_overwrite_dynamic",
    "sink_sorted_layout",
    "stream_stateful_counter",
    "stream_static_join",
    "stream_stream_join",
    "ts_gapfill",
    "ts_resample_ohlc",
    "udtf_python_lateral",
    "win_lag_lead",
    "win_percent_rank",
    "win_rank",
    "win_row_number",
    "win_running_frame",
    "win_topk_per_group",
    "agg_audience_overlap",
]
# Displaced to positions 51+: everything checked r05-r07 (fresh).
# The oldest survivors (the remaining 44 r05 rows) rotate forward
# next round.

# Stable alias for tooling (scripts/drive_oracle.py `front` filter).
FRONT = _ROUND8_FRONT


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B,
    ordered so the driver's 50-query verification window lands on the
    rows that need (re-)verification this round."""
    front = {n: _ops.QUERIES[n] for n in _ROUND8_FRONT}
    rest = {n: f for n, f in _ops.QUERIES.items() if n not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query. The 5 names
    absent here get rows-only checks: agg_approx_distinct,
    agg_approx_percentile, agg_count_min, agg_hll_sketch_merge
    (engine-internal sketch states) and ns_similarity_ann_ivf
    (data-dependent centroid selection). MinHash/SimHash/ANN-LSH
    left this list in r8 (md5-based hashes replay in DuckDB)."""
    return dict(_ops.ORACLE)
