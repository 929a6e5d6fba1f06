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
# (a) the 7 operators whose OUTPUT changed in r8 and therefore need
#     their first hash-gated driver check under the new output path —
#     ns_dedup_simhash and ns_dedup_minhash (token hashes switched to
#     md5 nibbles; both left the rows-only list), win_ntile_dist
#     (NaN-price cell fix + the shared two_level_rank refactor),
#     ns_dedup_embedding (band geometry now auto-sized; provably
#     still 8 planes at oracle SFs), and the three sketch aggregates
#     converted to value-bounded oracles late in r8
#     (agg_approx_distinct, agg_approx_percentile,
#     agg_hll_sketch_merge — exact columns + envelope flags;
#     agg_count_min converted too but already sits in the r04 cohort
#     below);
# (b) ALL 43 operators whose latest driver check is r04 (computed by
#     scripts/staleness.py this round — includes win_percent_rank,
#     which also reverted to the builtin window in r8 after the
#     two-level variant measured slower at both scales).
# 7 + 43 = 50, the window exactly. Displaced to make room for the
# late conversions: stream_foreach_batch_land / stream_dedup /
# stream_watermark_late (r8 staging-cache plumbing changes with
# UNCHANGED output semantics, pass-r7 bindings, value-equal-gated by
# the final local sweep) and the agg_audience_overlap r05 fill —
# first-ever hash gates for changed outputs outrank re-checks of
# pass-r7 rows. After this round no registered operator's latest
# binding driver check is older than r05. Every entry remains present
# and locally value-equal-gated (tests/test_oracle_parity.py covers
# all 185, with a vacuity guard) regardless of window position.
_ROUND8_FRONT = [
    "ns_dedup_simhash",
    "ns_dedup_minhash",
    "win_ntile_dist",
    "ns_dedup_embedding",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_hll_sketch_merge",
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
]
# Displaced to positions 51+: everything checked r05-r07 (fresh).
# The oldest survivors (the r05 rows, now including
# agg_audience_overlap) rotate forward next round.

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
    """DuckDB twins for EVERY registered query — 185/185 as of r8;
    the rows-only category is empty. How the last eight left it:
    MinHash/SimHash/ANN-LSH switched to md5-derived hashes DuckDB
    replays exactly; the four sketch aggregates (agg_approx_distinct,
    agg_approx_percentile, agg_count_min, agg_hll_sketch_merge) got
    the r7 verdict's tolerance-band pattern — hashable outputs carry
    cross-engine-exact columns plus Spark-side error-envelope flags
    the oracle pins to TRUE, so sketch drift breaks the hash gate
    (raw estimates stay exposed via *_estimates/probe helpers); and
    ns_similarity_ann_ivf's assignment ranking (a left-fold double
    dot) replays bit-exactly via DuckDB list_reduce (similarity.py
    _IVF_ORACLE)."""
    return dict(_ops.ORACLE)
