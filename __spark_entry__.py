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
# of CORRECTNESS_r01-r06 covers all of them with zero failures ever
# recorded, and none's latest binding check is older than r03.
# Round 7 continues the staleness rotation per the r6 verdict:
# (a) the 4 operators whose output path or gate changed in r6/r7 —
#     agg_percentile (all-NULL-group left-join fix, r7),
#     ns_multimodal_headers (truncated-payload length guards, r7),
#     ns_pack_ffd (converted rows-only -> oracle-backed in r7; first
#     hash-gated driver check), and ns_dedup_embedding (the r6
#     double-sign fast-path rewrite changed its band-key computation
#     but r6's window didn't front it — the r6 ADVICE item), and
#     join_null_safe (r7 factorization: per-side per-key
#     pre-aggregation replaces pair streaming; output identical,
#     re-checked), and win_ntile_dist (r7 distributed two-level
#     rank replaces the 5-single-task-sort window shape);
# (b) ALL 44 operators whose latest driver check is r03 (the f_*
#     scalar family, set ops, sinks, the streaming family, the udf
#     family, the ns_* text family, sessionize, win_range_frame);
# (the r04 fills agg_bitmap_distinct / agg_count_min were displaced
# by the join_null_safe and win_ntile_dist re-checks — changed output
# paths outrank staleness, and both fills remain r04-fresh).
# 6 + 44 = 50, the window exactly. After this round no registered
# operator's latest driver check is older than r04. Every entry
# remains present and locally value-equal-gated
# (tests/test_oracle_parity.py covers all 185, with a vacuity guard)
# regardless of window position.
_ROUND7_FRONT = [
    "agg_percentile",
    "ns_multimodal_headers",
    "ns_pack_ffd",
    "ns_dedup_embedding",
    "join_null_safe",
    "win_ntile_dist",
    "agg_approx_percentile",
    "agg_collect",
    "f_array",
    "f_conditional",
    "f_date",
    "f_json_map",
    "f_math",
    "f_struct",
    "ingest_bad_records",
    "ingest_parse_text",
    "ns_doc_fingerprint",
    "ns_lang_id",
    "ns_pack_sequences",
    "ns_quality_score",
    "ns_sample_stratified",
    "ns_similarity_topk",
    "ns_text_scrub",
    "ns_text_stats",
    "ns_tfidf_topterms",
    "ns_token_count",
    "partition_route",
    "partition_spec_parse",
    "scan_pruned",
    "sessionize",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "sink_orc_write",
    "sink_partitioned_write",
    "sink_table_partitions",
    "sql_interface",
    "stream_dedup",
    "stream_foreach_batch_land",
    "stream_observe_counters",
    "stream_session",
    "stream_sliding",
    "stream_tumbling_5min",
    "stream_watermark_late",
    "udaf_grouped_agg",
    "udf_scalar_pandas",
    "udf_serde_plugin",
    "udtf_apply_in_pandas",
    "win_range_frame",
]
# Displaced to positions 51+: everything checked r04/r05/r06 (fresh).
# The oldest survivors (the remaining 42 r04 rows) rotate forward
# next round.

# Stable alias for tooling (scripts/drive_oracle.py `front` filter).
FRONT = _ROUND7_FRONT


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B,
    ordered so the driver's 50-query verification window lands on the
    rows that need (re-)verification this round."""
    front = {n: _ops.QUERIES[n] for n in _ROUND7_FRONT}
    rest = {n: f for n, f in _ops.QUERIES.items() if n not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; names absent here
    (minhash/simhash/ann/streaming smokes) get rows-only checks."""
    return dict(_ops.ORACLE)
