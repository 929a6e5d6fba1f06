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
# 195 queries are registered (SURVEY §2 Part B, which matches the
# registry exactly in both directions — pinned by
# tests/test_properties.py::test_survey_registry_lockstep); all 195
# carry exact DuckDB oracles and the local sweep value-equal-gates
# every one each round.
#
# Round 9 rotation. The driver produced no CORRECTNESS_r08 artifact,
# so the r8 front (output-changed ops + the r04 cohort) never got its
# driver check — the r04 cohort remains the stale edge and the seven
# r8 output-changed operators still await their FIRST hash-gated
# driver check under the new output paths. The r9 window therefore
# holds, in priority order (first-ever gates outrank re-checks):
# (a) the 10 operators NEW in r9 (never driver-checked): the curation
#     suite — ns_quality_perplexity / ns_sample_importance (det_ln-
#     based scores), ns_dedup_bloom and its streaming twin
#     stream_dedup_bloom, the clustering pair ns_cluster_kmeans /
#     ns_semdedup, E-S weighted sampling, the leakage-safe fold
#     split, the entropy quality signal, and web-markup extraction;
# (b) the 7 ops whose OUTPUT changed in r8 (md5-nibble hash switch,
#     NaN cell fix, auto band geometry, value-bounded sketch
#     envelopes): ns_dedup_simhash, ns_dedup_minhash, win_ntile_dist,
#     ns_dedup_embedding, agg_approx_distinct, agg_approx_percentile,
#     agg_hll_sketch_merge;
# (c) 33 of the 43 r04-stale ops (scripts/staleness.py this round).
# 10 + 7 + 33 = 50 (weighted-topk, group-folds, stream_dedup_bloom,
# ns_quality_entropy and ns_html_extract joined group (a) late in
# the round). Displaced to r10: ten r04 rows (agg_weighted_avg, f_bitwise, f_regexp,
# ingest_csv_serde, ingest_jsonl, win_row_number, win_running_frame,
# win_rank — scalar/ingest/window surfaces whose outputs are
# unchanged since r04 and value-equal-gated locally every round) and
# the r05 cohort. After a clean r9 driver run, no operator's latest
# binding check is older than r04, and those ten plus the r05 rows
# rotate forward in r10.
_ROUND9_FRONT = [
    # (a) new in r9 — first driver check
    "ns_quality_perplexity",
    "ns_sample_importance",
    "ns_dedup_bloom",
    "ns_cluster_kmeans",
    "ns_semdedup",
    "ns_sample_weighted_topk",
    "ns_split_group_folds",
    "stream_dedup_bloom",
    "ns_quality_entropy",
    "ns_html_extract",
    # (b) output changed in r8 — first check under the new path
    "ns_dedup_simhash",
    "ns_dedup_minhash",
    "win_ntile_dist",
    "ns_dedup_embedding",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_hll_sketch_merge",
    # (c) r04-stale cohort
    "agg_bitmap_distinct",
    "agg_count_min",
    "agg_incremental_merge",
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
    "win_percent_rank",
    "win_topk_per_group",
]

# Stable alias for tooling (scripts/drive_oracle.py `front` filter).
FRONT = _ROUND9_FRONT


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B,
    ordered so the driver's 50-query verification window lands on the
    rows that need (re-)verification this round."""
    front = {n: _ops.QUERIES[n] for n in _ROUND9_FRONT}
    rest = {n: f for n, f in _ops.QUERIES.items() if n not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for EVERY registered query — 195/195 as of r9;
    the rows-only category is empty. r8 emptied it (md5-derived
    hashes for MinHash/SimHash/ANN-LSH; value-bounded envelopes for
    the four sketch aggregates; list_reduce replay of the IVF
    left-fold assignment dot). The ten r9 additions were oracle-
    backed from birth: the perplexity / DSIR / weighted-sampling
    scores ride the deterministic integer logarithm
    (registry.det_ln_int — native ln() is NOT cross-engine
    bit-stable), the bloom filter's geometry and positions are exact
    integer/md5 arithmetic, and the k-means / SemDeDup pair replays
    both Lloyd iterations via list_reduce distance folds and
    VARCHAR-routed decimal means."""
    return dict(_ops.ORACLE)
