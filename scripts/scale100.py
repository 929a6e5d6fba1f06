"""One-off 100× decade check (sf0.1 × 100 ≈ sf10-equivalent).

Extends SCALING.md's 10× table one more decade for the heaviest
operators, and answers the specific at-scale question the 10× sweep
left open: does the PARAMETERIZED 16-plane LSH band geometry keep
embedding-dedup candidate volume sub-quadratic when the corpus grows
100×? (The oracle-baked 8-plane test geometry is quadratic by design
at this size — that is why the geometry is a parameter.)

Reuses scale_check's corpus construction (same key-shift / alphabet-
rotation rules, same warmup + best-of-2 timing). NOTE: the alphabet
rotation wraps at period 26, so K=100 plants TRUE duplicate clusters
(copies i and i+26 of a doc are identical — ~144 true pairs per
original doc). That is deliberate signal, not noise: it exercises
the dedup operators' pair-verification path at scale, and their
100× cost must be read as linear-in-true-dups (see the 100× section
of SCALING.md), not as corpus-quadratic blowup. Results are pasted
into SCALING.md's trailer by hand — this run is a measurement, not a
table regeneration (the table stays K=10).

Usage: python scripts/scale100.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_hive_batched_sink_spark.catalog import load_table
from flume_hive_batched_sink_spark.session import get_spark
from scripts.scale_check import BASE_SF, build_scaled, timed

K = 100

DEFAULT_QUERIES = [
    "agg_multi",
    "agg_percentile",
    "ns_dedup_minhash",
    "ns_dedup_simhash",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_exact_substring",
]


def lsh_candidate_workload(spark, sf_dir: str) -> None:
    """Σ c·(c−1)/2 over (band, bucket) occupancy — the exact candidate
    -pair workload the banded embedding dedup would generate — under
    the default 8-plane and the at-scale 16-plane geometries."""
    from flume_hive_batched_sink_spark.operators.similarity import (
        band_keys,
        embedding_features,
    )

    em = load_table(spark, sf_dir, "embeddings")
    n = em.count()
    for planes in (8, 16):
        keys = band_keys(
            embedding_features(spark, em, n_bands=4, planes_per_band=planes),
            n_bands=4,
        )
        occ = keys.groupBy("band", "bucket").agg(F.count("*").alias("c"))
        stats = occ.agg(
            F.sum(F.expr("(c * (c - 1)) div 2")).alias("pairs"),
            F.max("c").alias("max_bucket"),
            F.count("*").alias("n_buckets"),
        ).collect()[0]
        print(
            f"LSH {planes:2d}-plane: n={n} candidate_pairs={stats.pairs} "
            f"max_bucket={stats.max_bucket} n_buckets={stats.n_buckets} "
            f"(quadratic would be ~{4 * n * (n - 1) // 2})",
            flush=True,
        )


def embedding_dedup_16plane(spark, sf_dir: str) -> None:
    """Run the FULL ns_dedup_embedding chain under the 16-plane scale
    geometry — the end-to-end proof that the parameterized band
    config carries the operator through the 100× corpus, not just
    the candidate-count pre-flight. Calls the operator's OWN
    `dedup_embedding_chain` (one definition — this measures the
    shipped algorithm, never a drifting copy)."""
    from flume_hive_batched_sink_spark.operators.similarity import (
        dedup_embedding_chain,
    )

    em = load_table(spark, sf_dir, "embeddings").repartition(32)
    t0 = time.perf_counter()
    out = dedup_embedding_chain(spark, em, n_bands=4, planes_per_band=16)
    n = out.count()
    t = time.perf_counter() - t0
    print(
        f"embedding dedup @16-plane: {n} pairs in {t:.1f}s "
        f"(n={em.count()} vectors)",
        flush=True,
    )


def main() -> None:
    # --no-lsh skips the Σc(c−1)/2 band-occupancy pre-flight (two full
    # 16/8-plane feature passes over the 100× corpus) when a run only
    # adds decade rows for unrelated operators — the pre-flight's own
    # numbers are already recorded in SCALING.md. Strip the flag
    # BEFORE the default-queries fallback, so a bare
    # `scale100.py --no-lsh` still runs the default sweep instead of
    # silently building the corpus and timing nothing.
    argv = [a for a in sys.argv[1:] if a != "--no-lsh"]
    skip_lsh = len(argv) != len(sys.argv[1:])
    names = argv or DEFAULT_QUERIES
    run_embed16 = "embed16" in names
    names = [n for n in names if n != "embed16"]
    spark = get_spark(app_name="scale100")
    print(f"building {K}x dataset …", flush=True)
    t0 = time.time()
    scaled_dir = build_scaled(spark, K)
    print(f"built in {time.time() - t0:.0f}s", flush=True)
    if run_embed16:
        embedding_dedup_16plane(spark, scaled_dir)
    from flume_hive_batched_sink_spark import operators as ops

    def first_run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        ops.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        # streaming ops: the first invocation stages the replay corpus
        # (parquet write+copy of the full blow-up); stage.py's
        # in-process cache makes every later invocation replay-only,
        # so `first − best` isolates the staging I/O the r7 verdict
        # asked to report separately from operator state work
        is_stream = name.startswith("stream_")
        s1 = first_run(name, BASE_SF) if is_stream else None
        t1 = timed(spark, name, BASE_SF)
        spark.catalog.clearCache()
        sk = first_run(name, scaled_dir) if is_stream else None
        tk = timed(spark, name, scaled_dir)
        spark.catalog.clearCache()
        ratio = tk / t1 if t1 > 0 else float("nan")
        extra = (
            f"  [staging: 1x≈{s1 - t1:.2f}s {K}x≈{sk - tk:.2f}s]"
            if is_stream
            else ""
        )
        print(
            f"{name:26s} 1x={t1:6.2f}s  {K}x={tk:8.2f}s  "
            f"ratio={ratio:6.1f} (linear≈{K}){extra}",
            flush=True,
        )
    # the pre-flight count only accompanies the default sweep — an
    # embed16-only invocation already ran the end-to-end chain and
    # should not pay two more full feature passes for an unasked count
    if names and not skip_lsh:
        lsh_candidate_workload(spark, scaled_dir)


if __name__ == "__main__":
    main()
