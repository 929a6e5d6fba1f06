"""LSH band-geometry measurement on the 10× corpus (r6 verdict #2).

The 100× run in SCALING.md carries a planted true-dup floor (100
identical copies of every vector ⇒ ≈9.9 M unavoidable pairs) that
partially masks the geometry's own candidate term. At 10× the floor
is only 2 000·C(10,2) = 90 k pairs, so the n²/2^k-per-band term is
cleanly visible — this script measures, for planes_per_band ∈
{8 (baked test default), 16 (documented scale config), auto
(auto_planes_per_band from the corpus count)}:

  - Σ c·(c−1)/2 candidate-pair workload over (band, bucket)
  - end-to-end `dedup_embedding_chain` wall-clock (warm-up + best
    of 2, noop sink — bench.py's protocol) and output-pair count

All three run the OPERATOR'S OWN chain/features code — nothing is
reimplemented here. Results are pasted into SCALING.md by hand.

Usage: python scripts/lsh_geometry10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_hive_batched_sink_spark.catalog import load_table
from flume_hive_batched_sink_spark.operators.similarity import (
    auto_planes_per_band,
    band_keys,
    dedup_embedding_chain,
    embedding_features,
)
from flume_hive_batched_sink_spark.session import get_spark
from scripts.scale_check import build_scaled

K = 10


def main() -> None:
    spark = get_spark(app_name="lsh-geometry10")
    print(f"building {K}x dataset …", flush=True)
    t0 = time.time()
    sf_dir = build_scaled(spark, K)
    print(f"built in {time.time() - t0:.0f}s", flush=True)

    em = load_table(spark, sf_dir, "embeddings").repartition(32)
    n = em.count()
    auto_k = auto_planes_per_band(n)
    print(f"n={n} vectors; auto geometry -> {auto_k} planes/band", flush=True)
    floor = 2000 * (K * (K - 1) // 2)
    print(f"true-dup floor (identical copies): {floor} pairs", flush=True)

    geometries = [8, 16]
    if auto_k not in geometries:
        geometries.append(auto_k)
    for planes in geometries:
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

        # end-to-end chain: warm-up, then best-of-2 (noop sink)
        def run() -> float:
            # each chain call persists its own feats frame — drop the
            # previous call's before timing so memory pressure doesn't
            # accumulate across the 4 invocations (r7 ADVICE)
            spark.catalog.clearCache()
            t = time.perf_counter()
            dedup_embedding_chain(
                spark, em, n_bands=4, planes_per_band=planes
            ).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t

        run()
        wall = min(run(), run())
        spark.catalog.clearCache()
        out_pairs = dedup_embedding_chain(
            spark, em, n_bands=4, planes_per_band=planes
        ).count()
        spark.catalog.clearCache()
        tag = " (auto)" if planes == auto_k and planes not in (8, 16) else ""
        print(
            f"| {planes}-plane{tag} | {stats.pairs:,} | {stats.max_bucket} "
            f"| {stats.n_buckets} | {wall:.2f} s | {out_pairs:,} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
