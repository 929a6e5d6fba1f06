"""IVFPQ amortized-query decade: probed-cell scan vs full ADC scan.

The end-to-end ns_similarity_ivfpq operator REBUILDS its index every
run, so at test SFs the build (a corpus-wide assignment shuffle)
dominates and the composed form times close to — or above — the
full-scan ns_similarity_pq_adc. That comparison is the wrong one for
a production index: FAISS builds IVFADC once and amortizes it across
queries. This script measures the QUERY PATH the index exists for:

  1. build the index ONCE per scale (ivfpq_build_index) and
     materialize it as parquet PARTITIONED BY cell_id — the on-disk
     twin of FAISS's inverted lists;
  2. time top-10 retrieval for the 5 standard probes reading that
     index two ways, through the SAME ivfpq_topk code path:
       - probed:   nprobe=2  → the cell_id isin-prefilter is a scan
                               predicate; partition pruning reads
                               only probed directories;
       - fullscan: nprobe=C  → every cell probed = the ADC full scan
                               (ns_similarity_pq_adc's work) on the
                               identical layout.

At 1x and a 10x key-shifted blow-up (scale_check's corpus builder).
The probed/fullscan ratio is the inverted-list win; it widens with
corpus size because probed work is |corpus|·nprobe/C while fullscan
is |corpus|. Paste the printed rows into SCALING.md.

Usage: python scripts/ivfpq_decade.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_hive_batched_sink_spark.operators.clustering import (  # noqa: E402
    _ADC_N_PROBES,
    _pq_train,
    ivfpq_build_index,
    ivfpq_topk,
)
from flume_hive_batched_sink_spark.operators.registry import tbl  # noqa: E402
from flume_hive_batched_sink_spark.operators.similarity import (  # noqa: E402
    ivf_centroids,
)
from flume_hive_batched_sink_spark.scratch import SCRATCH  # noqa: E402
from flume_hive_batched_sink_spark.session import get_spark  # noqa: E402
from scale_check import BASE_SF, build_scaled  # noqa: E402


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def measure(spark, sf_dir: str, tag: str) -> tuple[float, float, float]:
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    cent = ivf_centroids(em)
    cb = _pq_train(em)
    idx_path = os.path.join(SCRATCH, "ivfpq_idx", tag)
    t0 = time.perf_counter()
    ivfpq_build_index(em, cent, cb).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(idx_path)
    build_s = time.perf_counter() - t0
    enc = spark.read.parquet(idx_path)
    probes = list(range(_ADC_N_PROBES))
    n_cells = cent.count()
    # warm each path once, then best-of-2 (the bench convention)
    args = dict(em=em, cent=cent, probe_ids=probes, cb=cb, enc=enc)
    probed_df = ivfpq_topk(nprobe=2, **args)
    full_df = ivfpq_topk(nprobe=n_cells, **args)
    _timed(probed_df), _timed(full_df)
    probed_s = min(_timed(probed_df), _timed(probed_df))
    full_s = min(_timed(full_df), _timed(full_df))
    return build_s, probed_s, full_s


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="ivfpq-decade")
    print(f"building {k}x dataset …", flush=True)
    scaled = build_scaled(spark, k)
    for tag, d in (("1x", BASE_SF), (f"{k}x", scaled)):
        build_s, probed_s, full_s = measure(spark, d, tag)
        print(
            f"{tag:4s} build={build_s:6.2f}s  "
            f"probed(nprobe=2)={probed_s:6.2f}s  "
            f"fullscan={full_s:6.2f}s  "
            f"query speedup={full_s / probed_s:4.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
