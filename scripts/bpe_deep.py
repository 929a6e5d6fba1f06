"""Deep BPE training-loop measurement (r10 verdict missing-item #3).

bpe_train's docstring prescribes localCheckpoint every ~100 rounds at
a production 30k-merge target; r11 moved the checkpoint from advice
to code (checkpoint_every, default 100). This script PROVES the
cadence does its job: run a deep merge loop (default 200 rounds) on a
10x-words corpus and bucket the per-round wall times — flat buckets
under the cadence, growing buckets without it (each uncheckpointed
round stacks one replace() projection, so analysis/lineage cost grows
per round).

Corpus: documents-only 10x blow-up with the alphabet ROTATED per copy
(scale_check's documents rule), so the word table grows ~10x real
distinct words rather than a planted 10-way dup of every word.

Usage: python scripts/bpe_deep.py [ROUNDS] [K]   (defaults 200, 10;
run SOLO). Prints one JSON line with per-bucket round-time means for
checkpoint_every=100 and (at ROUNDS capped to 100) checkpoint_every=0.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_hive_batched_sink_spark.catalog import load_table
from flume_hive_batched_sink_spark.operators.bpe import bpe_train
from flume_hive_batched_sink_spark.scratch import SCRATCH
from flume_hive_batched_sink_spark.session import get_spark
from scripts.scale_check import BASE_SF, scaled_copy

_BUCKET = 25


def build_documents_only(spark, k: int) -> str:
    out = os.path.join(SCRATCH, f"scale{k}x_docs")
    dst = os.path.join(out, "documents.parquet")
    if not os.path.exists(dst):
        base = load_table(spark, BASE_SF, "documents")
        parts = [scaled_copy(base, "documents", i) for i in range(k)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(dst)
    return out


def run(spark, sf_dir: str, rounds: int, every: int) -> dict:
    times: list[float] = []
    seqs, stats = bpe_train(
        spark,
        sf_dir,
        rounds=rounds,
        checkpoint_every=every,
        on_round=lambda rnd, s: times.append(s),
    )
    buckets = {
        f"rounds_{i + 1}-{i + _BUCKET}": round(
            sum(times[i : i + _BUCKET]) / len(times[i : i + _BUCKET]), 3
        )
        for i in range(0, len(times), _BUCKET)
    }
    return {
        "rounds_completed": len(stats),
        "checkpoint_every": every,
        "total_s": round(sum(times), 1),
        "mean_round_s": round(sum(times) / len(times), 3),
        "bucket_mean_round_s": buckets,
        "last_merge": stats[-1][1] + stats[-1][2] if stats else None,
    }


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="bpe-deep")
    big = build_documents_only(spark, k)
    n_words = (
        load_table(spark, big, "documents").count(),
    )
    res = {"K": k, "rounds": rounds}
    res["checkpointed"] = run(spark, big, rounds, 25)
    # contrast: lineage growth without the cadence (capped — the
    # whole point is that this one gets slower per round)
    res["uncheckpointed"] = run(spark, big, min(rounds, 100), 0)
    res["n_docs"] = n_words[0]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
