"""sf1-equivalent self-anchor for the bench (BASELINE.md).

The reference publishes no benchmark numbers (BASELINE.md), so the
binding 2× bound has no absolute denominator. This run creates one at
a SECOND scale: bench.py's frozen-24 query prefix, timed with the
bench's own methodology (warmup + best-of-2, noop sink, shared JVM
working set), on a K=10 blow-up of sf0.1 (≈ sf1: 6 M lineitem rows,
1 M events, 50 k docs, 20 k vectors; corpus construction =
scale_check's key-shift / alphabet-rotation rules — synthetic-on-
synthetic, used for timing only, never correctness).

Prints one JSON line {"frozen24_sf1eq_subtotal_sec": ..., "queries":
{...}}; the subtotal is recorded as a table row in BASELINE.md so
future rounds have an absolute self-anchor at two scale factors.

Usage: python scripts/sf1_anchor.py   (run SOLO — timing-sensitive)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from flume_hive_batched_sink_spark.session import get_spark
from scripts.scale_check import build_scaled, timed


def main() -> None:
    spark = get_spark(app_name="sf1-anchor")
    scaled = build_scaled(spark, 10)
    times: dict[str, float] = {}
    for name in HEADLINE[:24]:
        times[name] = round(timed(spark, name, scaled), 3)
        spark.catalog.clearCache()
        print(f"{name:28s} {times[name]:7.2f}s", flush=True)
    print(
        json.dumps(
            {
                "frozen24_sf1eq_subtotal_sec": round(sum(times.values()), 3),
                "corpus": "scale_check K=10 blow-up of sf0.1 (~sf1)",
                "method": "bench.py methodology: warmup + best-of-2, noop sink",
                "queries": times,
            }
        )
    )


if __name__ == "__main__":
    main()
