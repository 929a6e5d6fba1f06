"""Date-SPREADING 100× decade check for the interval join.

SCALING.md's 100× section deliberately skips `join_range_bucketed`
under the standard key-shift blow-up: that corpus stacks all K copies
onto the SAME dates, so per-day density on both sides grows K× and
co-bucketed pair volume — the operator's honest output-bound
workload — grows K² BY CONSTRUCTION. The disclosure there argues "a
real 100× corpus spans ~100× the dates at similar per-day density,
keeping pairs ~linear". This script MEASURES that claim instead of
reasoning it: each copy i shifts o_orderdate/l_shipdate by
i·DATE_SHIFT_DAYS (beyond the 1× corpus' ~2500-day span), so copies
occupy disjoint date ranges, per-day density stays 1×, and true pair
volume is exactly K× the 1× volume. A ~linear wall-clock ratio here
is the operator's real-decade evidence; the key-shift K² number
remains excluded from the table as a corpus artifact (see SCALING.md
"join_range_bucketed (NOT measured at 100×…)" — now superseded by
this measurement).

Usage: SPARK_DRIVER_MEMORY=48g python scripts/scale100_datespread.py
(run SOLO — timing-sensitive; builds ~60 M lineitem rows in scratch)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_hive_batched_sink_spark.catalog import load_table
from flume_hive_batched_sink_spark.scratch import SCRATCH
from flume_hive_batched_sink_spark.session import get_spark
from scripts.scale_check import BASE_SF, KEYED, timed

K = 100
# > the sf0.1 date span (~2500 days 1995→2001): copies never co-bucket
DATE_SHIFT_DAYS = 3000
DATE_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}


def build_datespread(spark, k: int) -> str:
    out = os.path.join(SCRATCH, f"scale{k}x_datespread")
    for t in ("orders", "lineitem"):
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue  # idempotent across reruns — but ONLY on a dir
            # Spark committed (_SUCCESS); a crashed build's partial
            # dir must be rebuilt, not silently timed against
        base = load_table(spark, BASE_SF, t)
        parts = []
        for i in range(k):
            df = base
            for kc in KEYED[t]:
                df = df.withColumn(kc, F.col(kc) + F.lit(i * 100_000_000))
            for dc in DATE_COLS[t]:
                df = df.withColumn(
                    dc,
                    F.timestamp_seconds(
                        F.col(dc).cast("long")
                        + F.lit(i * DATE_SHIFT_DAYS * 86400)
                    ),
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    spark = get_spark(app_name="scale100-datespread")
    print(f"building {K}x date-spread orders/lineitem …", flush=True)
    scaled = build_datespread(spark, K)
    name = "join_range_bucketed"
    t1 = timed(spark, name, BASE_SF)
    spark.catalog.clearCache()
    tk = timed(spark, name, scaled)
    ratio = tk / t1 if t1 > 0 else float("nan")
    print(
        f"{name}: 1x={t1:.2f}s  {K}x-datespread={tk:.2f}s  "
        f"ratio={ratio:.1f} (linear≈{K})",
        flush=True,
    )


if __name__ == "__main__":
    main()
