"""Scaling check: time the heaviest queries at sf0.1 and at a K×
key-shifted blow-up of sf0.1, and report the time ratio per query.

A linear operator should show time ratio ≈ K (work grows with input);
a quadratic one shows ≈ K² — the at-scale red flag this script exists
to catch (the sf0.1 bench alone can't see curve shape).

The scaled dataset is synthetic-on-synthetic and used ONLY for curve
measurement, never for correctness (the oracle gate stays on the
driver's own parquet):

- facts (lineitem/orders/customer/supplier/events): K copies with all
  join keys shifted per copy — referential integrity preserved, join
  fan-outs identical, distributions unchanged.
- dims (region/nation/part): copied as-is (dims don't scale with the
  corpus; broadcast joins keep the same build side).
- documents: K copies with the text alphabet ROTATED per copy
  (`translate`), so shingles/tokens across copies are unrelated and
  dedup candidate volume scales like real independent text rather
  than a planted 10-way dup of every doc.
- embeddings: K identical copies with shifted vec_id — the honest
  stress for bucketed LSH (bucket sizes grow K×, candidate pairs K²×
  within each bucket; a corpus with real dup clusters behaves the
  same way).

Usage: python scripts/scale_check.py [K] [query ...]
(default K=10, default queries = the bench's 5 heaviest + sessionize)
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from flume_hive_batched_sink_spark import operators as ops
from flume_hive_batched_sink_spark.catalog import load_table
from flume_hive_batched_sink_spark.scratch import SCRATCH
from flume_hive_batched_sink_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
SHIFT = 100_000_000  # beyond any sf0.1 key

DEFAULT_QUERIES = [
    "agg_multi",
    "join_multiway",
    "agg_percentile",
    "sessionize",
    "ns_dedup_minhash",
    "ns_dedup_simhash",
    "ns_dedup_embedding",
    "ns_tfidf_topterms",
]

# per-table key columns to shift per copy (referential integrity)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
COPY_AS_IS = ["region", "nation", "part"]

_ALPHA = string.ascii_lowercase + string.ascii_uppercase


def _rotated(i: int) -> str:
    lo = string.ascii_lowercase[i:] + string.ascii_lowercase[:i]
    up = string.ascii_uppercase[i:] + string.ascii_uppercase[:i]
    return lo + up


def scaled_copy(df: DataFrame, table: str, i: int) -> DataFrame:
    for k in KEYED.get(table, []):
        df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
    if table == "documents" and i:
        df = df.withColumn("text", F.translate("text", _ALPHA, _rotated(i)))
    return df


def build_scaled(spark, k: int) -> str:
    out = os.path.join(SCRATCH, f"scale{k}x")
    for t in COPY_AS_IS + list(KEYED):
        src = os.path.join(BASE_SF, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = os.path.join(out, f"{t}.parquet")
        base = load_table(spark, BASE_SF, t)
        if t in COPY_AS_IS:
            base.write.mode("overwrite").parquet(dst)
            continue
        parts = [scaled_copy(base, t, i) for i in range(k)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(dst)
    return out


def timed(spark, name: str, sf_dir: str) -> float:
    fn = ops.QUERIES[name]
    # warmup once (JIT/codegen), then best-of-2 — same shape as bench.py
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scale-check")
    print(f"building {k}x dataset …", flush=True)
    scaled_dir = build_scaled(spark, k)
    rows = []
    for name in names:
        t1 = timed(spark, name, BASE_SF)
        spark.catalog.clearCache()
        tk = timed(spark, name, scaled_dir)
        spark.catalog.clearCache()
        ratio = tk / t1 if t1 > 0 else float("nan")
        rows.append((name, t1, tk, ratio))
        print(f"{name:24s} 1x={t1:6.2f}s  {k}x={tk:7.2f}s  "
              f"ratio={ratio:5.1f} (linear≈{k})", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    # merge with prior runs: keep one row per query (latest wins), so
    # partial re-measurements don't clobber the full table or the
    # hand-written analysis below it. Rows only merge when the prior
    # table used the SAME K — otherwise old ratios would be
    # mislabeled under the new header (a 10x-linear ratio≈10 reads
    # as quadratic under a K=3 header).
    merged: dict[str, tuple] = {}
    trailer = ""
    if os.path.exists(path):
        lines = open(path).read().splitlines()
        import re as _re

        m = _re.search(r"a (\d+)x key-shifted", lines[0]) if lines else None
        same_k = bool(m and int(m.group(1)) == k)
        # On a K mismatch only the TABLE ROWS are stale (a 10x ratio
        # reads as quadratic under a K=3 header) — the hand-written
        # analysis trailer below the table is preserved either way.
        seen_table = False
        for i, ln in enumerate(lines):
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            if len(cells) == 4 and cells[0] in ops.QUERIES:
                seen_table = True
                if same_k:
                    merged[cells[0]] = tuple(cells[1:])
            elif seen_table and ln and not ln.startswith("|"):
                trailer = "\n".join(lines[i:])
                break
        if not same_k and lines:
            print(
                f"note: prior SCALING.md measured a different K; its table "
                f"rows were discarded (analysis trailer preserved)"
            )
    for name, t1, tk, ratio in rows:
        merged[name] = (f"{t1:.2f}", f"{tk:.2f}", f"{ratio:.1f}")
    with open(path, "w") as f:
        f.write(
            f"# SCALING — wall-clock at sf0.1 vs a {k}x key-shifted "
            f"blow-up (local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])\n\n"
            "Generated by `python scripts/scale_check.py` (rows merge "
            "across invocations; latest measurement wins). A healthy "
            f"operator scales ≈ linearly (ratio ≈ {k}); ratios near "
            f"{k * k} mean quadratic work and would not survive 100 TB. "
            "Methodology mirrors bench.py (warmup + best-of-2); the "
            "scaled corpus construction is documented in the script "
            "docstring.\n\n"
            f"| query | 1x sec | {k}x sec | ratio (linear≈{k}) |\n"
            "|---|---|---|---|\n"
        )
        for name, cells in merged.items():
            f.write(f"| {name} | {cells[0]} | {cells[1]} | {cells[2]} |\n")
        if trailer:
            f.write("\n" + trailer + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
