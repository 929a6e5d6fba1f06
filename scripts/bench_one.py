"""Isolated per-query timing for the optimization loop (guide §1).

Times the named queries exactly the way bench.py does — noop sink,
one warmup pass at the target SF, then best-of-N — but in a dedicated
JVM with only these queries, so a candidate change is measured
without the 94-query working set's GC/codegen pressure. Prints one
JSON line per query plus a total line.

Usage: python scripts/bench_one.py [-n N] query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_hive_batched_sink_spark import operators as ops  # noqa: E402
from flume_hive_batched_sink_spark.session import get_spark  # noqa: E402

args = sys.argv[1:]
n_runs = 2
if args and args[0] == "-n":
    args.pop(0)
    n_runs = int(args.pop(0))
names = args
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

bad = [n for n in names if n not in ops.QUERIES]
if bad or not names:
    print(f"unknown or missing queries: {bad}", file=sys.stderr)
    sys.exit(2)

spark = get_spark(app_name="bench_one")
out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"warmup {name}")
    ops.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    best = float("inf")
    for i in range(n_runs):
        spark.sparkContext.setJobDescription(f"timed {name} pass {i}")
        t0 = time.perf_counter()
        ops.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
    print(json.dumps({"query": name, "best_s": out[name], "n": n_runs}))
print(
    json.dumps(
        {"total_best_s": round(sum(out.values()), 3), "sf_dir": sf_dir}
    )
)
