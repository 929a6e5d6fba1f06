"""Capture .explain('formatted') output for named queries into
plans/r15/<query>_<tag>.txt — the before/after plan evidence the
optimization round commits next to each change.

Usage: python scripts/plan_capture.py <tag> query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_hive_batched_sink_spark import operators as ops  # noqa: E402
from flume_hive_batched_sink_spark.session import get_spark  # noqa: E402

tag = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r15",
)
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="plan_capture")
for name in names:
    df = ops.QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
