"""Drive queries() vs oracle_sql() the way the driver's t2 gate does.

Usage: python scripts/drive_oracle.py [sf_dir] [name ...]
(default sf0.01, all queries; trailing names restrict the run —
`front` expands to the current round's fronted window.)
Prints per-query OK/MISMATCH/ERROR + timing and a final BAD count.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as e
from tests.oracle_harness import compare, duck_connection

_args = sys.argv[1:]
# Classify argv[1] by REGISTRY membership first, path shape second: a
# query name or `front` is a name filter even if a same-named
# directory happens to exist in cwd; otherwise it must be an existing
# directory (or contain '/'), and anything else is an explicit error
# rather than a silent misroute.
_DEFAULT_SF = "/root/testdata/sf0.01"
if not _args:
    SF = _DEFAULT_SF
elif _args[0] == "front" or _args[0] in e.queries():
    SF = _DEFAULT_SF
elif "/" in _args[0] or os.path.isdir(_args[0]):
    SF = _args.pop(0)
else:
    print(
        f"argv[1] {_args[0]!r} is neither a registered query name, "
        f"'front', nor an existing sf directory",
        file=sys.stderr,
    )
    sys.exit(2)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duck_connection(SF)
qs, osql = e.queries(), e.oracle_sql()
only = set(_args)
if "front" in only:
    only = (only - {"front"}) | set(e.FRONT)
if only:
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not silently yield a 0-query "BAD: 0"
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    qs = {n: f for n, f in qs.items() if n in only}
bad = []
for name in sorted(qs):
    t0 = time.time()
    try:
        df = qs[name](spark, SF)
        if name in osql:
            problems = compare(df, con, osql[name])
            status = "OK" if not problems else "MISMATCH"
            if problems:
                bad.append((name, problems[:2]))
        else:
            status = f"ROWS_ONLY n={df.count()}"
    except Exception as ex:  # noqa: BLE001
        status = f"ERROR {type(ex).__name__}: {str(ex)[:100]}"
        bad.append((name, [status]))
    print(f"{name:28s} {status:16s} {time.time() - t0:5.1f}s", flush=True)
print("BAD:", len(bad))
for n, p in bad:
    print(" ", n, p)
sys.exit(1 if bad else 0)
