"""Pandas-level parity sweep: replicate the driver's canonicalization.

The driver converts both the Spark result (toPandas) and the DuckDB
oracle result (.df()) to pandas, sorts columns+rows, and hashes the
values. Equal Python values are NOT enough — dtype drift breaks the
hash (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs Spark int64).

This sweep flags, for every oracle-checked query:
  - pandas dtype differences between the two sides
  - unhashable cells (array/list columns) that crash pandas sort
  - pd.util.hash mismatches after sort-canon

Usage: python scripts/pandas_parity.py [--json OUT.json] [sf_dir] [query ...]

`--json OUT.json` persists the sweep as an auditable per-round
artifact (CORRECTNESS_LOCAL_r{N}.json): per-query verdict + row count
+ elapsed, so every oracle-backed operator carries a committed local
correctness record each round regardless of its position in the
driver's 50-slot window.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e
from tests.oracle_harness import duck_connection

_args = sys.argv[1:]
JSON_OUT = None
if _args and _args[0] == "--json":
    _args.pop(0)
    JSON_OUT = _args.pop(0)
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Spark toPandas yields datetime64[ns], DuckDB .df() datetime64[us].
    # The driver's canon tolerates this (upsert_last_write_wins was
    # driver-green in r01 with a raw timestamp column), so normalize
    # units instead of flagging them.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(list(df.columns))
    return df.reset_index(drop=True)


con = duck_connection(SF)
qs, osql = e.queries(), e.oracle_sql()
# resolve 'front' and reject typos — a filter that matches nothing
# must not print a vacuous "BAD: 0" (same contract as drive_oracle)
if "front" in ONLY:
    ONLY = (ONLY - {"front"}) | set(e.FRONT)
unknown = ONLY - set(qs)
if unknown:
    print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
    sys.exit(2)
bad = []
results = {}
for name in sorted(qs):
    if ONLY and name not in ONLY:
        continue
    if name not in osql:
        continue
    t0 = time.time()
    problems = []
    n_rows = None
    try:
        s = canon(qs[name](spark, SF).toPandas())
        d = canon(con.execute(osql[name]).df())
        n_rows = int(len(s))
        if len(s) != len(d):
            problems.append(f"rows {len(s)} vs {len(d)}")
        sd = dict(s.dtypes.astype(str))
        dd = dict(d.dtypes.astype(str))
        if sd != dd:
            problems.append(
                "dtypes "
                + str({k: (sd.get(k), dd.get(k)) for k in sd if sd.get(k) != dd.get(k)})
            )
        if not problems and not s.equals(d):
            problems.append("values differ after canon")
        if not problems:
            hs = pd.util.hash_pandas_object(s, index=False).sum()
            hd = pd.util.hash_pandas_object(d, index=False).sum()
            if hs != hd:
                problems.append("pd hash differs")
    except Exception as ex:  # noqa: BLE001
        problems.append(f"ERROR {type(ex).__name__}: {str(ex)[:120]}")
    status = "OK" if not problems else "; ".join(problems)
    if problems:
        bad.append(name)
    results[name] = {
        "ok": not problems,
        "rows": n_rows,
        "problems": problems,
        "elapsed_sec": round(time.time() - t0, 2),
    }
    print(f"{name:28s} {status} [{time.time() - t0:4.1f}s]", flush=True)
print("BAD:", len(bad), bad)
if JSON_OUT:
    rows_only = sorted(n for n in qs if n not in osql)
    payload = {
        "sf_dir": SF,
        "check": "pandas value-equality + dtype + pd-hash "
                 "(strict superset of the driver's hash gate)",
        "n_checked": len(results),
        "n_bad": len(bad),
        "bad": bad,
        "rows_only_not_checked_here": rows_only,
        "queries": results,
    }
    with open(JSON_OUT, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print("wrote", JSON_OUT)
sys.exit(1 if bad else 0)
