"""Pandas-level parity sweep: replicate the driver's canonicalization.

The driver converts both the Spark result (toPandas) and the DuckDB
oracle result (.df()) to pandas, sorts columns+rows, and hashes the
values. Equal Python values are NOT enough — dtype drift breaks the
hash (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs Spark int64).

This sweep flags, for every oracle-checked query:
  - pandas dtype differences between the two sides
  - unhashable cells (array/list columns) that crash pandas sort
  - pd.util.hash mismatches after sort-canon

Usage: python scripts/pandas_parity.py [sf_dir] [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e
from tests.oracle_harness import duck_connection

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

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
for name in sorted(qs):
    if ONLY and name not in ONLY:
        continue
    if name not in osql:
        continue
    t0 = time.time()
    problems = []
    try:
        s = canon(qs[name](spark, SF).toPandas())
        d = canon(con.execute(osql[name]).df())
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
    print(f"{name:28s} {status} [{time.time() - t0:4.1f}s]", flush=True)
print("BAD:", len(bad), bad)
sys.exit(1 if bad else 0)
