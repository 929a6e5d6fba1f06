"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query with an oracle: run the PySpark version and
the DuckDB SQL on the same parquet tables, then compare row count,
sorted column names, and values exactly (stricter than the driver's
order-insensitive hash — if this passes, the hash passes).
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from flume_hive_batched_sink_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    # Pin the division/NaN semantic the oracle twins assume: with
    # ieee_floating_point_ops at its default, x/0.0 yields NULL (not
    # ±Inf) and 0.0/0.0 yields NULL (not NaN) — the semantic every
    # NULLIF-guarded twin (ts_anomaly_mad, stream_anomaly_alert) was
    # written against. Assert it here so a future DuckDB upgrade that
    # flips the default fails loudly at connection time instead of as
    # an inscrutable value mismatch in some op's parity check.
    div0, nan0 = con.execute("SELECT 1.0/0.0, 0.0/0.0").fetchone()
    assert div0 is None and nan0 is None, (
        "DuckDB float-division semantics changed: expected x/0.0 and "
        f"0.0/0.0 to be NULL, got {div0!r}/{nan0!r}; set "
        "ieee_floating_point_ops=false or update the oracle twins"
    )
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(rows, columns):
    """Sort columns by name, then rows — mirrors the driver compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return sorted(c for c in columns), out


def compare(spark_df, con, sql, allow_empty=False):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    sc, sr = normalize(s_rows, s_cols)
    dc, dr = normalize(d_rows, d_cols)
    problems = []
    if not sr and not dr and not allow_empty:
        # A 0-row match on BOTH engines is a vacuous green: the hash
        # check trivially passes while proving nothing about the
        # semantics (this class of bug shipped three times in r1-r4:
        # join_anti, join_theta_range, join_asof_tolerance). Queries
        # that are legitimately empty must opt in via allow_empty.
        problems.append("vacuous: 0 rows on both engines")
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duckdb={dc}")
    if len(sr) != len(dr):
        problems.append(f"row count differs: spark={len(sr)} duckdb={len(dr)}")
    if not problems and sr != dr:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                if n_bad < 3:
                    problems.append(f"row {i}: spark={a!r} duckdb={b!r}")
                n_bad += 1
        problems.append(f"{n_bad} mismatched rows of {len(sr)}")
    return problems
