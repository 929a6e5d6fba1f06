"""The main correctness gate, locally: every query with an oracle must
match DuckDB exactly (value-equal, stricter than the driver's hash).
Queries without an oracle must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from flume_hive_batched_sink_spark import operators as ops

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

WITH_ORACLE = sorted(n for n in ops.QUERIES if n in ops.ORACLE)
# Empty since r8 (185/185 oracle-backed); kept so any future operator
# registered without a twin still gets at least the runs-and-has-
# schema check (the parametrize auto-skips while the list is empty).
ROWS_ONLY = sorted(n for n in ops.QUERIES if n not in ops.ORACLE)

# Queries allowed to return 0 rows at the test SF (vacuity guard
# opt-out). Currently none: every oracle-backed query must produce
# rows, so a both-engines-empty hash match can never masquerade as a
# meaningful green again.
VACUITY_ALLOWED: frozenset[str] = frozenset()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    df = ops.QUERIES[name](spark, SF_ORACLE)
    problems = compare(
        df, duck, ops.ORACLE[name], allow_empty=name in VACUITY_ALLOWED
    )
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = ops.QUERIES[name](spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
