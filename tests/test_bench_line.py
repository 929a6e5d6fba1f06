"""The driver-facing stdout JSON line (bench.py).

The driver captures only the LAST 2000 chars of bench output and
json-parses the final line; r12's line outgrew the window and parsed
as null, and r12-r14 "fixed" that by dropping the whole per-query map
— leaving the driver's PERF comparison blind (r14 verdict #1). These
tests pin the r15 behaviour: the line always fits, always carries a
queries map, and trims the NEWEST headline additions first so the
frozen comparable prefixes keep their per-query history.
"""

import importlib.util
import json
import os

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(_HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_full(benchmod, n=None):
    names = benchmod.HEADLINE if n is None else benchmod.HEADLINE[:n]
    timings = {name: 1.234 for name in names}
    full = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "ambient_other_jvms": 0,
        "ambient_load1": 1.0,
        "ambient_warning": False,
    }
    for key, k in benchmod.PREFIXES.items():
        if len(names) >= k:
            full[key] = round(sum(timings[m] for m in names[:k]), 3)
    return full


def test_line_fits_capture_window(benchmod):
    line = benchmod.build_stdout_line(_fake_full(benchmod))
    assert len(line) <= benchmod._LINE_MAX <= 1998  # 2000 - "\n" slack


def test_line_parses_and_has_required_contract_keys(benchmod):
    obj = json.loads(benchmod.build_stdout_line(_fake_full(benchmod)))
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in obj
    assert obj["unit"] == "sec"
    assert isinstance(obj["queries"], dict) and obj["queries"]


def test_trim_drops_newest_additions_first(benchmod):
    """Included names must be an exact prefix of HEADLINE: the frozen
    comparable sets (r01=15, r02=20, r04=24, r06=36) survive; only
    the newest additions are trimmed, and the trim is flagged."""
    obj = json.loads(benchmod.build_stdout_line(_fake_full(benchmod)))
    names = list(obj["queries"])
    assert names == benchmod.HEADLINE[: len(names)]
    assert len(names) >= 36  # r06 frozen prefix always fits
    omitted = len(benchmod.HEADLINE) - len(names)
    if omitted:
        assert obj["q_omitted"] == omitted
        assert obj["queries_in"] == "BENCH_full.json"


def test_small_set_is_not_trimmed(benchmod):
    """A map that fits goes out whole, without trim markers."""
    obj = json.loads(
        benchmod.build_stdout_line(_fake_full(benchmod, n=20))
    )
    assert len(obj["queries"]) == 20
    assert "q_omitted" not in obj


def test_subtotals_survive_trimming(benchmod):
    """Frozen-prefix subtotals are the driver's round-over-round
    comparable and must stay on the line even when queries trim."""
    obj = json.loads(benchmod.build_stdout_line(_fake_full(benchmod)))
    for key in benchmod.PREFIXES:
        assert key in obj
