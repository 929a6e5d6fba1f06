"""Driver-check staleness report: which round last verified each op.

The driver verifies only the FIRST 50 entries of `queries()` per
round (CORRECTNESS_r{N}.json). This script walks every committed
CORRECTNESS_r*.json, computes each registered operator's LATEST
driver check (and whether it was a hash pass or rows-only), and
prints the staleness histogram plus the oldest cohort — the
mechanical input for composing the next round's front window
(__spark_entry__._ROUND{N}_FRONT). Never-checked operators (added
this round) sort first.

Usage: python scripts/staleness.py [N]   (N = suggested window size)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from flume_hive_batched_sink_spark.operators import QUERIES

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            err = rec.get("err")
            # A valid driver check = no exception (err None, or the
            # by-design 'no_oracle' rows-only path) AND no recorded
            # mismatch (rows/schema/hash booleans, null on rows-only
            # records, must not be False). A MISMATCH is the opposite
            # of verified — counting it as fresh would keep the one
            # operator that most needs re-checking out of the window.
            exc = err and err != "no_oracle"
            mismatch = any(
                rec.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            if exc or mismatch:
                detail = (err.splitlines()[-1][:90] if exc
                          else "rows/schema/hash mismatch")
                print(f"NOTE: {name} r{rnd:02d} NOT a pass: {detail}")
                continue
            latest[name] = max(latest.get(name, 0), rnd)

    hist: dict[int, list[str]] = {}
    for name in QUERIES:
        hist.setdefault(latest.get(name, 0), []).append(name)

    print(f"{len(QUERIES)} registered operators; latest driver check:")
    for rnd in sorted(hist):
        label = f"r{rnd:02d}" if rnd else "never"
        print(f"  {label}: {len(hist[rnd])}")
    print()
    ranked = sorted(QUERIES, key=lambda n: (latest.get(n, 0), n))
    print(f"oldest {window} (front-window candidates, never-checked first):")
    for name in ranked[:window]:
        rnd = latest.get(name, 0)
        label = f"r{rnd:02d}" if rnd else "never"
        print(f"  {label}  {name}")


if __name__ == "__main__":
    main()
