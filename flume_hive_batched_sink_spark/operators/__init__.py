"""Operator surface (SURVEY.md §2 Part B).

Importing this package registers every implemented query into
`registry.QUERIES` / `registry.ORACLE` — the dicts exported through
`__spark_entry__.py` to the driver's DuckDB-oracle harness.
"""

from . import (  # noqa: F401
    aggregates,
    analytics,
    bpe,
    clustering,
    curation,
    dedup,
    filters,
    graph,
    joins,
    multimodal,
    pipeline,
    scalar_funcs,
    scans,
    setops,
    similarity,
    textstats,
    udfs,
    windows,
)
from ..streaming import streaming_ops  # noqa: F401  (registers B8 queries)
from .registry import ORACLE, QUERIES  # noqa: F401
