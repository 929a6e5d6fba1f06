"""Pluggable text→typed-row parsing (the serde surface).

Reference: an abstract `TextDeserializer` subclass is loaded by class
name and initialized with the table schema from the metastore
(TextDeserializer.scala:44-68; reflection load
HiveBatchedSink.scala:244-257; `hive.serdeName` /
`hive.serdeProperties.*`, Config.scala:32-33). Each event body is
deserialized row-at-a-time into a `List[AnyRef]`.

Spark form: a registry of named *column transformations* — each
parser is `(column, ddl_schema, options) -> struct column`, applied
whole-batch with JVM built-ins (`from_json` / `from_csv` /
`regexp_extract`), not per-row virtual calls. User-defined parsers
register a `pandas_udf` (Arrow-vectorized) under a name, preserving
the reference's by-name pluggability without its row-at-a-time cost.

Schema language: DDL strings ("k int, v double") — the same shape as
the reference's comma-joined metastore `columns`/`columns.types`
properties (HiveUtils.scala:83-86).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# parser: (raw_column, ddl_schema, options) -> struct Column
Parser = Callable[[Column, str, dict], Column]

_REGISTRY: dict[str, Parser] = {}


def register_parser(name: str, fn: Parser) -> None:
    """Register a named parser (↔ serde class registration, A26)."""
    _REGISTRY[name] = fn


def get_parser(name: str) -> Parser:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no parser {name!r} registered; available: {sorted(_REGISTRY)}"
        ) from None


def list_parsers() -> list[str]:
    return sorted(_REGISTRY)


# --- builtin parsers (all JVM-side, zero Python in the hot path) ---


def _json(col: Column, schema: str, options: dict) -> Column:
    return F.from_json(col, schema, options or {})


def _csv(col: Column, schema: str, options: dict) -> Column:
    return F.from_csv(col, schema, options or {})


def _regex(col: Column, schema: str, options: dict) -> Column:
    """options['pattern'] with one capture group per schema field;
    fields are extracted as strings then cast per the DDL schema."""
    pattern = options["pattern"]
    fields = [f.strip() for f in schema.split(",")]
    parts = []
    for i, fld in enumerate(fields, start=1):
        fname, ftype = fld.rsplit(" ", 1)
        parts.append(
            F.regexp_extract(col, pattern, i).cast(ftype).alias(fname.strip())
        )
    return F.struct(*parts)


def _delimited(col: Column, schema: str, options: dict) -> Column:
    """Simple split-on-delimiter parser (the shape most reference serde
    subclasses implement over the raw Flume body)."""
    delim = options.get("delimiter", ",")
    split = F.split(col, F.lit(delim).cast("string"), -1)
    fields = [f.strip() for f in schema.split(",")]
    parts = []
    for i, fld in enumerate(fields):
        fname, ftype = fld.rsplit(" ", 1)
        parts.append(F.element_at(split, i + 1).cast(ftype).alias(fname.strip()))
    return F.struct(*parts)


register_parser("json", _json)
register_parser("csv", _csv)
register_parser("regex", _regex)
register_parser("delimited", _delimited)


def parse_column(raw: Column | str, serde_name: str, schema: str, **options) -> Column:
    """Apply a registered parser to a raw text column → struct column."""
    raw = F.col(raw) if isinstance(raw, str) else raw
    return get_parser(serde_name)(raw, schema, options)
