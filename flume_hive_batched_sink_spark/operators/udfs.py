"""B9 — UDF / UDAF / UDTF surface.

The reference's single extension point is the serde class loaded by
name (A26, HiveBatchedSink.scala:244-257). The engine exposes the
full PySpark trio — all Arrow-vectorized, never row-at-a-time:
- scalar `pandas_udf`  (UDF)
- GROUPED_AGG `pandas_udf` (UDAF)
- `applyInPandas` grouped map (UDTF-equivalent)
- a user-registered pandas parser in the serde registry (A26 parity)

UDF objects are created lazily (pandas_udf needs an active session,
and parsing the DDL return type requires a SparkContext).

Determinism note: UDAF/UDTF bodies stick to exact arithmetic (int64
sums, min/max) or row-level float ops so the DuckDB oracle matches
bit-for-bit; a float mean inside pandas would disagree with SQL in
the low bits (numpy pairwise vs sequential summation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parse import parse_column, register_parser
from .registry import query, tbl


def make_add_ten_pct():
    @F.pandas_udf("double")
    def add_ten_pct(v: pd.Series) -> pd.Series:
        """Vectorized scalar UDF: one IEEE multiply per row."""
        return v * 1.1

    return add_ten_pct


@query(
    "udf_scalar_pandas",
    """
    SELECT event_id, value, value * 1.1 AS boosted
    FROM events
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    add_ten_pct = make_add_ten_pct()
    return ev.select("event_id", "value", add_ten_pct("value").alias("boosted"))


@query(
    "udaf_grouped_agg",
    """
    SELECT event_type,
           CAST(SUM(user_id) AS BIGINT) AS total_uid,
           CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (int64-exact bodies)."""

    @F.pandas_udf("long")
    def sum_uid(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("long")
    def n_high(v: pd.Series) -> int:
        return int((v > 100.0).sum())

    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        sum_uid("user_id").alias("total_uid"),
        n_high("value").alias("n_high_value"),
    )


def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    lo = pdf["value"].min()
    hi = pdf["value"].max()
    span = hi - lo
    pdf = pdf.copy()
    pdf["value_norm"] = 0.0 if span == 0 else (pdf["value"] - lo) / span
    return pdf[["event_id", "event_type", "value", "value_norm"]]


@query(
    "udtf_apply_in_pandas",
    """
    SELECT event_id, event_type, value,
           CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS value_norm
    FROM (
      SELECT event_id, event_type, value,
             MIN(value) OVER (PARTITION BY event_type) AS mn,
             MAX(value) OVER (PARTITION BY event_type) AS mx
      FROM events
    ) t
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (UDTF-equivalent): min-max normalize per category.
    min/max are exact; the normalization is row-level IEEE — matches
    the SQL window formulation exactly."""
    ev = tbl(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _minmax_normalize,
        schema="event_id long, event_type string, value double, value_norm double",
    )


# --- A26 parity: a user parser registered by name ---


def _kv_parser(col, schema: str, options: dict):
    """User serde plugin: parses 'k=v;k2=v2' text via a pandas UDF.
    Demonstrates the registry path a custom Flume serde subclass
    would take (TextDeserializer.scala:68)."""
    fields = [f.strip().rsplit(" ", 1) for f in schema.split(",")]

    @F.pandas_udf("struct<" + ",".join(f"{n}:{t}" for n, t in fields) + ">")
    def parse(s: pd.Series) -> pd.DataFrame:
        out = {}
        split = s.str.split(";").apply(
            lambda parts: dict(p.split("=", 1) for p in parts if "=" in p)
        )
        for name, typ in fields:
            vals = split.apply(lambda d, n=name: d.get(n))
            if typ in ("bigint", "long", "int"):
                vals = pd.to_numeric(vals, errors="coerce").astype("Int64")
            out[name] = vals
        return pd.DataFrame(out)

    return parse(col)


register_parser("kv_pandas", _kv_parser)


@query(
    "udf_serde_plugin",
    """
    SELECT event_id,
           regexp_extract(body, 'type=([^;]*)', 1) AS p_type,
           CAST(regexp_extract(body, 'uid=([^;]*)', 1) AS BIGINT) AS p_uid
    FROM (
      SELECT event_id,
             concat('type=', event_type, ';uid=', CAST(user_id AS VARCHAR)) AS body
      FROM events
    ) t
    """,
)
def udf_serde_plugin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26: by-name pluggable parser applied to raw text bodies."""
    ev = tbl(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.concat(
            F.lit("type="), F.col("event_type"), F.lit(";uid="), F.col("user_id")
        ).alias("body"),
    )
    parsed = raw.select(
        "event_id",
        # schema field names address the k=v keys in the body (the
        # serde-properties mapping a real plugin would carry)
        parse_column("body", "kv_pandas", "type string, uid bigint").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.type").alias("p_type"),
        F.col("p.uid").alias("p_uid"),
    )


def make_chunk_docs():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx int, n_tokens int, first_tok string",
        useArrow=True,
    )
    class ChunkDocs:
        """Arrow-optimized Python UDTF: split a document into
        fixed-32-token chunks, one output row per chunk."""

        def eval(self, text: str):  # noqa: D401
            toks = text.split(" ")
            for ci in range(0, len(toks), 32):
                chunk = toks[ci : ci + 32]
                yield ci // 32, len(chunk), chunk[0]

    return ChunkDocs


@query(
    "udtf_python_lateral",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    )
    SELECT doc_id,
           CAST(ci // 32 AS INT) AS chunk_idx,
           CAST(CASE WHEN len(ts) - ci < 32 THEN len(ts) - ci ELSE 32 END
                AS INT) AS n_tokens,
           ts[ci + 1] AS first_tok
    FROM (SELECT doc_id, ts, unnest(range(0, len(ts), 32)) AS ci FROM toks)
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 `@udtf`, Arrow-enabled) invoked
    with LATERAL — the third UDTF shape beside applyInPandas
    (grouped) and mapInPandas (partition-wise): a correlated
    per-row table function, here chunking documents into 32-token
    windows (the sequence-chunking step before tokenization in
    training pipelines; ns_pack_sequences then packs the chunks).
    The UDTF body is pure per-row Python generating bounded output
    (⌈n_tokens/32⌉ rows), shipped over Arrow batches; the lateral
    join stays partition-local — no shuffle until a downstream agg.
    For hot paths the same semantics compile to posexplode (see
    lateral_explode); this row is the EXTENSIBILITY seam the
    reference exposed as its serde class (A26)."""
    d = tbl(spark, sf_dir, "documents", parallel=True)
    spark.udtf.register("chunk_docs", make_chunk_docs())
    d.select("doc_id", "text").createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT i.doc_id, c.chunk_idx, c.n_tokens, c.first_tok
        FROM udtf_docs_in i, LATERAL chunk_docs(i.text) c
        """
    )


@query(
    "udtf_arrow_map",
    """
    SELECT event_id,
           (event_id * 31 + user_id) % 1000000007 AS route_key,
           CAST(length(props) AS BIGINT) AS props_len
    FROM events
    """,
)
def udtf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow`: the zero-copy batch path below even pandas —
    the transform touches pyarrow Arrays directly (no Series
    conversion, no index, no copy), which is the right lane for
    byte/hash-level per-row work on very wide batches. The body
    sticks to exact int64 arithmetic (an affine route key mod a
    prime, a UTF-8 length) so the DuckDB oracle matches
    bit-for-bit — demonstrating that even the lowest-level Python
    extension point can stay oracle-verified. pyarrow lacks a
    modulo kernel, so mod is divide/multiply/subtract (exact in
    int64 — C-style truncating division on positives)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = tbl(spark, sf_dir, "events").select("event_id", "user_id", "props")

    def route(batches):
        m = pa.scalar(1_000_000_007, pa.int64())
        for batch in batches:
            eid = pc.cast(batch.column(0), pa.int64())
            uid = pc.cast(batch.column(1), pa.int64())
            affine = pc.add(pc.multiply(eid, pa.scalar(31, pa.int64())), uid)
            key = pc.subtract(
                affine, pc.multiply(pc.divide(affine, m), m)
            )
            plen = pc.cast(pc.utf8_length(batch.column(2)), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [eid, key, plen], ["event_id", "route_key", "props_len"]
            )

    return ev.mapInArrow(
        route, "event_id long, route_key long, props_len long"
    )


def make_tier_classifier():
    """SCALAR_ITER pandas UDF — the inference-serving shape: the
    'model' (here a threshold table; in production a tokenizer or
    ONNX session) is loaded ONCE per executor task, then reused
    across every Arrow batch the iterator yields. A plain SCALAR UDF
    would re-enter Python per batch with no amortization seam; this
    is the extension point where per-task model-load cost is paid
    once against millions of rows."""

    @F.pandas_udf("string")
    def tier_of(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = {"hot": 300.0, "warm": 100.0}  # loaded once per task
        for v in batches:
            tiers = pd.cut(
                v,
                bins=[float("-inf"), model["warm"], model["hot"],
                      float("inf")],
                labels=["cold", "warm", "hot"],
            )
            # Everything pd.cut could not bin — NULL/NaN inputs AND
            # -inf (the first bin is left-OPEN, so -inf falls outside
            # every bin) — is NaN here; the oracle CASE falls through
            # every > comparison to ELSE 'cold' for all of them, so
            # fill on the BINNED series, not on v.isna() (which would
            # miss -inf and ship the literal string 'nan').
            yield (
                pd.Series(tiers.astype(object), index=v.index)
                .fillna("cold")
                .astype(str)
            )

    return tier_of


@query(
    "udf_scalar_iter",
    """
    SELECT event_id, value,
           CASE WHEN value > 300.0 THEN 'hot'
                WHEN value > 100.0 THEN 'warm'
                ELSE 'cold' END AS tier
    FROM events
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF (SCALAR_ITER): value-tier
    classification against a per-task-loaded model table (see
    make_tier_classifier). The oracle states the semantics as a CASE
    expression; the Spark path proves the Arrow iterator machinery
    yields identical labels batch-by-batch."""
    ev = tbl(spark, sf_dir, "events", parallel=True)
    return ev.select(
        "event_id", "value", tier_expr(F.col("value")).alias("tier")
    )


def tier_expr(value: Column) -> Column:
    """The full tier expression (NaN normalization + SCALAR_ITER
    classifier) — one definition shared by the operator and the
    non-finite-input edge test. Arrow->pandas folds BOTH SQL NULL
    and real NaN into NaN in the float64 series, but the oracle CASE
    treats them differently (NaN > 300 is TRUE under the engines'
    NaN-greatest total order -> 'hot'; NULL falls through ->
    'cold'). Normalize NaN to +inf JVM-side, where the two are still
    distinguishable — same tier ('hot'); NULLs still reach the UDF
    as NaN -> 'cold'."""
    global _TIER_OF
    if _TIER_OF is None:
        # lazily-created shared instance (pandas_udf decoration needs
        # an active SparkSession, so it can't happen at import time):
        # the operator and the edge test run the same registered
        # function instead of per-call re-decorations.
        _TIER_OF = make_tier_classifier()
    return _TIER_OF(
        F.when(F.isnan(value), F.lit(float("inf"))).otherwise(value)
    )


_TIER_OF = None
