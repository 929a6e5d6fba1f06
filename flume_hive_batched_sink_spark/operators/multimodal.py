"""B10/[NS] — multimodal columns.

Model: image/audio/video payloads are opaque `binary` columns with a
typed metadata struct alongside (the FIXTURES tables carry no real
media, so the payload is synthesized from `documents.text` bytes —
the Spark-side plumbing is the deliverable: schema, batch shape,
partitioning, Arrow transfer).

- `ns_multimodal_cols`: typed metadata derivation over the binary
  column — length, content hash, magic-byte sniff, plus element-wise
  avg-pool of the embedding column per label. Oracle-checked.
- `ns_multimodal_decode`: the decode / feature-extract path as a
  `mapInPandas` operator. Real decoding libs (PIL/librosa/av) are not
  in this container, so the decoder is pluggable: the default
  'fake' decoder is deterministic (byte stats standing in for pixel
  stats); 'pil' raises NotImplementedError at the exact seam where
  the real library call goes. Rows-only (Python hash fns aren't in
  DuckDB's dialect... they are — sha256 — so this one IS checked).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import davg, query, sql_davg, tbl


@query(
    "ns_multimodal_cols",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_hash,
           CASE WHEN text LIKE 'the %' THEN 'type_the' ELSE 'type_other' END
             AS sniffed_type
    FROM documents
    """,
)
def ns_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column + typed metadata: payload = utf8 bytes of
    text (stand-in for image bytes), metadata = length / content hash
    / magic-byte sniff. All JVM built-ins over the binary column."""
    d = tbl(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_hash"),
        F.when(F.col("text").like("the %"), "type_the")
        .otherwise("type_other")
        .alias("sniffed_type"),
    )


@query(
    "ns_multimodal_pool",
    f"""
    SELECT label, pos, {sql_davg('e', 'avg_val')}, COUNT(*) AS n_vecs
    FROM (
      SELECT label, i.i - 1 AS pos, CAST(embedding[i.i] AS DOUBLE) AS e
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i
    ) t
    GROUP BY label, pos
    """,
)
def ns_multimodal_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise avg-pool of embeddings per label (the 'average
    image feature per class' shape). posexplode → one hash aggregate
    on (label, pos); at 100 TB pre-aggregate per partition is free
    (partial agg) and nothing is collected."""
    em = tbl(spark, sf_dir, "embeddings")
    exploded = em.select(
        "label", F.posexplode("embedding").alias("pos", "e_raw")
    ).select(
        "label",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("e_raw").cast("double").alias("e"),
    )
    return exploded.groupBy("label", "pos").agg(
        davg("e", "avg_val"), F.count("*").alias("n_vecs")
    )


# ---------- decode / feature-extract plumbing (mapInPandas) ----------

DECODERS = {}


def register_decoder(name: str, fn) -> None:
    """Decoder: (payload: bytes) -> dict of features. Registered by
    name, mirroring the serde registry (A26)."""
    DECODERS[name] = fn


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: byte statistics
    in place of pixel statistics. Replace with a real decoder via
    register_decoder('pil', ...) when the library is present."""
    n = len(payload)
    return {
        "width": n % 640,
        "height": (n * 31) % 480,
        "mean_byte": (sum(payload) / n) if n else 0.0,
    }


def _pil_decode(payload: bytes) -> dict:
    raise NotImplementedError(
        "real image decode requires PIL, which is not in this container; "
        "pip-install pillow and register: "
        "register_decoder('pil', lambda b: ...Image.open(io.BytesIO(b))...)"
    )


def _headers_decode(payload: bytes) -> dict:
    """REAL (non-stub) decoder: pure-Python parse of PNG / WAV
    container headers — magic-byte sniff, then struct.unpack of the
    PNG IHDR width/height (big-endian, offset 16) or the WAV fmt
    chunk channels/sample-rate (little-endian, offsets 22/24). No
    native deps; proves the decoder seam composes beyond the 'fake'
    byte-stats stand-in with genuine binary decoding."""
    import struct

    out = {
        "kind": "unknown",
        "width": None,
        "height": None,
        "sample_rate": None,
        "channels": None,
    }
    # length guards before any unpack: a truncated payload that
    # passes the magic-byte sniff (e.g. a 20-byte PNG sig+IHDR tag)
    # must fall through to kind='unknown', not raise struct.error
    if (
        len(payload) >= 24
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        out.update(kind="png", width=w, height=h)
    elif (
        len(payload) >= 28
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        (ch,) = struct.unpack("<H", payload[22:24])
        (sr,) = struct.unpack("<I", payload[24:28])
        out.update(kind="wav", sample_rate=sr, channels=ch)
    return out


register_decoder("fake", _fake_decode)
register_decoder("pil", _pil_decode)
register_decoder("headers", _headers_decode)


def decode_features(
    df: DataFrame, payload_col: str = "payload", decoder: str = "fake"
) -> DataFrame:
    """mapInPandas decode: Arrow batches of binary payloads in, typed
    feature rows out. The batch shape (one pandas DataFrame per Arrow
    batch, iterator API → constant memory) is exactly what a real
    image/audio decode stage needs at scale; partitioning of the
    input df is preserved."""
    fn = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[payload_col].apply(
                lambda b: fn(bytes(b) if b is not None else b"")
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": feats.apply(lambda f: f["width"]).astype("int32"),
                    "height": feats.apply(lambda f: f["height"]).astype("int32"),
                    "mean_byte": feats.apply(lambda f: f["mean_byte"]).astype(
                        "float64"
                    ),
                }
            )
            yield out

    return df.mapInPandas(
        batches, schema="doc_id long, width int, height int, mean_byte double"
    )


FRAME_BYTES = 32
FRAME_STRIDE = 2  # keep every 2nd frame


@query(
    "ns_multimodal_framesample",
    f"""
    SELECT doc_id, (i.i - 1) AS frame_idx,
           sha256(substring(text, (i.i - 1) * {FRAME_BYTES} + 1,
                            {FRAME_BYTES})) AS frame_sha
    FROM documents,
         (SELECT unnest(range(1, (SELECT MAX(octet_length(encode(text)))
                                  FROM documents) // {FRAME_BYTES} + 2))
            AS i) i
    WHERE (i.i - 1) * {FRAME_BYTES} < octet_length(encode(text))
      AND (i.i - 1) % {FRAME_STRIDE} = 0
    """,
)
def ns_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque media payload (video stand-in):
    chunk the byte stream into fixed 32-byte frames, keep every 2nd,
    emit (doc_id, frame_idx, sha256(frame)).
    Runs as `mapInPandas` — the Arrow-batched iterator shape a real
    ffmpeg/PIL frame extractor plugs into; one output row per sampled
    frame, constant memory per batch. The fixture payload is ASCII
    text bytes, so the DuckDB oracle can express the same frames with
    string substring + sha256."""
    d = tbl(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for k in range(0, len(data), FRAME_BYTES * FRAME_STRIDE):
                    frame = data[k : k + FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(k // FRAME_BYTES)
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return with_payload.mapInPandas(
        batches, schema="doc_id long, frame_idx long, frame_sha string"
    )


def _le_bytes(col, nbytes: int):
    """Little-endian byte encoding of an integer column as BINARY,
    via per-byte hex → unhex (Spark has no native int→LE-bytes)."""
    parts = [
        F.lpad(F.hex((col.cast("bigint") / F.lit(256**i)).cast("bigint") % 256), 2, "0")
        for i in range(nbytes)
    ]
    return F.unhex(F.concat(*parts))


_WAV_RATES = [8000, 16000, 22050, 44100]


@query(
    "ns_multimodal_headers",
    f"""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS kind,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(n_chars % 640 + 1 AS BIGINT) END AS width,
           CASE WHEN doc_id % 2 = 0
                THEN CAST((n_chars * 7) % 480 + 1 AS BIGINT) END AS height,
           CASE WHEN doc_id % 2 = 1
                THEN CAST({_WAV_RATES}[CAST((doc_id // 2) % 4 AS INT) + 1]
                          AS BIGINT) END AS sample_rate,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(doc_id % 3 + 1 AS BIGINT) END AS channels
    FROM documents
    """,
)
def ns_multimodal_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip proof for the REAL 'headers' decoder: valid PNG /
    WAV container headers are CONSTRUCTED JVM-side with Spark binary
    built-ins (concat/unhex/lpad/hex — big-endian IHDR for even
    doc_ids, little-endian RIFF/fmt for odd), then DECODED back in
    mapInPandas by the registered pure-Python struct.unpack decoder.
    The DuckDB oracle computes the planted field values arithmetically
    from the source table, so a hash match proves encoder and decoder
    agree byte-for-byte on both container layouts — the cross-check a
    production media-ingest pipeline runs on its decode stage.

    Scale shape: payload synthesis is row-local codegen; the decode
    is one Arrow-batched mapInPandas pass (constant memory per batch,
    no shuffle anywhere). At 100 TB with real media bytes only the
    payload source changes — the decoder seam, batch shape, and plan
    are exactly this."""
    d = tbl(spark, sf_dir, "documents", parallel=True)
    even = F.col("doc_id") % 2 == 0
    width = (F.col("n_chars") % 640 + 1).cast("bigint")
    height = ((F.col("n_chars") * 7) % 480 + 1).cast("bigint")
    rate = F.element_at(
        F.array(*[F.lit(r) for r in _WAV_RATES]),
        (F.expr("doc_id div 2") % 4).cast("int") + 1,
    ).cast("bigint")
    channels = (F.col("doc_id") % 3 + 1).cast("bigint")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),          # signature
        F.unhex(F.lit("0000000D")),                  # IHDR length = 13
        F.encode(F.lit("IHDR"), "utf-8"),
        F.unhex(F.lpad(F.hex(width), 8, "0")),       # width, BE u32
        F.unhex(F.lpad(F.hex(height), 8, "0")),      # height, BE u32
        F.unhex(F.lit("0806000000")),                # depth/color/etc
    )
    wav = F.concat(
        F.encode(F.lit("RIFF"), "utf-8"),
        _le_bytes(F.lit(36), 4),                     # chunk size
        F.encode(F.lit("WAVE"), "utf-8"),
        F.encode(F.lit("fmt "), "utf-8"),
        _le_bytes(F.lit(16), 4),                     # fmt chunk size
        _le_bytes(F.lit(1), 2),                      # PCM
        _le_bytes(channels, 2),
        _le_bytes(rate, 4),
        _le_bytes(rate * channels * 2, 4),           # byte rate
        _le_bytes(channels * 2, 2),                  # block align
        _le_bytes(F.lit(16), 2),                     # bits/sample
    )
    with_payload = d.select(
        "doc_id", F.when(even, png).otherwise(wav).alias("payload")
    )
    fn = DECODERS["headers"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fn(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [f["kind"] for f in feats],
                    "width": pd.Series(
                        [f["width"] for f in feats], dtype="object"
                    ),
                    "height": pd.Series(
                        [f["height"] for f in feats], dtype="object"
                    ),
                    "sample_rate": pd.Series(
                        [f["sample_rate"] for f in feats], dtype="object"
                    ),
                    "channels": pd.Series(
                        [f["channels"] for f in feats], dtype="object"
                    ),
                }
            )

    return with_payload.mapInPandas(
        batches,
        schema="doc_id long, kind string, width long, height long, "
        "sample_rate long, channels long",
    )


@query(
    "ns_multimodal_decode",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 31) % 480 AS INT) AS height,
           CAST(list_sum(list_transform(string_split_regex(text, ''),
                                        c -> ascii(c))) AS DOUBLE)
             / octet_length(encode(text)) AS mean_byte
    FROM documents
    WHERE octet_length(encode(text)) > 0
    """,
)
def ns_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage over the synthesized binary column with the
    deterministic 'fake' decoder (ASCII fixture text ⇒ byte mean is
    exactly the oracle's int-sum / length — exact int arithmetic)."""
    d = tbl(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    ).filter(F.length(F.col("payload")) > 0)
    return decode_features(with_payload)
