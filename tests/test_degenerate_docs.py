"""Degenerate-document regressions the sf fixtures never exercise.

The r11 ADVICE found the class-transition count was built on
`sequence(1, n_chars - 1)`, which for a 1-char document yields the
DESCENDING sequence [1, 0] in Spark (and [1, 0, -1] for an empty one)
— one-or-more phantom transitions where the DuckDB oracle's
`range(1, length(cls))` is empty. The sf corpora only carry docs
>= 44 chars, so the driver gate never saw it; these tests pin the
cross-engine contract on 0/1-char docs for ALL THREE call sites
(ns_ocr_noise, ns_curation_verdict, stream_quality_gate).

Also pins the BPE merge-exhaustion contract: on a corpus with fewer
merges than the registered round count BOTH engines must fail loudly
(Spark `_require_rounds` ValueError, oracle `error()`), never
hash-mismatch or NULL-poison (bpe.py:169 / _sql_emit).
"""

from __future__ import annotations

import pytest

from flume_hive_batched_sink_spark import operators as ops

from .oracle_harness import compare, duck_connection

# A clean >=120-char sentence: passes the length screen, low
# transition ratio, shared verbatim by docs 4 and 5 (a planted dup).
_CLEAN = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows gently past the quiet village in the warm evening light"
)
assert len(_CLEAN) >= 120
# A long alternating letter-digit string: ratio 1.0 > tau, noisy.
_NOISY = "a1" * 70


def _write_docs(path: str, docs: list[tuple]) -> None:
    """Single-file parquet (the testdata layout both engines read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*docs))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        f"{path}/documents.parquet",
    )


def _write_corpus(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    _write_docs(
        path,
        [
            (1, "a", "en", "web", 1),   # 1 char: the phantom-transition row
            (2, "", "en", "web", 0),    # empty: sequence(1, -1) is worse
            (3, "a1", "en", "web", 2),  # 2 chars, 1 real transition
            (4, _CLEAN, "en", "web", len(_CLEAN)),
            (5, _CLEAN, "en", "news", len(_CLEAN)),  # exact dup of 4
            (6, _NOISY, "en", "web", len(_NOISY)),
        ],
    )
    # doc-aligned embeddings (vec_id == doc_id) so the verdict's
    # outlier screen joins 1:1; exact-in-float32 values.
    emb = [
        [float(((i * 7 + j) % 9) - 4) * 0.25 for j in range(64)]
        for i in range(1, 7)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(1, 7), pa.int64()),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": pa.array([i % 3 for i in range(1, 7)], pa.int32()),
            }
        ),
        f"{path}/embeddings.parquet",
    )


@pytest.fixture()
def corpus(tmp_path):
    _write_corpus(str(tmp_path))
    con = duck_connection(str(tmp_path))
    yield str(tmp_path), con
    con.close()


@pytest.mark.parametrize(
    "name", ["ns_ocr_noise", "ns_curation_verdict", "stream_quality_gate"]
)
def test_transition_screens_match_oracle_on_degenerate_docs(
    spark, corpus, name
):
    sf_dir, con = corpus
    df = ops.QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ops.ORACLE[name])
    assert not problems, f"{name}: {problems}"


def test_short_docs_are_not_phantom_noisy(spark, corpus):
    sf_dir, _con = corpus
    rows = {
        r.doc_id: r
        for r in ops.QUERIES["ns_ocr_noise"](spark, sf_dir).collect()
    }
    # 0- and 1-char docs have no adjacent positions: zero transitions,
    # ratio 0, never noisy (the unguarded sequence(1, 0) said 1/1.0/1).
    for d in (1, 2):
        assert rows[d].n_transitions == 0, rows[d]
        assert rows[d].transition_ratio == 0.0, rows[d]
        assert rows[d].is_noisy == 0, rows[d]
    # the 2-char boundary case still counts its one real transition
    assert rows[3].n_transitions == 1 and rows[3].is_noisy == 1
    assert rows[6].is_noisy == 1 and rows[4].is_noisy == 0


def test_bpe_exhaustion_fails_loudly_on_both_engines(spark, tmp_path):
    """One repeated 2-char word exhausts BPE after a single merge;
    the registered 2-round geometry must fail LOUDLY on both sides."""
    import duckdb

    _write_docs(
        str(tmp_path),
        [(i, "ab ab", "en", "web", 5) for i in range(1, 4)],
    )
    with pytest.raises(ValueError, match="corpus exhausted"):
        ops.QUERIES["ns_bpe_merges"](spark, str(tmp_path)).collect()
    con = duck_connection(str(tmp_path))
    try:
        with pytest.raises(duckdb.Error, match="corpus exhausted"):
            con.execute(ops.ORACLE["ns_bpe_merges"]).fetchall()
    finally:
        con.close()
