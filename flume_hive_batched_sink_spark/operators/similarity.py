"""B10/[NS] — similarity search over `embeddings` (64-dim float).

- `ns_similarity_topk`: brute-force cosine top-k — the correctness
  baseline. Query side is tiny (broadcast); dot products are computed
  with `zip_with` + an exact decimal fold so the DuckDB oracle hashes
  identically; ranking carries a unique tiebreak.
- `ns_similarity_ann_lsh`: the scale path — multi-band random-
  hyperplane LSH (4 bands × 8-plane sign sketches); candidates share
  ANY band bucket (OR-amplified recall). At 100 TB: (band, bucket)
  is the shuffle key; brute force never leaves a bucket. Hyperplanes
  are seeded numpy constants shipped as literals (no RNG inside the
  plan — resume/retry safe).
- `ns_dedup_embedding`: cosine ≥ τ near-dup pairs (embedding-space
  dedup), exact decimal dot products, oracle-checked.

`F.aggregate`/`zip_with` keep everything JVM-side; no Python UDF in
any hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import (
    persist_evicting,
    query,
    tbl,
    unrolled_dot_enabled,
)

# precision 25 keeps decimal addition below Spark's 38-digit cap, so
# the fold never rescales (stays exact); |values| here are ≪ 10^13.
_DEC = "decimal(25,12)"


def _dot_dec(a: Column, b: Column, dim: int = 64) -> Column:
    """Exact dot product: per-element double multiply (IEEE, identical
    in both engines) → decimal(25,12) → exact sum → double.

    Two physical strategies behind `unrolled_dot_enabled()` (the
    SPARK_GRAFT_UNROLLED_DOT=1 knob, registry.py):
    - OFF (default): interpreted `zip_with`+`aggregate` HOF fold —
      zero compile cost; per-row penalty bounded by the candidate
      count (banded LSH keeps candidates ≪ |corpus|²). Right for
      short local runs: the unrolled decimal tree's Janino compile
      (~15 s per heavy plan, measured r9) made the similarity queries
      3-5× slower END-TO-END at sf0.1 despite ~2× faster rows.
    - ON: balanced GetArrayItem·multiply·decimal-add tree, fully
      codegen'd. Decimal addition is EXACT, hence associative, so the
      balanced tree returns the bit-identical value the left fold
      does — oracle parity is knob-independent (property-tested).
      Right for long-running 100 TB jobs where compile amortizes to
      zero and the dot product is hot.

    Degenerate-input parity (r10 code review, two passes): indexing
    past the end of a SHORT array must behave like the fold — element
    access is `F.get` (NULL out of bounds; `getItem` THROWS under
    ANSI mode), and a tree term becomes an exact decimal zero ONLY
    when the position is out of bounds on BOTH sides (the fold's zip
    simply has no such term; adding 0 is exact). The OOB test is on
    array SIZE, not value NULL-ness: an IN-RANGE element pair that is
    genuinely NULL must poison the sum to NULL exactly like the
    fold's NULL product does (pass 2 caught the isNull() shortcut
    treating those as zeros). Length-MISMATCHED pairs poison via the
    one-sided NULL product, matching zip_with's padding. Arrays
    LONGER than `dim` are out of schema contract (FIXTURES.md pins
    64) — `dim` is the schema width, not a cap."""
    if unrolled_dot_enabled():
        terms = [
            F.when(
                (F.lit(i) >= F.size(a)) & (F.lit(i) >= F.size(b)),
                F.lit(0).cast(_DEC),
            )
            .otherwise(
                (F.get(a, i).cast("double") * F.get(b, i).cast("double"))
                .cast(_DEC)
            )
            for i in range(dim)
        ]
        while len(terms) > 1:  # balanced: keeps codegen depth log(dim)
            terms = [
                (terms[i] + terms[i + 1]).cast(_DEC)
                if i + 1 < len(terms)
                else terms[i]
                for i in range(0, len(terms), 2)
            ]
        return terms[0].cast("double")
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, p: (acc + p).cast(_DEC)
    ).cast("double")


def _norm(a: Column) -> Column:
    return F.sqrt(_dot_dec(a, a))


def unrolled_left_chain(term, dim: int) -> Column:
    """LEFT-ASSOCIATED sum of term(0) + term(1) + ... + term(dim-1) as
    a flat expression chain. The association is load-bearing: double
    adds are order-sensitive, and every oracle twin replays a LEFT
    fold (list_reduce), so all unrolled double chains in the repo
    (_dot_dbl here, clustering's _sqdiff_cols / _sqdiff_chain knob
    branch) MUST route through this one helper — a balanced or
    reordered copy would silently break hash parity for just the
    operators using that copy (r10 code review: three hand-rolled
    twins collapsed into this)."""
    out = term(0)
    for i in range(1, dim):
        out = out + term(i)
    return out


def _dot_dbl(a: Column, b: Column, dim: int = 64) -> Column:
    """Plain double dot product as an UNROLLED fixed-width sum.
    Unlike the `F.aggregate` HOF fold (CodegenFallback → interpreted
    per row), a flat GetArrayItem-multiply-add expression stays inside
    whole-stage codegen; with doubles the generated method is small,
    so the Janino-compile concern that rules out the unrolled DECIMAL
    tree (see `_dot_dec`) does not apply. Use for screens and ranking
    where the value is never output — summation-order low bits differ
    from the exact fold, so it must not feed oracle-compared columns."""
    return unrolled_left_chain(
        lambda i: F.get(a, i).cast("double") * F.get(b, i).cast("double"),
        dim,
    )


# DuckDB twin: unnest both lists positionally via a range join.
# All double→decimal casts route through VARCHAR: Spark's cast rounds
# the shortest decimal string half-up while DuckDB's direct cast
# rounds the binary double — one 10^-12 unit apart on tie values.
_SQL_DOT = """
  SELECT {aa}.vec_id AS ida, {ba}.vec_id AS idb,
         CAST(SUM(CAST(CAST(CAST({aa}.embedding[i.i] AS DOUBLE)
                            * CAST({ba}.embedding[i.i] AS DOUBLE) AS VARCHAR)
                  AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM {a} {aa}, {b} {ba}, (SELECT unnest(range(1, 65)) AS i) i
  {where}
  GROUP BY 1, 2
"""

# Shared norms CTE (the _SQL_DOT pattern): exact-decimal L2 norm per
# vector, VARCHAR-routed casts (see _SQL_DOT's comment). ONE
# definition — six oracle twins interpolate it, so a fix to the norm
# arithmetic (e.g. the half-up rounding workaround) can never drift
# per-operator (r10 review pass 3).
_SQL_NORMS = """norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)
                                AS VARCHAR)
                           AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
      GROUP BY vec_id
    )"""



def _cosine_ranked_sql_ctes() -> str:
    """The brute-force cosine scoring CTE chain — probe frame, exact
    norms, decimal dots, cosine — ending in `cos_ranked(query_id,
    neighbor_id, cosine, rn)` (rn unfiltered; consumers gate rn <= k).
    Shared VERBATIM by ns_similarity_topk's oracle and the RRF-fusion
    oracle (clustering.py) so the exact list both rank cannot drift."""
    return f"""queries AS (SELECT * FROM embeddings WHERE vec_id < 5),
    {_SQL_NORMS},
    dots AS ({_SQL_DOT.format(a='queries', aa='q', b='embeddings', ba='c',
                              where='WHERE q.vec_id <> c.vec_id')}),
    scored AS (
      SELECT dots.ida AS query_id, dots.idb AS neighbor_id,
             dots.dot / (nq.nrm * nc.nrm) AS cosine
      FROM dots
      JOIN norms nq ON nq.vec_id = dots.ida
      JOIN norms nc ON nc.vec_id = dots.idb
    ),
    cos_ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    )"""


def cosine_scored(em: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine) for every (probe, corpus)
    pair — the UN-ranked `scored` CTE twin. Probes are broadcast;
    each corpus partition scores locally. Shared by cosine_ranked and
    ns_ann_recall_eval (which ranks it twice — exact and IVF-gated —
    so the exact-decimal cosine pass runs ONCE, like its oracle)."""
    norms = em.select(
        "vec_id", _norm(F.col("embedding")).alias("nrm"), "embedding"
    )
    q = norms.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = norms.join(F.broadcast(q), norms.vec_id != q.query_id)
    return pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot_dec(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm"))
        ).alias("cosine"),
    )


def cosine_ranked(em: DataFrame, k: int) -> DataFrame:
    """Exact-cosine top-`k` per probe (query_id, neighbor_id, cosine,
    rn) — the Spark twin of _cosine_ranked_sql_ctes, shared by
    ns_similarity_topk (k=3) and ns_rank_fusion_rrf (k=10). The rank
    gate pushes into WindowGroupLimit."""
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cosine_scored(em)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


@query(
    "ns_similarity_topk",
    f"""
    WITH {_cosine_ranked_sql_ctes()}
    SELECT query_id, neighbor_id, cosine FROM cos_ranked WHERE rn <= 3
    """,
)
def ns_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for 5 probe vectors.
    Probes are broadcast; each corpus partition scores locally; the
    per-query top-k is a window over query_id (k·|queries| rows after
    AQE, never the full n×m product materialized to the driver)."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    return cosine_ranked(em, 3).select("query_id", "neighbor_id", "cosine")


# Multi-band hyperplane LSH: _N_BANDS independent sign sketches of
# _PLANES_PER_BAND planes each. A candidate pair only needs to agree
# on ONE band (OR-amplification): for true cosine s, per-plane
# collision p = 1 - arccos(s)/π, recall = 1-(1-p^8)^4 — ~0.96 at
# s=0.95 where a single 8-plane band gives only ~0.43.
#
# Sizing at scale: a band with k planes has 2^k buckets, and the
# candidate-pair work is Σ|bucket|² per band — for a corpus of n
# near-uniform vectors that is ~n²/2^k, so k MUST grow with the
# corpus (k ≈ log2(n / target_bucket_size)). The 8-plane default is
# sized for the sf-series test corpora AND baked into the DuckDB
# oracle literals; at 10⁸-10⁹ vectors pass planes_per_band=16-24
# (65k-16M buckets/band) to `embedding_features`/`band_keys` — twin
# recall at near-dup cosines stays ≈1.0 (0.9955^16 per band ⇒ ~0.999
# over 4 bands at s=0.9999) while bucket occupancy stays bounded.
# `auto_planes_per_band` implements this rule from a corpus count
# (clamped so every oracle-SF corpus still gets the baked 8);
# `dedup_embedding_chain(..., planes_per_band=None)` applies it.
# The scale configuration is property-tested in
# tests/test_properties.py::test_lsh_scale_band_config, and the
# 10×-corpus geometry measurement (candidates + wall-clock, 8 vs 16
# vs auto planes) is recorded in SCALING.md via
# scripts/lsh_geometry10.py.
_N_BANDS = 4
_PLANES_PER_BAND = 8
# auto-geometry bounds (see auto_planes_per_band): floor = the baked
# test default, cap = 24 planes/band (4 bands × 24 = 96 ≤ the
# 192-plane pool), target mean bucket occupancy ≈ 8 vectors
_AUTO_MAX_PLANES_PER_BAND = 24
_AUTO_TARGET_BUCKET = 8
_N_PLANES = _N_BANDS * _PLANES_PER_BAND
# one deterministic gaussian pool; prefixes are stable, so the
# oracle-baked default planes are exactly _PLANE_POOL[:32]
_MAX_PLANES = 192

# ns_dedup_embedding output threshold. A production near-dup bar is
# ~0.95, but the synthetic sf-series corpus's maximum pairwise cosine
# is ~0.51 — at 0.95 the operator (and its oracle) returned 0 rows, a
# vacuous green. 0.40 keeps ~10 LSH-candidate pairs at sf0.01 so the
# driver hash-checks real values; high-cosine recall is separately
# property-tested on planted near-dups (test_lsh_planted_near_dup_
# recall). The constant feeds BOTH engines, so they stay in lockstep.
_DEDUP_TAU = 0.40

# Fixed IVF cell-count geometry (see ns_similarity_ann_ivf): caps the
# N·C assignment cost at linear-in-corpus. 64 > every test SF's
# uncapped count (sf0.1 yields 40 cells), so behavior at the oracle
# SFs is identical with or without the cap.
_IVF_MAX_CELLS = 64
_rng = np.random.RandomState(42)
_PLANE_POOL = _rng.normal(size=(_MAX_PLANES, 64)).astype("float64")
_PLANES = _PLANE_POOL[:_N_PLANES]


def _planes_by_pos(spark: SparkSession, n_planes: int = _N_PLANES) -> DataFrame:
    """Broadcast-side constants: one row per vector position j, with
    the n_planes plane coefficients at j as an array. Built from baked
    literals — deterministic across runs, retries, and engines."""
    rows = [
        (j, [float(_PLANE_POOL[i][j]) for i in range(n_planes)])
        for j in range(64)
    ]
    return spark.createDataFrame(rows, "pos int, p array<double>")


# Sign-trust tolerance for the double fast path (see
# embedding_features): the reference sign is the DECIMAL(25,12) fold
# (what the oracle computes), whose value differs from the double
# fold by at most  64 terms · 5e-13 quantization  +  ~n·eps·Σ|term|
# summation error  ≈ 3.2e-11 + 2.9e-14·Σ|x·p|. The tolerance covers
# both with ≥3× / ≥30× margin, so |pdot_dbl| > tol PROVES the double
# sign equals the decimal sign for ANY summation order; only dots
# inside the band (measured: none on the test corpus, min margin
# ~4e4× the tolerance) pay the decimal re-fold.
_SIGN_TOL_ABS = 1e-10
_SIGN_TOL_REL = 1e-12

# most-recent persisted wide aggregate (see embedding_features) —
# kept to exactly one entry so repeated chain builds in a long-lived
# session don't accumulate JVM cache
_WIDE_CACHE: list = []


def embedding_features(
    spark: SparkSession,
    em: DataFrame,
    n_bands: int = _N_BANDS,
    planes_per_band: int = _PLANES_PER_BAND,
) -> DataFrame:
    """vec_id, embedding, nrm, band0.._N_BANDS-1 bucket ids — the
    norm and ALL 32 plane dots in ONE explode → broadcast-join →
    groupBy(vec_id) pass. Every sum is a codegen'd conditional
    aggregate with map-side partial agg (the minhash_sig_wide shape);
    the per-plane `F.aggregate` HOF loop this replaces was
    CodegenFallback — interpreted per row, ~10× slower, ~4× more so
    at 32 planes.

    Bucket signs stay bit-identical to the DuckDB oracle twin
    (`_SQL_BAND_BUCKETS`, which folds through DECIMAL) WITHOUT paying
    the decimal fold for every plane: the plane dots are summed in
    plain double (codegen primitive ops — measured 1.86 s → 1.09 s
    for the sf0.1 aggregate alone; at query level the win is a SCALE
    effect like the cosine screen: the sf0.1 chain is a wash under
    local fixed job costs, while the 10× ns_dedup_embedding chain
    drops 8.9 s → 5.9 s, −33%, and the 10× ratios of all three
    band-key consumers fall to 1.0–1.3) alongside a Σ|x·p| magnitude
    aggregate, and a dot is trusted when |pdot| exceeds the proven
    double-vs-decimal divergence bound (`_SIGN_TOL_ABS/_REL` above).
    The rare in-band dots (zero on the test corpus; e.g. engineered
    orthogonal vectors) are re-folded through decimal for exactly
    those vectors and their signs overridden — so every emitted
    bucket is the decimal sign either way, it is just almost never
    computed the slow way. The norm stays a decimal fold: its VALUE
    (not just a sign) reaches emitted cosines. The bounded `.count()`
    that sizes the fallback is a scalar driver action on the persisted
    aggregate the downstream plan reuses.

    `n_bands`/`planes_per_band` select the band geometry (see the
    sizing note at `_N_BANDS`); the defaults are the oracle-baked
    test-corpus configuration, larger corpora pass more planes."""
    n_planes = n_bands * planes_per_band
    if n_planes > _MAX_PLANES:
        raise ValueError(f"{n_planes} planes > pool of {_MAX_PLANES}")
    ex = em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x_raw")
    ).select("vec_id", "pos", F.col("x_raw").cast("double").alias("x"))
    j = ex.join(F.broadcast(_planes_by_pos(spark, n_planes)), "pos")

    def term(i: int):
        return F.col("x") * F.col("p")[i]

    aggs = [F.sum(term(i)).alias(f"pdot{i}") for i in range(n_planes)]
    aggs += [F.sum(F.abs(term(i))).alias(f"pabs{i}") for i in range(n_planes)]
    aggs.append(F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("nrm_sq"))
    wide = j.groupBy("vec_id").agg(*aggs).persist()
    # bound the session's cache growth to ONE wide aggregate: evict
    # the previous call's entry (correctness-safe — an evicted frame
    # recomputes; by the time a new chain is built, prior consumers
    # have materialized their own persists/results).
    # CAVEAT (load-bearing): if a previously returned, not-yet-
    # materialized plan still references the evicted frame, its
    # forced recompute re-sums the double pdot folds in a DIFFERENT
    # order — and the count()-gated fallback decision below rests on
    # the materialization the buckets consumed. The emitted signs are
    # order-invariant ONLY because the _SIGN_TOL_ABS/_SIGN_TOL_REL
    # in-band margin is ≥3× the worst-case double-summation drift
    # (bound proven at _SIGN_TOL_* above); any tolerance tweak must
    # re-check that bound or switch eviction to session close.
    while _WIDE_CACHE:
        _WIDE_CACHE.pop().unpersist(blocking=False)
    _WIDE_CACHE.append(wide)

    def in_band(i: int):
        return F.abs(F.col(f"pdot{i}")) <= (
            F.lit(_SIGN_TOL_ABS) + F.lit(_SIGN_TOL_REL) * F.col(f"pabs{i}")
        )

    uncertain = in_band(0)
    for i in range(1, n_planes):
        uncertain = uncertain | in_band(i)
    sign = {i: F.col(f"pdot{i}") > 0 for i in range(n_planes)}
    if wide.filter(uncertain).count():
        # decimal re-fold for ONLY the in-band vectors (broadcast-
        # filtered second pass; a handful of rows by construction)
        unc_ids = wide.filter(uncertain).select("vec_id")
        j_unc = (
            ex.join(F.broadcast(unc_ids), "vec_id")
            .join(F.broadcast(_planes_by_pos(spark, n_planes)), "pos")
        )
        dec = j_unc.groupBy("vec_id").agg(
            *[
                F.sum(term(i).cast(_DEC)).alias(f"pdec{i}")
                for i in range(n_planes)
            ]
        )
        wide = wide.join(F.broadcast(dec), "vec_id", "left")
        sign = {
            i: F.when(
                F.col(f"pdec{i}").isNotNull(), F.col(f"pdec{i}") > 0
            ).otherwise(F.col(f"pdot{i}") > 0)
            for i in range(n_planes)
        }
    buckets = []
    for b in range(n_bands):
        col = F.lit(0).cast("bigint")
        for k in range(planes_per_band):
            i = b * planes_per_band + k
            col = col + (F.when(sign[i], F.lit(1 << k)).otherwise(0))
        buckets.append(col.alias(f"band{b}"))
    feat = wide.select(
        "vec_id",
        F.sqrt(F.col("nrm_sq").cast("double")).alias("nrm"),
        *buckets,
    )
    return feat.join(em, "vec_id")


def band_keys(feats: DataFrame, n_bands: int = _N_BANDS) -> DataFrame:
    """(vec_id, band, bucket) join keys — one row per band. At 100 TB
    this (not the vector) is the shuffle payload for candidate
    generation."""
    return feats.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(n_bands)])
        ).alias("band", "bucket"),
    )


def _planes_values_sql() -> str:
    """The hyperplane constants as a DuckDB VALUES list
    (plane, j, p) with 1-based element index j — the oracle's copy of
    `_PLANES`, so both engines derive identical buckets."""
    rows = ", ".join(
        f"({i}, {j + 1}, {float(_PLANES[i][j])!r})"
        for i in range(_N_PLANES)
        for j in range(64)
    )
    return f"(VALUES {rows}) pl(plane, j, p)"


# DuckDB twin of embedding_features' buckets: same decimal-exact
# per-plane dot signs, one (vec_id, band, bucket) row per band.
_SQL_BAND_BUCKETS = f"""
  SELECT vec_id, plane // {_PLANES_PER_BAND} AS band,
         CAST(SUM(CASE WHEN pdot > 0
                       THEN (1 << (plane % {_PLANES_PER_BAND}))
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM (
    SELECT e.vec_id, pl.plane,
           SUM(CAST(CAST(CAST(e.embedding[pl.j] AS DOUBLE) * pl.p AS VARCHAR)
               AS DECIMAL(38,12))) AS pdot
    FROM embeddings e CROSS JOIN {_planes_values_sql()}
    GROUP BY e.vec_id, pl.plane
  ) GROUP BY vec_id, plane // {_PLANES_PER_BAND}
"""


@query(
    "ns_similarity_ann_lsh",
    f"""
    WITH {_SQL_NORMS},
    buckets AS ({_SQL_BAND_BUCKETS}),
    qk AS (
      SELECT vec_id AS query_id, band, bucket FROM buckets
      WHERE vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT qk.query_id, b.vec_id AS neighbor_id
      FROM buckets b JOIN qk ON b.band = qk.band AND b.bucket = qk.bucket
      WHERE b.vec_id != qk.query_id
    ),
    dots AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(CAST(CAST(CAST(q.embedding[i.i] AS DOUBLE)
                                * CAST(n.embedding[i.i] AS DOUBLE) AS VARCHAR)
                      AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.query_id, d.neighbor_id,
             d.dot / (nq.nrm * nn.nrm) AS cosine,
             row_number() OVER (
               PARTITION BY d.query_id
               ORDER BY d.dot / (nq.nrm * nn.nrm) DESC, d.neighbor_id
             ) AS rn
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nn ON nn.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine FROM scored WHERE rn <= 3
    """,
)
def ns_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 via multi-band hyperplane-LSH: a candidate shares ANY
    of the probe's 4 band buckets; exact cosine only on candidates.
    Recall on planted near-dups is property-tested
    (tests/test_properties.py::test_lsh_planted_near_dup_recall).
    Scale: (band, bucket) is the join/shuffle key and the exploded
    key rows — not vectors — are the shuffle payload; per-bucket work
    is |bucket|·|probes∩bucket|, summed over 4 bands.

    Oracle-backed since r8 (the third rows-only conversion of the
    round): "approximate" never meant non-deterministic — the
    hyperplanes are baked literals and the cosine is the exact
    decimal fold, so the DuckDB twin replays bucketing, candidate
    union, scoring, and the tiebroken top-3 bit-exactly (the same
    `_SQL_BAND_BUCKETS` replay ns_dedup_embedding's oracle uses)."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    feats = persist_evicting(
        embedding_features(spark, em),
        "ann_lsh_feats",
    )
    keys = band_keys(feats)
    qkeys = keys.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    # distinct first: a pair agreeing on several bands scores once
    cand = (
        keys.join(F.broadcast(qkeys), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = feats.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        cand.join(
            feats.select("vec_id", "embedding", "nrm"),
            cand.neighbor_id == F.col("vec_id"),
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_dec(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


@query(
    "ns_dedup_embedding",
    f"""
    WITH {_SQL_NORMS},
    buckets AS ({_SQL_BAND_BUCKETS}),
    cand AS (
      SELECT DISTINCT ba.vec_id AS ida, bb.vec_id AS idb
      FROM buckets ba JOIN buckets bb
        ON ba.band = bb.band AND ba.bucket = bb.bucket
       AND ba.vec_id < bb.vec_id
    ),
    dots AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             CAST(SUM(CAST(CAST(CAST(a.embedding[i.i] AS DOUBLE)
                                * CAST(b.embedding[i.i] AS DOUBLE) AS VARCHAR)
                      AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.ida
      JOIN embeddings b ON b.vec_id = c.idb
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
      GROUP BY 1, 2
    )
    SELECT dots.ida AS vec_a, dots.idb AS vec_b,
           dots.dot / (na.nrm * nb.nrm) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = dots.ida
    JOIN norms nb ON nb.vec_id = dots.idb
    WHERE dots.dot / (na.nrm * nb.nrm) >= {_DEDUP_TAU}
    """,
)
def ns_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ `_DEDUP_TAU`) via multi-band
    LSH: candidate pairs share at least one (band, bucket); exact
    decimal cosine is computed on candidates only. The pair join is a
    keyed (shuffle) join on (band, bucket) over exploded key rows —
    per-bucket work is Σ|bucket|² per band, never the all-pairs
    |corpus|² product, and no corpus-sized broadcast exists. Recall
    at a production 0.95 bar is ~0.96 (see the band math at
    `_N_BANDS`; `_DEDUP_TAU` explains the test-corpus setting),
    property-tested on planted near-dups. The oracle buckets
    identically (hyperplanes are baked literals, decimal-exact sign
    math on both engines), so this is oracle-checked despite being an
    approximate (bucket-scoped) dedup.

    Two-phase scoring: candidates are first screened with a plain
    double dot (cheap), and the exact decimal cosine — needed only
    for oracle bit-parity of the OUTPUT values — runs on survivors
    of `cos_dbl ≥ τ - 1e-9`. The double cosine is within ~64·ulp
    (≪1e-12) of the exact one, so the screen can never drop a pair
    the exact filter would keep; it cuts the expensive decimal fold
    from all Σ|bucket|² candidates to approximately the output set.
    Measured solo (round 6, best-of-n, noop sink): the screen is a
    SCALE trade, not an sf0.1 win — at sf0.1 (20k vectors, ~37k
    candidates, 95 output pairs) the extra double pass costs ~1 s
    (3.5-4.0 s with screen vs ~3.0 s without; the 1.8 s
    features/norms pass dominates either way), while at the 10×
    blow-up (200k vectors, ~19M candidates) it nearly halves the
    query: 8.9 s with vs 16.3 s without. Candidate volume, not the
    screen, is the asymptotic term; the headline sf0.1 bench number
    for this op sits in the 3.5-4.9 s ambient band.

    Band geometry is AUTO-sized from the corpus count (r7 verdict #7:
    wire `auto_planes_per_band` into the bench/anchor path): at every
    oracle/bench SF (≤2k vectors) auto provably returns the baked 8 —
    identical plans, identical oracle literals, identical bench
    numbers — while a production corpus gets the measured
    log2-scaling geometry (auto-12 was the wall-clock optimum at the
    20k-vector 10× blow-up: 5.36 s vs 7.42 s baked-8, SCALING.md)."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    return dedup_embedding_chain(spark, em, planes_per_band=None)


def auto_planes_per_band(n: int) -> int:
    """Corpus-sized band geometry: k ≈ ceil(log2(n / target_bucket))
    planes per band (the sizing rule documented at `_N_BANDS` —
    Σ|bucket|² candidate work is ~n²/2^k per band, so k must track
    log2(n) to keep mean bucket occupancy, and with it candidate
    volume per vector, constant). Clamped to [the baked 8-plane test
    default, 24]: at every oracle SF corpus (≤2k vectors) this
    returns exactly 8, so auto mode never diverges from the baked
    geometry where the DuckDB twins' literals apply; at 200k vectors
    (the 10× blow-up) it returns 15, at 10⁸ the 24-plane cap."""
    import math

    if n <= 0:
        return _PLANES_PER_BAND
    k = math.ceil(math.log2(max(n / _AUTO_TARGET_BUCKET, 1.0)))
    return max(_PLANES_PER_BAND, min(_AUTO_MAX_PLANES_PER_BAND, k))


def dedup_embedding_chain(
    spark: SparkSession,
    em: DataFrame,
    n_bands: int = _N_BANDS,
    planes_per_band: int | None = _PLANES_PER_BAND,
) -> DataFrame:
    """The full embedding-dedup chain (banded candidates → double
    screen → exact decimal cosine) with the band geometry as
    parameters — ONE definition shared by the registered operator
    (oracle-baked defaults) and the at-scale measurements
    (scripts/scale100.py embed16 runs THIS code under the 16-plane
    geometry, so the SCALING.md evidence measures the shipped
    algorithm, not a copy). planes_per_band=None auto-sizes the
    geometry from a corpus count (`auto_planes_per_band`); since r8
    the registered operator passes None too (verdict #7), which
    costs one em.count() action per invocation and keeps the baked
    8-plane oracle literals valid only while every oracle/bench
    corpus holds ≤ 2048 vectors (auto returns 9 at 2049; sf0.1 has
    2000 — a narrow margin, asserted in
    tests/test_properties.py::test_auto_geometry_is_baked_at_oracle_sfs
    so a corpus regeneration that crosses it fails loudly instead of
    hash-mismatching)."""
    if planes_per_band is None:
        planes_per_band = auto_planes_per_band(em.count())
    feats = persist_evicting(
        embedding_features(
            spark, em, n_bands=n_bands, planes_per_band=planes_per_band
        ),
        "srp_pairs_feats",
    )
    keys = band_keys(feats, n_bands=n_bands)
    pairs = (
        keys.join(
            keys.select(
                F.col("vec_id").alias("vec_b"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .filter(F.col("vec_id") < F.col("vec_b"))
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )
    a = feats.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = feats.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    screen = _dot_dbl(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    cosine = _dot_dec(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .filter(screen >= F.lit(_DEDUP_TAU) - F.lit(1e-9))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= _DEDUP_TAU)
        .select("vec_a", "vec_b", "cosine")
    )


@query(
    "ns_embedding_filter_join",
    f"""
    WITH probe AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
    {_SQL_NORMS},
    dots AS ({_SQL_DOT.format(a='probe', aa='q', b='embeddings', ba='c',
                              where='WHERE q.vec_id <> c.vec_id')})
    SELECT d.doc_id, d.lang, d.n_chars,
           dots.dot / (nq.nrm * nc.nrm) AS cosine
    FROM dots
    JOIN norms nq ON nq.vec_id = dots.ida
    JOIN norms nc ON nc.vec_id = dots.idb
    JOIN documents d ON d.doc_id = dots.idb
    WHERE dots.dot / (nq.nrm * nc.nrm) >= 0.0
    """,
)
def ns_embedding_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal corpus filter: keep documents whose EMBEDDING is on
    the probe side of a reference vector (cosine vs vec 0 ≥ 0) and
    return them with text metadata — the join shape behind
    "filter the corpus to docs similar to this topic centroid".

    Scale: the probe is one broadcast row; cosine is a projection
    over the embeddings scan (no shuffle); the doc join is a keyed
    equi-join on doc_id=vec_id that AQE plans (both sides big →
    shuffle join co-partitioned on the id). Exact decimal dot for
    oracle bit-parity of the output values."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    norms = em.select(
        "vec_id", _norm(F.col("embedding")).alias("nrm"), "embedding"
    )
    probe = norms.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    scored = (
        norms.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            (
                _dot_dec(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.0)
    )
    d = tbl(spark, sf_dir, "documents")
    return scored.join(d, scored.vec_id == d.doc_id).select(
        "doc_id", "lang", "n_chars", "cosine"
    )


@query(
    "ns_lsh_bucket_stats",
    f"""
    WITH buckets AS ({_SQL_BAND_BUCKETS}),
    occ AS (
      SELECT band, bucket, COUNT(*) AS c
      FROM buckets GROUP BY band, bucket
    )
    SELECT band,
           COUNT(*) AS n_buckets,
           MAX(c) AS max_bucket,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM occ GROUP BY band
    """,
)
def ns_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index occupancy profile: per band, the populated-bucket
    count, the largest bucket, and Σ c·(c-1)/2 — the EXACT candidate
    -pair workload the banded dedup/ANN joins will generate. This is
    the pre-flight check a 100 TB dedup runs before committing to a
    band geometry (see the sizing note at `_N_BANDS`): if
    candidate_pairs is super-linear in the corpus, add planes, don't
    launch the join. Two tiny keyed aggregates over the signature
    pass; output is 4 rows regardless of corpus size."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    keys = band_keys(embedding_features(spark, em))
    occ = keys.groupBy("band", "bucket").agg(F.count("*").alias("c"))
    return occ.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.max("c").alias("max_bucket"),
        # integral `div`, NOT `/`: bigint / coerces to double and
        # loses exactness past 2^53 (c > ~1.3e8 — precisely the
        # pre-flight regime this operator serves); the oracle's `//`
        # is exact, so the engines would diverge.
        F.sum(F.expr("(c * (c - 1)) div 2"))
        .cast("bigint")
        .alias("candidate_pairs"),
    )


def _ivf_assigned(em: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-cell assignment (vec_id, embedding, cell_id) — argmax
    dot with (cdot DESC, cent_id) ties, the Spark twin of
    _ivf_assign_sql_ctes' `assigned`; shared by ivf_topk,
    ns_ivf_cell_stats, ivfpq_build_index, ivf_residuals and
    ns_ann_recall_eval.

    r15 shape (guide §2.4): ROW-LOCAL argmin over the collected
    centroid literals — `array_min(array(struct(-cdot, cent_id)))`,
    the clustering._assign form — replacing a broadcast nested-loop
    n×C expansion + per-vec_id row_number window that carried both
    64-dim arrays through a sort (measured 1.6-1.9 s of the
    recall_eval invocation at sf0.1; one Exchange gone per consumer).
    Each cdot is the zip_with/aggregate left fold (the
    _sqdiff_chain_sql form — per-expression interpreted, which beats
    the unrolled C·64-term chain here because that chain blows the
    64 KB Janino method cap and de-codegens the WHOLE stage: measured
    14.9 s vs 0.9 s on ann_ivf). Values: the fold's leading
    `0.0 + p0` equals `p0` for every double except -0.0, and ±0.0
    compare equal under Spark's SQLOrderingUtil, so the (−cdot,
    cent_id) struct min picks exactly the (cdot DESC, cent_id)
    row_number()=1 row — cdot itself is ranking-only, never output.
    The centroid collect is bounded by construction (≤ _IVF_MAX_CELLS
    rows — the Lloyd-literal pattern kmeans_assign/_pq_train use)."""
    from .registry import dlit_sql

    cents = cent.orderBy("cent_id").collect()

    def dot_sql(cvals: list[float]) -> str:
        lits = ", ".join(dlit_sql(float(v)) for v in cvals)
        return (
            f"aggregate(zip_with(embedding, array({lits}), "
            f"(a, b) -> cast(a as double) * b), "
            f"cast('0.0' as double), (acc, p) -> acc + p)"
        )

    structs = ", ".join(
        f"struct(-({dot_sql(c.cent_emb)}) as nd, {int(c.cent_id)} as j)"
        for c in cents
    )
    m = F.expr(f"array_min(array({structs}))")
    return em.select(
        "vec_id", "embedding", m.getField("j").alias("cell_id")
    )


def ivf_topk(
    em: DataFrame,
    probes: DataFrame,
    cent: DataFrame,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN core: coarse-quantize `em` (vec_id, embedding) to each
    vector's nearest centroid from `cent` (cent_id, cent_emb), then
    for each probe in `probes` (query_id, q_emb — query_id must exist
    in `em`, its norm is reused from the corpus pass) search only the
    probe's best `nprobe` cells and return top-`k` by exact-decimal
    cosine. Parameterized so tests can run the END-TO-END path on a
    planted corpus (recall@k assertion in tests/test_properties.py).
    """

    def dot(a: Column, b: Column) -> Column:
        # unrolled codegen'd double dot for cell assignment (ranking
        # only, never output — see _dot_dbl)
        return _dot_dbl(a, b)

    assigned = _ivf_assigned(em, cent)
    norms = assigned.select(
        "vec_id", "cell_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    # probes search their top-`nprobe` cells
    w_probe = W.partitionBy("query_id").orderBy(F.desc("cdot"), "cent_id")
    probe_cells = (
        probes.join(F.broadcast(cent))
        .withColumn("cdot", dot(F.col("q_emb"), F.col("cent_emb")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", F.col("cent_id").alias("cell_id"))
    )
    q_norms = probe_cells.join(
        norms.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("q_nrm")),
        "query_id",
    )
    cand = q_norms.join(norms, "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot_dec(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


# DuckDB twin of the IVF path. The only piece the LSH oracle above
# didn't already prove out is the ASSIGNMENT ranking, which Spark
# computes with `_dot_dbl` — an unrolled LEFT-FOLD double sum
# (((t1+t2)+t3)+…). IEEE addition is deterministic for a fixed
# sequence, so DuckDB replays it bit-exactly with
# list_reduce(list(term ORDER BY i), (a,b) -> a+b) — same fold, same
# doubles, same (cdot DESC, cent_id) row_number choice. Norms and the
# output cosine reuse the exact-decimal-via-VARCHAR patterns from the
# ann_lsh oracle verbatim.
def _ivf_assign_sql_ctes(probe_pred: str = "vec_id < 5") -> str:
    """The coarse-quantizer CTE chain — centroid subset, left-fold
    assignment dots, per-vector cell, per-probe top-nprobe cells —
    ending in `assigned(vec_id, cell_id)` and `probe_cells(query_id,
    cell_id)`. Shared VERBATIM by _IVF_ORACLE (ns_similarity_ann_ivf),
    ns_similarity_ivfpq's oracle (clustering.py), and
    stream_ann_serve's oracle (probe_pred widens the probe set), so
    they cannot drift: every consumer prunes through the identical
    coarse index."""
    return f"""idx AS (SELECT unnest(range(1, 65)) AS i),
    cent AS (
      SELECT vec_id AS cent_id, embedding AS cent_emb
      FROM embeddings WHERE vec_id % 50 = 0
      ORDER BY vec_id LIMIT {_IVF_MAX_CELLS}
    ),
    adot AS (
      SELECT e.vec_id, c.cent_id,
             list_reduce(
               list(CAST(e.embedding[i.i] AS DOUBLE)
                    * CAST(c.cent_emb[i.i] AS DOUBLE) ORDER BY i.i),
               (a, b) -> a + b) AS cdot
      FROM embeddings e CROSS JOIN cent c CROSS JOIN idx i
      GROUP BY e.vec_id, c.cent_id
    ),
    assigned AS (
      SELECT vec_id, cent_id AS cell_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cdot DESC, cent_id) AS rn
        FROM adot) WHERE rn = 1
    ),
    probe_cells AS (
      SELECT vec_id AS query_id, cent_id AS cell_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cdot DESC, cent_id) AS rn
        FROM adot WHERE {probe_pred}) WHERE rn <= 2
    )"""


_IVF_ORACLE = f"""
    WITH {_ivf_assign_sql_ctes()},
    {_SQL_NORMS},
    cand AS (
      SELECT pc.query_id, a.vec_id AS neighbor_id
      FROM probe_cells pc JOIN assigned a ON a.cell_id = pc.cell_id
      WHERE a.vec_id != pc.query_id
    ),
    dots AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(CAST(CAST(CAST(q.embedding[i.i] AS DOUBLE)
                                * CAST(n.embedding[i.i] AS DOUBLE)
                                AS VARCHAR)
                      AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id
      CROSS JOIN idx i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.query_id, d.neighbor_id,
             d.dot / (nq.nrm * nn.nrm) AS cosine,
             row_number() OVER (
               PARTITION BY d.query_id
               ORDER BY d.dot / (nq.nrm * nn.nrm) DESC, d.neighbor_id
             ) AS rn
      FROM dots d JOIN norms nq ON nq.vec_id = d.query_id
                  JOIN norms nn ON nn.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine FROM scored WHERE rn <= 3
"""


@query("ns_similarity_ann_ivf", _IVF_ORACLE)
def ns_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 via IVF (inverted-file index): coarse-quantize every
    vector to its nearest centroid cell, then search only the probe's
    best `nprobe=2` cells. Centroids are a deterministic subset of
    the corpus (vec_id % 50 == 0) — no training step, no RNG, stable
    across runs/retries.

    Scale path: centroid list is tiny and broadcast everywhere; cell
    assignment is a single broadcast-join projection over the corpus
    (one pass, no shuffle); the search is a keyed join on cell_id, so
    per-probe work is |cell| · nprobe instead of |corpus|. This is
    the same partition-pruning shape an IVF index gives FAISS, done
    with joins (core: `ivf_topk`, recall@3-tested on planted twins).

    Oracle-backed since r8 (the LAST rows-only conversion — the
    registry is now 185/185): "approximate" here was always
    deterministic — centroids are a fixed id-subset, assignment ranks
    a left-fold double dot DuckDB replays bit-exactly (see
    _IVF_ORACLE), and the output cosine is the exact-decimal fold
    both engines evaluate identically.

    The cell count is CAPPED at a fixed geometry (_IVF_MAX_CELLS) so
    the N·C assignment cost stays linear in the corpus — an uncapped
    `vec_id % 50` centroid rule grows C with N and turns assignment
    into N²/50 (measured 28× at a 10× blow-up before the cap). In
    deployment C is a tuning knob (FAISS guidance ~√N, with the
    index build amortized across queries); this operator rebuilds
    per run, so it pins C and lets cells grow linearly instead."""
    em = tbl(spark, sf_dir, "embeddings")
    probes = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return ivf_topk(em, probes, ivf_centroids(em), k=3, nprobe=2)


def ivf_centroids(em: DataFrame) -> DataFrame:
    """The shared coarse-quantizer geometry (cent_id, cent_emb):
    deterministic smallest `vec_id % 50 == 0` ids, capped at
    _IVF_MAX_CELLS (TakeOrderedAndProject over N/50 rows — no full
    sort). One definition for ns_similarity_ann_ivf,
    ns_ivf_cell_stats, and clustering's ns_similarity_ivfpq."""
    return (
        em.filter(F.col("vec_id") % 50 == 0)
        .orderBy("vec_id")
        .limit(_IVF_MAX_CELLS)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
        )
    )


@query(
    "ns_ivf_cell_stats",
    f"""
    WITH {_ivf_assign_sql_ctes()},
    counts AS (
      SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM assigned GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM assigned)
    SELECT c.cent_id AS cell_id,
           CAST(COALESCE(k.n_vecs, 0) AS BIGINT) AS n_vecs,
           CAST(COALESCE(k.n_vecs, 0) AS DOUBLE)
             / CAST(t.n_total AS DOUBLE) AS share
    FROM cent c
    LEFT JOIN counts k ON k.cell_id = c.cent_id
    CROSS JOIN tot t
    """,
)
def ns_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health audit: per-cell occupancy of the shared
    coarse quantizer (n_vecs + corpus share per inverted list,
    INCLUDING empty cells) — the balance report a production ANN
    deployment watches (FAISS's imbalance_factor): a hot cell makes
    every probe that touches it scan-heavy, an empty one wastes
    nlist; skew here is what motivates re-training centroids or
    salting hot cells. Composes the proven assignment CTEs verbatim
    (_ivf_assign_sql_ctes / _ivf_assigned).

    Determinism: counts are exact integers over the proven argmax
    assignment; share is one int/int double division.

    Scale: ONE corpus assignment pass into a C-row aggregate
    (map-side combined), then C-row joins against the centroid frame
    and a 1-row total scalar — output is C rows at any corpus size."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    cent = ivf_centroids(em)
    assigned = _ivf_assigned(em, cent)
    counts = assigned.groupBy("cell_id").agg(
        F.count("*").cast("bigint").alias("n_vecs")
    )
    tot = assigned.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        cent.select(F.col("cent_id").alias("cell_id"))
        .join(F.broadcast(counts), "cell_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "cell_id",
            F.coalesce(F.col("n_vecs"), F.lit(0))
            .cast("bigint")
            .alias("n_vecs"),
            (
                F.coalesce(F.col("n_vecs"), F.lit(0)).cast("double")
                / F.col("n_total").cast("double")
            ).alias("share"),
        )
    )


_RECALL_K = 10


@query(
    "ns_ann_recall_eval",
    f"""
    WITH {_cosine_ranked_sql_ctes()},
    {_ivf_assign_sql_ctes()},
    ann_ranked AS (
      SELECT s.query_id, s.neighbor_id,
             row_number() OVER (PARTITION BY s.query_id
                                ORDER BY s.cosine DESC,
                                         s.neighbor_id) AS rn
      FROM scored s
      JOIN probe_cells pc ON pc.query_id = s.query_id
      JOIN assigned a ON a.vec_id = s.neighbor_id
                     AND a.cell_id = pc.cell_id
    ),
    exact_k AS (
      SELECT query_id, neighbor_id FROM cos_ranked
      WHERE rn <= {_RECALL_K}
    ),
    ann_k AS (
      SELECT query_id, neighbor_id FROM ann_ranked
      WHERE rn <= {_RECALL_K}
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)
             AS recall_at_k
    FROM exact_k e
    LEFT JOIN ann_k a ON a.query_id = e.query_id
                     AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def ns_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the IVF ANN path against the exact-cosine
    baseline, per probe — the eval loop a production retrieval stack
    runs before trusting an index (FAISS's recall-vs-nprobe sweep):
    recall = |IVF top-{k} ∩ exact top-{k}| / {k}. The exact side is
    the shared brute-force ranking (cosine_ranked — by design the
    recall DENOMINATOR, see ns_similarity_topk); the ANN side is the
    same IVF geometry ns_similarity_ann_ivf serves (nprobe=2),
    so this row measures exactly what the registered ANN operators
    ship. Oracle composes the two proven CTE chains verbatim — the
    IVF candidate set expressed as a join against the exact `scored`
    frame (identical exact-decimal cosine ⇒ identical ranking), so
    recall is pure integer counting + one int/int double division;
    since r15 the Spark body mirrors that shape exactly (one scoring
    pass, two rankings) instead of re-scoring candidates through
    ivf_topk.

    Scale: ONE one-broadcast probe scoring pass serves both rankings
    (persisted within the invocation, n·|Q| skinny rows); the ANN
    gate is the shared coarse assignment + a probed-cells join; the
    recall join is k·|Q| rows. Evaluating on a sampled probe set
    (here the fixed 5) is the standard estimator — corpus size only
    enters through the scoring and assignment passes, both already
    scale-shaped."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    probes = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    # ONE exact-decimal scoring pass serves BOTH rankings (r14
    # verdict #8; the shape this operator's oracle always had): the
    # ANN list is the exact `scored` frame gated to IVF candidates
    # (probe cells × assignment) and re-ranked — identical cosines by
    # construction, so the second |cand|-sized _dot_dec pass the old
    # ivf_topk call paid is gone. `scored` is persisted within the
    # invocation (n·|Q| skinny rows) for its two rank consumers.
    scored = persist_evicting(
        cosine_scored(em), "similarity.recall_eval.scored"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("query_id", "neighbor_id")
    )
    cent = ivf_centroids(em)
    assigned = _ivf_assigned(em, cent).select("vec_id", "cell_id")
    w_probe = W.partitionBy("query_id").orderBy(F.desc("cdot"), "cent_id")
    probe_cells = (
        probes.join(F.broadcast(cent))
        .withColumn("cdot", _dot_dbl(F.col("q_emb"), F.col("cent_emb")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("query_id", F.col("cent_id").alias("cell_id"))
    )
    cand = probe_cells.join(assigned, "cell_id").select(
        "query_id", F.col("vec_id").alias("neighbor_id")
    )
    ann = (
        scored.join(cand, ["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select(
            F.col("query_id").alias("a_query_id"),
            F.col("neighbor_id").alias("a_neighbor_id"),
        )
    )
    j = exact.join(
        ann,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.count("a_neighbor_id").cast("bigint").alias("n_hit"),
        (
            F.count("a_neighbor_id").cast("double") / F.count("*")
        ).alias("recall_at_k"),
    )


ns_ann_recall_eval.__doc__ = ns_ann_recall_eval.__doc__.format(
    k=_RECALL_K
)


# hard-negative mining band: candidates come from the exact top-_POOL
# ranking, near-duplicates (cosine ≥ _DUP, likely unlabeled
# positives) are excluded, and the top _K of what remains are the
# negatives — the ANCE/DPR "just below the positive band" rule.
_HN_POOL = 25
_HN_DUP = 0.98
_HN_K = 8


@query(
    "ns_hard_negatives",
    f"""
    WITH {_cosine_ranked_sql_ctes()},
    pool AS (
      SELECT query_id, neighbor_id, cosine FROM cos_ranked
      WHERE rn <= {_HN_POOL} AND cosine < {_HN_DUP}
    ),
    reranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC,
                                         neighbor_id) AS hn_rank
      FROM pool
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(hn_rank AS BIGINT) AS hn_rank
    FROM reranked WHERE hn_rank <= {_HN_K}
    """,
)
def ns_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per
    probe, the top-{k} most-similar corpus docs that are NOT
    near-duplicates — candidates from the exact top-{pool} cosine
    pool, the ≥{dup} near-dup band excluded (those are unlabeled
    positives; training on them poisons the contrastive loss), the
    remainder re-ranked by cosine. This is the ANCE/DPR mining rule
    expressed as one ranking pass + a band filter; swapping the
    exact pool for the IVF candidate chain (ns_similarity_ann_ivf)
    is the documented 100 TB path — mining quality degrades only by
    that index's measured recall (ns_ann_recall_eval is the gauge).

    Determinism: the pool is the proven exact-decimal cosine ranking
    (shared cos_ranked fragment); the {dup} band gate compares
    bit-identical doubles; re-rank ties break on neighbor_id.

    Scale: probes broadcast, one corpus scoring pass, two
    WindowGroupLimit-pushed ranks — output k·|Q| rows."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    pool = cosine_ranked(em, _HN_POOL).filter(F.col("cosine") < _HN_DUP)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pool.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= _HN_K)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("hn_rank").cast("bigint").alias("hn_rank"),
        )
    )


ns_hard_negatives.__doc__ = ns_hard_negatives.__doc__.format(
    k=_HN_K, pool=_HN_POOL, dup=_HN_DUP
)


@query(
    "ns_embedding_profile",
    """
    SELECT i.i AS dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(CAST(e.embedding[i.i] AS DOUBLE) AS VARCHAR)
                    AS DECIMAL(28,12))) AS DOUBLE) AS sum_v,
           CAST(SUM(CAST(CAST(CAST(e.embedding[i.i] AS DOUBLE)
                              * CAST(e.embedding[i.i] AS DOUBLE) AS VARCHAR)
                    AS DECIMAL(28,12))) AS DOUBLE) AS sum_sq,
           MIN(CAST(e.embedding[i.i] AS DOUBLE)) AS min_v,
           MAX(CAST(e.embedding[i.i] AS DOUBLE)) AS max_v
    FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) i
    GROUP BY 1
    """,
)
def ns_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding-column profile (count / exact sum /
    sum-of-squares / min / max per coordinate) — the stats pass
    behind feature normalization, drift monitoring, and dead-dim
    detection in embedding pipelines. posexplode fans each vector
    into (dim, value) rows and ONE hash aggregation on the 64 dim
    keys does the rest — whole-stage codegen, map-side partials, and
    a 64-row shuffle regardless of corpus size (the at-scale shape;
    an interpreted per-row HOF fold would serialize this). Sums
    accumulate in exact decimal so both engines agree bitwise;
    downstream mean/std are (sum/n, sum_sq/n - mean²) computed from
    these exact inputs.

    Cross-engine cast detail: Spark's double→decimal cast rounds the
    double's SHORTEST DECIMAL STRING half-up (BigDecimal.valueOf),
    while DuckDB's direct cast rounds the binary double — they
    disagree by one 10^-12 unit on tie-ish values, so the oracle
    routes the cast through VARCHAR (shortest string) to match."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    ex = em.select(
        F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select((F.col("pos") + 1).cast("bigint").alias("dim"),
             F.col("v").cast("double").alias("v"))
    return ex.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(28,12)")).cast("double").alias("sum_v"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(28,12)"))
        .cast("double")
        .alias("sum_sq"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "ns_embedding_quantize",
    """
    WITH ex AS (
      SELECT vec_id, i.i - 1 AS dim, CAST(e.embedding[i.i] AS DOUBLE) AS x
      FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) i
    ),
    st AS (
      SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim
    ),
    q AS (
      SELECT ex.vec_id, ex.dim, ex.x, st.mn,
             (st.mx - st.mn) / 255 AS step,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE CAST(floor((ex.x - st.mn)
                                  / ((st.mx - st.mn) / 255) + 0.5) AS BIGINT)
             END AS qv
      FROM ex JOIN st ON ex.dim = st.dim
    )
    SELECT vec_id,
           coalesce(array_to_string(list(qv ORDER BY dim), ','), '')
             AS qvec,
           MAX(abs(x - (mn + qv * step))) AS max_err
    FROM q GROUP BY vec_id
    """,
)
def ns_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style affine quantization of the embedding corpus: per-dim
    min/max → 256 levels → quantized vector + max reconstruction
    error per vector. The 4× storage cut (and 4× shuffle-payload cut
    for every downstream similarity join) is the standard first move
    when an embedding corpus reaches the 100 TB regime.

    Bit-exact across engines: min/max are exact; step, the scaled
    offset, floor(+0.5), and the reconstruction error are the same
    IEEE double operations on both sides (no decimal needed — no
    summation reordering anywhere). Scale shape: the per-dim stats
    are ONE 64-row hash agg over the posexplode; the quantize pass is
    a broadcast join of those 64 rows — a single corpus scan, no
    corpus shuffle; the rebuild agg is keyed by vec_id."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    ex = em.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    st = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    step = (F.col("mx") - F.col("mn")) / F.lit(255)
    j = ex.join(F.broadcast(st), "dim").select(
        "vec_id",
        "dim",
        "x",
        "mn",
        step.alias("step"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint"))
        .otherwise(
            F.floor((F.col("x") - F.col("mn")) / step + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .alias("qv"),
    )
    return (
        j.withColumn("err", F.abs(F.col("x") - (F.col("mn") + F.col("qv") * F.col("step"))))
        .groupBy("vec_id")
        .agg(
            # joined to one CSV string, not a top-level array column:
            # every hash-checked query keeps its output scalar (the
            # driver's value hash is only proven on scalar cells —
            # same convention as agg_collect)
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "qv"))),
                    lambda s: s.qv.cast("string"),
                ),
                ",",
            ).alias("qvec"),
            F.max("err").alias("max_err"),
        )
    )


# ---- semantic decontamination (embedding-space eval contamination) ----

# Eval-set slice: the first _SEM_EVAL_N vectors stand in for the
# benchmark's embedded items; everything else is the training corpus.
# Threshold follows _DEDUP_TAU's rationale (near-orthogonal random
# test corpus: production-style 0.95 would flag nothing) but sits at
# 0.35, below the sf0.001 max corpus-vs-eval cosine (0.392 — measured
# across all SFs: maxes 0.392/0.493/0.452, p90 ~0.27), so the flag
# path is exercised at EVERY test SF, not just the driver's sf0.01.
_SEM_EVAL_N = 8
_SEM_CONTAM_TAU = 0.35


# DuckDB twin of the registered exact form (the pre_screen=True path
# is the documented LSH-approximate production variant, recall-tested
# rather than hash-gated).
_SEM_CONTAM_SQL = f"""
    WITH {_SQL_NORMS},
    ev AS (SELECT * FROM embeddings WHERE vec_id < {_SEM_EVAL_N}),
    corp AS (SELECT * FROM embeddings WHERE vec_id >= {_SEM_EVAL_N}),
    dots AS ({{dot}}),
    scored AS (
      SELECT dots.ida AS vec_id, dots.idb AS eval_id,
             dots.dot / (nc.nrm * ne.nrm) AS cosv
      FROM dots
      JOIN norms nc ON nc.vec_id = dots.ida
      JOIN norms ne ON ne.vec_id = dots.idb
    )
    SELECT vec_id, eval_id AS nearest_eval_id, cosv AS max_eval_cos,
           CASE WHEN cosv >= {_SEM_CONTAM_TAU} THEN 1 ELSE 0 END
             AS contaminated
    FROM (
      SELECT vec_id, eval_id, cosv,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosv DESC, eval_id) AS rn
      FROM scored
    ) WHERE rn = 1
    """.format(
    dot=_SQL_DOT.format(a="corp", aa="c", b="ev", ba="e", where="")
)


def contamination_semantic_frame(
    spark: SparkSession,
    em: DataFrame,
    eval_n: int = _SEM_EVAL_N,
    tau: float = _SEM_CONTAM_TAU,
    pre_screen: bool = False,
    n_bands: int = _N_BANDS,
    planes_per_band: int | None = None,
) -> DataFrame:
    """Parameterized semantic-decontamination body — ONE definition
    shared by the registered operator (pre_screen=False, the exact
    oracle-gated form) and the huge-|eval| production path
    (pre_screen=True, the r10 verdict's composition item).

    pre_screen=False: every corpus vector scores against every eval
    vector via the row-local HOF fold over a 1-row broadcast array —
    exact, zero shuffle, the right form while |eval| keeps the
    per-row fold cheap (benchmarks are thousands of items).

    pre_screen=True: the banded-LSH two-phase shape ns_dedup_embedding
    ships, applied to decontamination — band BOTH sides with the
    shared embedding_features geometry (planes_per_band=None
    auto-sizes from the corpus count), take (corpus, eval) bucket
    collisions as candidates, exact-decimal-score ONLY the collisions,
    and argmax per corpus vector over its candidate set (struct-max
    with the same (cos desc, eval_id asc) tie-break). The scored
    frame is |collisions| ≪ |corpus|·|eval|; vectors with no
    colliding eval item emit NULL nearest/cos and contaminated=0 —
    APPROXIMATE by the usual LSH recall trade (recall on planted
    paraphrase twins property-tested ≥0.9; at cosine ≥0.95 the
    4x8-band OR-amplification predicts ~1.0)."""
    norms = em.select(
        "vec_id", _norm(F.col("embedding")).alias("nrm"), "embedding"
    )
    if not pre_screen:
        ev = (
            norms.filter(F.col("vec_id") < eval_n)
            .select(
                F.struct(
                    F.col("vec_id").alias("eval_id"),
                    F.col("embedding").alias("e_emb"),
                    F.col("nrm").alias("e_nrm"),
                ).alias("ev")
            )
            .agg(F.sort_array(F.collect_list("ev")).alias("evals"))
        )

        def _fold(acc: Column, evx: Column) -> Column:
            cosv = _dot_dec(evx["e_emb"], F.col("embedding")) / (
                evx["e_nrm"] * F.col("nrm")
            )
            # STRICT > : on an exact double tie the earlier (lower-id)
            # eval wins, matching the oracle's (cosv DESC, eval_id)
            # window.
            return F.when(
                cosv > acc["cosv"],
                F.struct(
                    cosv.alias("cosv"), evx["eval_id"].alias("eval_id")
                ),
            ).otherwise(acc)

        best = F.aggregate(
            F.col("evals"),
            F.struct(
                F.lit(float("-inf")).alias("cosv"),
                F.lit(-1).cast("long").alias("eval_id"),
            ),
            _fold,
        )
        return (
            norms.filter(F.col("vec_id") >= eval_n)
            .join(F.broadcast(ev))
            .select("vec_id", best.alias("best"))
            .select(
                "vec_id",
                F.col("best.eval_id").alias("nearest_eval_id"),
                F.col("best.cosv").alias("max_eval_cos"),
                F.when(F.col("best.cosv") >= F.lit(tau), 1)
                .otherwise(0)
                .alias("contaminated"),
            )
        )
    if planes_per_band is None:
        planes_per_band = auto_planes_per_band(em.count())
    feats = persist_evicting(
        embedding_features(
            spark, em, n_bands=n_bands, planes_per_band=planes_per_band
        ),
        "contam_sem_feats",
    )
    keys = band_keys(feats, n_bands=n_bands)
    evk = keys.filter(F.col("vec_id") < eval_n).select(
        F.col("vec_id").alias("eval_id"), "band", "bucket"
    )
    cand = (
        keys.filter(F.col("vec_id") >= eval_n)
        .join(evk, ["band", "bucket"])
        .select("vec_id", "eval_id")
        .distinct()
    )
    ce = feats.select("vec_id", "embedding", "nrm")
    ee = feats.filter(F.col("vec_id") < eval_n).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
    )
    scored = (
        cand.join(ce, ["vec_id"])
        .join(F.broadcast(ee), ["eval_id"])
        .select(
            "vec_id",
            "eval_id",
            (
                _dot_dec(F.col("e_emb"), F.col("embedding"))
                / (F.col("e_nrm") * F.col("nrm"))
            ).alias("cosv"),
        )
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("cosv"),
                (-F.col("eval_id")).alias("neg_eval_id"),
                F.col("eval_id"),
            )
        ).alias("b")
    )
    return (
        em.select("vec_id")
        .filter(F.col("vec_id") >= eval_n)
        .join(best, ["vec_id"], "left")
        .select(
            "vec_id",
            F.col("b.eval_id").alias("nearest_eval_id"),
            F.col("b.cosv").alias("max_eval_cos"),
            F.when(F.col("b.cosv") >= F.lit(tau), 1)
            .otherwise(0)
            .alias("contaminated"),
        )
    )


@query("ns_contamination_semantic", _SEM_CONTAM_SQL)
def ns_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding-space twin of
    ns_contamination_ngram (real pipelines run BOTH: lexical n-gram
    overlap catches verbatim leakage, embedding cosine catches
    paraphrased/translated leakage the lexical screen misses, per the
    GPT-4/Llama decontamination reports). The first {n} vectors stand
    in for the embedded benchmark; every corpus vector gets its
    nearest eval item (cosine desc, eval_id tie-break), the max
    cosine, and a contaminated flag at tau={tau}. The manifest a
    decontamination pass feeds back into the corpus filter
    (ns_blocklist_filter consumes id lists of exactly this shape).

    Scale: the eval side is benchmark-sized (thousands) — collapsed
    to ONE row holding a sorted array<struct> of eval vectors and
    broadcast; the per-vector argmax is a row-local higher-order
    `aggregate` fold over that array inside the corpus projection.
    The |corpus|·|eval| expanded frame therefore NEVER EXISTS: the
    plan is scan → 1-row broadcast join → project, with zero
    exchange, zero sort, zero window (the r10 form shuffled AND
    sorted the full expanded frame through a row_number window — a
    10^4x-inflated exchange at benchmark |eval|; the struct-max
    aggregate alternative still locally sorts the expanded frame
    because struct buffers force SortAggregate). Tie-break matches
    the oracle window (cosine desc, eval_id asc): the fold walks the
    array in ascending eval_id order (sort_array on the struct) and
    replaces the accumulator only on a STRICT cosine improvement, so
    exact double ties keep the earliest eval_id. At very large
    |eval| x corpus, pre-screen candidates with the banded LSH:
    contamination_semantic_frame(pre_screen=True) ships the two-phase
    shape (band both sides, exact-score only bucket collisions —
    ns_dedup_embedding's geometry), with planted-twin recall
    property-tested. Exact decimal dots for oracle bit-parity."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    return contamination_semantic_frame(spark, em)


ns_contamination_semantic.__doc__ = ns_contamination_semantic.__doc__.format(
    n=_SEM_EVAL_N, tau=_SEM_CONTAM_TAU
)


# ---- signed random projection (SRP) sketches ----

# Charikar SRP: project each embedding onto _SRP_P fixed ±1 hyperplanes;
# the sign bits form an LSH code whose Hamming distance estimates the
# angle (P(bit match) = 1 - θ/π). The ±1 signs derive from md5 of the
# FIXED strings "rp_{j}_{i}" at import time (hashlib here ≡ md5() in
# both engines — but no in-plan hashing is even needed: the signs ship
# as literals on both sides, the same no-RNG-inside-the-plan rule the
# LSH hyperplanes follow).
_SRP_P = 16  # projections = code bits
_SRP_DIM = 64


def _srp_signs() -> list[list[float]]:
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1.0
            for i in range(_SRP_DIM)
        ]
        for j in range(_SRP_P)
    ]


_SRP = _srp_signs()

_SRP_SQL = f"""
    WITH signs(j, i, s) AS (VALUES {", ".join(
        f"({j}, {i + 1}, CAST({s!r} AS DOUBLE))"
        for j, row in enumerate(_SRP)
        for i, s in enumerate(row)
    )}),
    pw(j, p2) AS (VALUES {", ".join(
        f"({j}, {1 << j})" for j in range(_SRP_P)
    )}),
    un AS (
      SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(range(1, {_SRP_DIM + 1})) AS i) i
    ),
    p AS (
      SELECT un.vec_id, s.j,
             CAST(SUM(CAST(CAST(un.v * s.s AS VARCHAR)
                           AS DECIMAL(38,12))) AS DOUBLE) AS proj
      FROM un JOIN signs s ON s.i = un.i
      GROUP BY 1, 2
    )
    SELECT p.vec_id,
           CAST(SUM(CASE WHEN p.proj > 0 THEN pw.p2 ELSE 0 END)
                AS BIGINT) AS srp_code,
           MAX(CASE WHEN p.j = 0 THEN p.proj END) AS proj_0,
           MAX(CASE WHEN p.j = 1 THEN p.proj END) AS proj_1,
           MAX(CASE WHEN p.j = 2 THEN p.proj END) AS proj_2,
           MAX(CASE WHEN p.j = 3 THEN p.proj END) AS proj_3
    FROM p JOIN pw ON pw.j = p.j
    GROUP BY 1
"""


def _srp_projected(em: DataFrame) -> DataFrame:
    """(vec_id, p0..p{_SRP_P-1}): the row-local sign-fold projections
    every SRP operator builds on — ONE implementation so
    ns_embedding_rp and _srp_code_cols (ns_srp_hamming_pairs) cannot
    drift. Each projection is an exact decimal fold of the vector
    against a literal ±1 sign array; zero shuffle."""

    def proj(j: int) -> Column:
        signs = F.array(*[F.lit(s) for s in _SRP[j]])
        prods = F.zip_with(
            F.col("embedding"),
            signs,
            lambda x, y: (x.cast("double") * y).cast(_DEC),
        )
        return F.aggregate(
            prods, F.lit(0).cast(_DEC), lambda acc, p: (acc + p).cast(_DEC)
        ).cast("double")

    return em.select(
        "vec_id", *[proj(j).alias(f"p{j}") for j in range(_SRP_P)]
    )


def _srp_code_expr() -> Column:
    """The 16-bit srp_code as a sign-bit sum over p0..p15 (expects
    _srp_projected's column names in scope)."""
    code = None
    for j in range(_SRP_P):
        bit = F.when(F.col(f"p{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code.cast("bigint")


@query("ns_embedding_rp", _SRP_SQL)
def ns_embedding_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection sketch of the embedding corpus: 16
    fixed ±1 hyperplanes → 16 projections → a 16-bit `srp_code`
    (Charikar SimHash for vectors — the Hamming-space twin of the
    banded LSH that `ns_similarity_ann_lsh` builds; a 100 TB corpus
    stores/bands these 2-byte codes instead of 256-byte vectors for
    first-pass candidate generation) plus the first four raw
    projections as value-visible columns.

    Determinism: each projection is Σ_i ±v_i — per-element sign flip
    is EXACT in IEEE, and the sum rides the same decimal(25,12) fold
    `_dot_dec` uses (exact, order-independent; the DuckDB twin
    VARCHAR-routes its decimal casts per _SQL_DOT's note). Sign bits
    compare the identical double against 0, so the code is
    bit-identical cross-engine.

    Scale shape: scan → project, ZERO shuffle — every projection is a
    row-local fold over the vector against a literal sign array (the
    oracle's unnest/join shape is DuckDB-only; Spark never explodes).
    Output is one row per vector with scalar cells only."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    return _srp_projected(em).select(
        "vec_id",
        _srp_code_expr().alias("srp_code"),
        *[F.col(f"p{j}").alias(f"proj_{j}") for j in range(4)],
    )


# ---- SRP Hamming-band candidate pairs ----

# Band geometry over the 16-bit srp_code: 4 bands x 4 bits. By
# pigeonhole, any pair with Hamming distance <= _SRP_HAM_MAX = 3
# agrees on at least one full band — banded recall at h <= 3 is
# GUARANTEED, not probabilistic (the simhash-band argument). At
# production code width (64-128 bits) the same 4-band split yields
# 16-32-bit bands whose random-collision rate is 2^-16..2^-32 per
# band; the 4-bit test bands are hot by design so every test SF
# exercises the hot-bucket cap.
_SRP_BANDS = 4
_SRP_BAND_BITS = _SRP_P // _SRP_BANDS
_SRP_BAND_MASK = (1 << _SRP_BAND_BITS) - 1
_SRP_HAM_MAX = 3
_SRP_HOT_CAP = 100  # band buckets hotter than this are boilerplate-dense


def _srp_codes_sql_ctes() -> str:
    """The srp_code derivation as a reusable CTE chain ending in
    `codes(vec_id, srp_code)`. Generated from the SAME _SRP sign
    table and bit weights ns_embedding_rp's oracle embeds, so the two
    oracles cannot drift (the Python constants are the shared
    source of truth; Spark-side both operators build on
    _srp_projected / _srp_code_expr)."""
    signs = ", ".join(
        f"({j}, {i + 1}, CAST({s!r} AS DOUBLE))"
        for j, row in enumerate(_SRP)
        for i, s in enumerate(row)
    )
    pw = ", ".join(f"({j}, {1 << j})" for j in range(_SRP_P))
    return f"""
    signs(j, i, s) AS (VALUES {signs}),
    pw(j, p2) AS (VALUES {pw}),
    un AS (
      SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(range(1, {_SRP_DIM + 1})) AS i) i
    ),
    p AS (
      SELECT un.vec_id, s.j,
             CAST(SUM(CAST(CAST(un.v * s.s AS VARCHAR)
                           AS DECIMAL(38,12))) AS DOUBLE) AS proj
      FROM un JOIN signs s ON s.i = un.i
      GROUP BY 1, 2
    ),
    codes AS (
      SELECT p.vec_id,
             CAST(SUM(CASE WHEN p.proj > 0 THEN pw.p2 ELSE 0 END)
                  AS BIGINT) AS srp_code
      FROM p JOIN pw ON pw.j = p.j
      GROUP BY 1
    )"""


def _srp_code_cols(em: DataFrame) -> DataFrame:
    """(vec_id, srp_code) via _srp_projected's shared sign-fold
    projections (ns_embedding_rp builds from the same helper and
    additionally surfaces proj_0..3)."""
    return _srp_projected(em).select(
        "vec_id", _srp_code_expr().alias("srp_code")
    )


@query(
    "ns_srp_hamming_pairs",
    f"""
    WITH {_srp_codes_sql_ctes()},
    bands AS (
      SELECT vec_id, srp_code, b.b AS band_id,
             (srp_code >> ({_SRP_BAND_BITS} * b.b)) & {_SRP_BAND_MASK}
               AS band_val
      FROM codes,
           (SELECT unnest(range(0, {_SRP_BANDS})) AS b) b
    ),
    cool AS (
      SELECT band_id, band_val FROM bands
      GROUP BY 1, 2 HAVING COUNT(*) <= {_SRP_HOT_CAP}
    ),
    bf AS (
      SELECT bands.* FROM bands
      JOIN cool ON bands.band_id = cool.band_id
              AND bands.band_val = cool.band_val
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS ida, a.srp_code AS code_a,
                      b.vec_id AS idb, b.srp_code AS code_b
      FROM bf a JOIN bf b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
    )
    SELECT ida, idb,
           CAST(bit_count(xor(code_a, code_b)) AS BIGINT) AS hamming,
           CAST({_SRP_P} - bit_count(xor(code_a, code_b)) AS DOUBLE)
             / {_SRP_P} AS match_frac
    FROM cand
    WHERE bit_count(xor(code_a, code_b)) <= {_SRP_HAM_MAX}
    """,
)
def ns_srp_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded candidate pairs over the SRP codes — the
    consumer ns_embedding_rp's docstring promises ("a 100 TB corpus
    bands these 2-byte codes instead of 256-byte vectors"): split
    each 16-bit srp_code into 4 bands, self-join on band equality,
    keep pairs with exact code Hamming distance <= 3. By pigeonhole
    the banded recall at h <= 3 is GUARANTEED (a pair differing in
    <= 3 bits leaves at least one of 4 bands untouched — the simhash
    band argument), and P(bit match) = 1 - θ/π makes match_frac an
    angle estimate the downstream exact-cosine verifier thresholds.

    Determinism: codes replay the shared _SRP sign-fold (bit-exact
    both engines, same literals/decimal fold as ns_embedding_rp);
    banding, Hamming (bit_count over xor), and the h-gate are pure
    integer arithmetic; match_frac is ONE int/int double division.

    Scale: code building is row-local (zero shuffle); the band
    self-join is keyed on (band_id, band_val) with buckets hotter
    than {100} vectors dropped BEFORE pair generation (the winnowing
    hot-cap bound: candidate volume is Σ|bucket|² over capped
    buckets); the Hamming verify reads the 2-byte codes carried
    through the join — the 256-byte vectors are never touched after
    the projection pass. At production code width the bands widen to
    16-32 bits and the hot cap stops firing."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    codes = persist_evicting(_srp_code_cols(em), "srp_codes")
    # literal per-band shifts (shiftright needs an int, not a column)
    bands = codes.select(
        "vec_id",
        "srp_code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(
                            F.col("srp_code"), b * _SRP_BAND_BITS
                        )
                        .bitwiseAND(F.lit(_SRP_BAND_MASK))
                        .alias("band_val"),
                    )
                    for b in range(_SRP_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("vec_id", "srp_code", "bv.band_id", "bv.band_val")
    cool = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= _SRP_HOT_CAP)
        .select("band_id", "band_val")
    )
    bf = bands.join(cool, ["band_id", "band_val"])
    a = bf.select(
        "band_id",
        "band_val",
        F.col("vec_id").alias("ida"),
        F.col("srp_code").alias("code_a"),
    )
    b = bf.select(
        "band_id",
        "band_val",
        F.col("vec_id").alias("idb"),
        F.col("srp_code").alias("code_b"),
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "code_a", "idb", "code_b")
        .distinct()
    )
    ham = F.bit_count(
        F.col("code_a").bitwiseXOR(F.col("code_b"))
    )
    return (
        cand.filter(ham <= _SRP_HAM_MAX)
        .select(
            "ida",
            "idb",
            ham.cast("bigint").alias("hamming"),
            (
                (F.lit(_SRP_P) - ham).cast("double") / F.lit(_SRP_P)
            ).alias("match_frac"),
        )
    )


# ---------- matryoshka prefix-dimension retrieval audit ----------

# Prefix dims audited against the full 64-dim ranking (Kusupati et
# al. 2022, "Matryoshka Representation Learning": embeddings whose
# PREFIXES are themselves usable representations — serving tiers
# retrieve with a cheap prefix and re-rank with the full vector).
_MATRY_DIMS = [16, 32, 64]
_MATRY_K = 10


def _matry_prefix_ctes(d: int) -> str:
    """Per-dim prefix ranking CTE chain ending in r{d}(query_id,
    neighbor_id, rn) — textually the _cosine_ranked_sql_ctes /
    _SQL_NORMS / _SQL_DOT proven pairing with `embeddings` swapped
    for the emb{d} prefix-slice CTE and the unnest range capped at
    d (the fold has no terms past the slice on either engine)."""
    return f"""emb{d} AS (
      SELECT vec_id, embedding[1:{d}] AS embedding FROM embeddings
    ),
    q{d} AS (SELECT * FROM emb{d} WHERE vec_id < 5),
    n{d} AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)
                                AS VARCHAR)
                           AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS e FROM emb{d})
      GROUP BY vec_id
    ),
    d{d} AS (
      SELECT q.vec_id AS ida, c.vec_id AS idb,
             CAST(SUM(CAST(CAST(CAST(q.embedding[i.i] AS DOUBLE)
                                * CAST(c.embedding[i.i] AS DOUBLE)
                                AS VARCHAR)
                      AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM q{d} q, emb{d} c, (SELECT unnest(range(1, {d + 1})) AS i) i
      WHERE q.vec_id <> c.vec_id
      GROUP BY 1, 2
    ),
    r{d} AS (
      SELECT ida AS query_id, idb AS neighbor_id,
             row_number() OVER (
               PARTITION BY ida
               ORDER BY dd.dot / (nq.nrm * nc.nrm) DESC, idb) AS rn
      FROM d{d} dd
      JOIN n{d} nq ON nq.vec_id = dd.ida
      JOIN n{d} nc ON nc.vec_id = dd.idb
    )"""


def _matry_sql() -> str:
    ctes = ",\n    ".join(_matry_prefix_ctes(d) for d in _MATRY_DIMS)
    # LEFT join + summed hit flag, never an inner-join COUNT: a probe
    # whose prefix top-k misses the full top-k entirely must emit an
    # explicit 0-overlap row, not vanish from the audit.
    unions = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({d} AS BIGINT) AS dim, a.query_id,
             CAST(SUM(CASE WHEN b.neighbor_id IS NULL
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap
      FROM (SELECT * FROM r{d} WHERE rn <= {_MATRY_K}) a
      LEFT JOIN (SELECT * FROM r64 WHERE rn <= {_MATRY_K}) b
        USING (query_id, neighbor_id)
      GROUP BY 2"""
        for d in _MATRY_DIMS
    )
    return f"""
    WITH {ctes},
    ov AS (
{unions}
    )
    SELECT dim, query_id, n_overlap,
           CAST(n_overlap AS DOUBLE) / {float(_MATRY_K)!r} AS recall_at_k
    FROM ov
    """


@query("ns_embedding_matryoshka", _matry_sql())
def ns_embedding_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-dimension retrieval audit (Kusupati et al.
    2022): for each prefix width d ∈ {16, 32, 64}, rank the corpus by
    cosine over the FIRST d dims only and report per-probe overlap
    with the full-64-dim top-10 — the measurement that decides how
    small a serving tier's cheap first-pass representation can be
    before recall craters (prefix retrieval + full-vector re-rank is
    the standard two-stage layout; d=64 is the self-check row,
    overlap 10 by construction).

    Determinism: every per-dim ranking is the PROVEN cosine pairing
    (_dot_dec/_norm ↔ VARCHAR-routed decimal folds) applied to
    slice(embedding, 1, d) — the fold simply has no terms past d on
    either engine; overlap counts are exact integers; recall is one
    int→double division by the exact literal k.

    Scale: 3 prefix rankings + the shared full ranking, each the
    audited brute-force shape (broadcast probes, WindowGroupLimit
    top-k) with the prefix passes reading d/64 of the vector bytes —
    at 100 TB with columnar prefix storage the d=16 pass reads 4×
    less; the overlap join is k·|probes| rows per dim."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    full = cosine_ranked(em, _MATRY_K).select("query_id", "neighbor_id")
    parts = []
    for d in _MATRY_DIMS:
        emd = em.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        pr = cosine_ranked(emd, _MATRY_K).select("query_id", "neighbor_id")
        # left join + summed hit flag (not an inner-join count): a
        # probe with zero overlap emits an explicit 0 row
        parts.append(
            pr.join(
                full.withColumn("hit", F.lit(1)),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.sum(F.coalesce("hit", F.lit(0)))
                .cast("bigint")
                .alias("n_overlap")
            )
            .select(
                F.lit(d).cast("bigint").alias("dim"),
                "query_id",
                "n_overlap",
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.select(
        "dim",
        "query_id",
        "n_overlap",
        (F.col("n_overlap").cast("double") / F.lit(float(_MATRY_K))).alias(
            "recall_at_k"
        ),
    )


# ---------- MMR result diversification ----------

_MMR_LAMBDA = 0.5  # exact binary half: λ·rel and (1−λ)·sim both exact
_MMR_K = 5
_MMR_POOL = 10


def _mmr_sql() -> str:
    """Greedy MMR replayed as k−1 chained selection CTEs (the
    kcenter_coreset precedent): candidates + their pairwise cosines
    come from the proven fragments; each step picks argmax
    λ·rel − (1−λ)·max_sim_to_selected with (score DESC, neighbor_id)
    ties; MAX over doubles is order-free, the score is two exact-half
    multiplies + one subtract — bit-stable on both engines."""
    lam, ilam = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    steps = []
    for t in range(2, _MMR_K + 1):
        prev = f"selu{t - 1}"
        steps.append(f"""sc{t} AS (
      SELECT c.query_id, c.neighbor_id,
             {lam} * c.cosine - {ilam} * MAX(p.sim) AS mmr_score
      FROM cand c
      JOIN psim p ON p.query_id = c.query_id
                 AND p.na = c.neighbor_id
      JOIN {prev} s ON s.query_id = p.query_id
                   AND s.neighbor_id = p.nb
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} z
        WHERE z.query_id = c.query_id
          AND z.neighbor_id = c.neighbor_id)
      GROUP BY 1, 2, c.cosine
    ),
    sel{t} AS (
      SELECT query_id, neighbor_id, mmr_score,
             CAST({t} AS BIGINT) AS mmr_rank
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY mmr_score DESC, neighbor_id) AS rr
        FROM sc{t}) WHERE rr = 1
    ),
    selu{t} AS (
      SELECT * FROM selu{t - 1} UNION ALL SELECT * FROM sel{t}
    )""")
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_cosine_ranked_sql_ctes()},
    cand AS (
      SELECT query_id, neighbor_id, cosine
      FROM cos_ranked WHERE rn <= {_MMR_POOL}
    ),
    pairlist AS (
      SELECT a.query_id, a.neighbor_id AS na, b.neighbor_id AS nb
      FROM cand a JOIN cand b
        ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
    ),
    pdots AS (
      SELECT p.query_id, p.na, p.nb,
             CAST(SUM(CAST(CAST(CAST(x.embedding[i.i] AS DOUBLE)
                                * CAST(y.embedding[i.i] AS DOUBLE)
                                AS VARCHAR)
                      AS DECIMAL(38,12))) AS DOUBLE) AS dot
      FROM pairlist p
      JOIN embeddings x ON x.vec_id = p.na
      JOIN embeddings y ON y.vec_id = p.nb
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
      GROUP BY 1, 2, 3
    ),
    psim AS (
      SELECT pd.query_id, pd.na, pd.nb,
             pd.dot / (nx.nrm * ny.nrm) AS sim
      FROM pdots pd
      JOIN norms nx ON nx.vec_id = pd.na
      JOIN norms ny ON ny.vec_id = pd.nb
    ),
    sel1 AS (
      SELECT query_id, neighbor_id, {lam} * cosine AS mmr_score,
             CAST(1 AS BIGINT) AS mmr_rank
      FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rr
        FROM cand) WHERE rr = 1
    ),
    selu1 AS (SELECT * FROM sel1),
    {chain}
    SELECT query_id, neighbor_id, mmr_score, mmr_rank
    FROM selu{_MMR_K}
    """


@query("ns_mmr_diversify", _mmr_sql())
def ns_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998) of the cosine top-10 pool: greedily select k=5
    results per probe maximizing λ·rel(q,n) − (1−λ)·max_{s∈selected}
    sim(n,s), λ=0.5 — the standard re-rank that keeps a retrieval
    page from filling with near-duplicates of one hit (directly load-
    bearing in a dedup-heavy corpus: the top-10 of a near-dup cluster
    is one document five times).

    Determinism: candidate relevances and pairwise similarities are
    the proven exact-cosine pairing; λ and 1−λ are exact binary
    halves; MAX over a bounded double set is order-free; selection
    ties break (score DESC, neighbor_id). The greedy loop itself runs
    driver-side over the BOUNDED pool (k·|probes| rows + |probes|·
    pool² sims — the _adc_tables bounded-state pattern); the oracle
    replays it as k−1 chained argmax CTEs.

    Scale: the corpus is touched only by the audited top-k ranking
    pass; the pairwise-sim pass is |probes|·pool² rows (450 here)
    regardless of corpus size, so diversification cost is constant —
    at 100 TB the pool join rides the same broadcast the candidates
    came from."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    cand = cosine_ranked(em, _MMR_POOL)
    norms = em.select(
        "vec_id", _norm(F.col("embedding")).alias("nrm"), "embedding"
    )
    a = cand.select("query_id", F.col("neighbor_id").alias("na"))
    b = cand.select("query_id", F.col("neighbor_id").alias("nb"))
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("na") != F.col("nb"))
        .join(
            norms.select(
                F.col("vec_id").alias("na"),
                F.col("embedding").alias("ea"),
                F.col("nrm").alias("nna"),
            ),
            "na",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("nb"),
                F.col("embedding").alias("eb"),
                F.col("nrm").alias("nnb"),
            ),
            "nb",
        )
        .select(
            "query_id",
            "na",
            "nb",
            (
                _dot_dec(F.col("ea"), F.col("eb"))
                / (F.col("nna") * F.col("nnb"))
            ).alias("sim"),
        )
    )
    crows = cand.collect()  # bounded: pool·|probes| = 50 rows
    srows = pairs.collect()  # bounded: |probes|·pool² = 450 rows
    rel: dict[int, dict[int, float]] = {}
    for r in crows:
        rel.setdefault(int(r.query_id), {})[int(r.neighbor_id)] = float(
            r.cosine
        )
    sim: dict[tuple[int, int, int], float] = {}
    for r in srows:
        sim[(int(r.query_id), int(r.na), int(r.nb))] = float(r.sim)
    out = []
    for qid in sorted(rel):
        pool = rel[qid]
        selected: list[int] = []
        for t in range(1, _MMR_K + 1):
            best = None
            for n, rv in pool.items():
                if n in selected:
                    continue
                if selected:
                    maxsim = max(sim[(qid, n, s)] for s in selected)
                    score = (
                        _MMR_LAMBDA * rv - (1.0 - _MMR_LAMBDA) * maxsim
                    )
                else:
                    score = _MMR_LAMBDA * rv
                key = (-score, n)
                if best is None or key < best[0]:
                    best = (key, n, score)
            _key, n, score = best
            selected.append(n)
            out.append((qid, n, score, t))
    return spark.createDataFrame(
        out,
        "query_id long, neighbor_id long, mmr_score double, "
        "mmr_rank long",
    )


# ---------- per-label centroid drift (embedding-space monitoring) ----------


@query(
    "ns_embedding_drift",
    """
    WITH ex AS (
      SELECT e.label, i.i AS dim, CAST(e.embedding[i.i] AS DOUBLE) AS v
      FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) i
    ),
    pc AS (
      SELECT label, dim,
             CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(28,12)))
                  AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex GROUP BY 1, 2
    ),
    gc AS (
      SELECT dim,
             CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(28,12)))
                  AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex GROUP BY 1
    ),
    d AS (
      SELECT pc.label, pc.n,
             (pc.s / pc.n - gc.s / gc.n)
               * (pc.s / pc.n - gc.s / gc.n) AS sq,
             gc.n AS n_total
      FROM pc JOIN gc ON gc.dim = pc.dim
    )
    SELECT label, MAX(n) AS n,
           CAST(MAX(n) AS DOUBLE) / MAX(n_total) AS share,
           sqrt(CAST(SUM(CAST(CAST(sq AS VARCHAR) AS DECIMAL(38,12)))
                     AS DOUBLE)) AS centroid_l2
    FROM d GROUP BY label
    """,
)
def ns_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-space drift monitor — the slice-level
    companion to ns_embedding_profile's per-dimension stats: for
    every label (data slice), its row count, corpus share, and the
    L2 distance between the slice centroid and the GLOBAL centroid.
    This is the monitoring read a training pipeline runs per
    ingestion batch: a slice whose centroid_l2 jumps between
    snapshots has distribution shift in embedding space (new content
    regime, encoder drift, upstream corruption) long before any
    label-count monitor fires; share catches sampling drift in the
    same pass.

    Determinism: per-(label, dim) and per-dim sums are exact decimal
    (VARCHAR-routed in the oracle, the _SQL_DOT convention); each
    centroid coordinate is one double division of those bit-equal
    sums; the squared diff is row-level IEEE; the 64-term distance
    sum is an UNORDERED exact-decimal aggregate (order-independent
    by construction) under one correctly-rounded sqrt.

    Scale: one posexplode pass → 64·|labels| and 64-row aggregates
    with map-side partials — the shuffle carries only dim-keyed
    partial sums regardless of corpus size; everything after is
    broadcast-sized."""
    em = tbl(spark, sf_dir, "embeddings", parallel=True)
    ex = em.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    pc = ex.groupBy("label", "dim").agg(
        F.sum(F.col("v").cast("decimal(28,12)"))
        .cast("double")
        .alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    gc = ex.groupBy("dim").agg(
        F.sum(F.col("v").cast("decimal(28,12)"))
        .cast("double")
        .alias("gs"),
        F.count("*").cast("bigint").alias("n_total"),
    )
    diff = F.col("s") / F.col("n") - F.col("gs") / F.col("n_total")
    d = pc.join(F.broadcast(gc), "dim").select(
        "label", "n", "n_total", (diff * diff).alias("sq")
    )
    return d.groupBy("label").agg(
        F.max("n").alias("n"),
        (F.max("n").cast("double") / F.max("n_total")).alias("share"),
        F.sqrt(
            F.sum(F.col("sq").cast("decimal(38,12)")).cast("double")
        ).alias("centroid_l2"),
    )
