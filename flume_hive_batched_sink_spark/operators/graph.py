"""Iterative graph operators over a derived co-purchase graph.

The reference's dataflow is a linear landing pipeline
(FlumeHiveBatchedSink.scala — parse → route → batch → commit); it has
no graph surface. These operators extend the engine with the two
iterative-graph primitives a training-data/analytics platform leans
on at scale — PageRank-style influence scoring (e.g. domain authority
for crawl prioritization) and multi-source BFS reachability (e.g.
link-distance contamination screens) — expressed Pregel-style as
DataFrame join/agg rounds, the idiomatic Spark formulation when the
iteration count is small and fixed.

Graph: the customer↔supplier co-purchase graph from TPC-H —
an edge (customer c, supplier s) whenever some lineitem with
l_quantity >= 48 links them through an order (the quantity screen
keeps the graph sparse enough that BFS frontiers are interesting
rather than everything being 2 hops from everything). Node ids are
collision-free at any scale: customer key k → 2k, supplier key k →
2k+1. Edges are materialized in BOTH directions, so the graph is
undirected-as-symmetric-directed, every node has outdegree >= 1, and
PageRank has no dangling-mass term.

Determinism: PageRank per-edge contributions are double divisions of
identical operands in both engines; per-node contribution sums route
through the exact DECIMAL(38,12) convention (Spark casts the double
directly — shortest-string half-up; the DuckDB twin routes through
VARCHAR, see similarity._SQL_DOT's comment); the damping update
0.15/n + 0.85*s is scalar double arithmetic on identical operands.
BFS is pure integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import persist_evicting, query, tbl

_EDGE_QTY = 48  # lineitem quantity screen keeping the graph sparse
_PR_ITERS = 3
_PR_D = 0.85
_BFS_ROUNDS = 4
_SEED_MOD = 97  # customers with custkey % 97 == 0 seed the BFS

_DEC = "decimal(38,12)"


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric directed edge list (src, dst) — ONE distinct
    customer-supplier pair pass, then both directions unioned.
    At 100 TB the distinct is the only shuffle (keyed on the pair);
    the union is map-side."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _EDGE_QTY)
        .select("l_orderkey", "l_suppkey")
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("snode").alias("src"), F.col("cnode").alias("dst")
        )
    )


def _edges_sql_ctes() -> str:
    """Shared DuckDB CTE chain: ed (distinct pairs), edges
    (symmetric), nodes, deg. Interpolated by both graph oracles so
    the graph definition can never drift between them."""
    return f"""ed AS (
      SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= {_EDGE_QTY}
    ),
    edges AS (
      SELECT cnode AS src, snode AS dst FROM ed
      UNION ALL
      SELECT snode AS src, cnode AS dst FROM ed
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src)"""


def _pagerank_sql() -> str:
    ctes = [_edges_sql_ctes()]
    ctes.append("nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)")
    ctes.append(
        "r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)"
    )
    for t in range(1, _PR_ITERS + 1):
        ctes.append(f"""c{t} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(CAST(r.r / d.outdeg AS VARCHAR)
                           AS DECIMAL(38,12))) AS DOUBLE) AS s
      FROM edges e
      JOIN r{t - 1} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )""")
        ctes.append(f"""r{t} AS (
      SELECT n.node,
             {1.0 - _PR_D} / nn.n
               + {_PR_D} * COALESCE(c{t}.s, 0.0) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN c{t} ON c{t}.node = n.node
    )""")
    return f"""
    WITH {','.join(ctes)}
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           r AS pagerank
    FROM r{_PR_ITERS}
    """


@query("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank ({i} synchronous iterations, d = {d}) over the
    co-purchase graph — the Pregel pattern as DataFrame rounds: each
    iteration is one shuffle join of the (persisted) edge list
    against the current rank frame plus one map-side-combined
    contribution aggregate; the damping update is a broadcast-free
    per-node projection. On a 1000-executor run the edge list is
    hash-partitioned on src ONCE (the persist pins it) and every
    iteration's join reuses that layout — the rank frame, |V| rows,
    is the only thing reshuffled per round. Fixed small iteration
    count keeps the lineage/plan linear; a production variant
    checkpoints every ~10 rounds.

    Spark-first note: this deliberately does NOT collect anything to
    the driver — ranks live distributed end to end (contrast a
    GraphX/driver-loop port).
    """
    from pyspark.sql import Window

    # outdeg attached via ONE window pass instead of a per-iteration
    # deg join (guide §2.4: two operations keyed the same way share
    # one exchange): the window's hash-partitioning on src is ALSO
    # the layout every iteration's rank join needs, and the persist
    # pins it — so the docstring's "edge list partitioned on src
    # ONCE" now holds physically (the pre-optimization form never
    # repartitioned and reshuffled edges every round; plan diff in
    # plans/r14/graph_pagerank_{before,after}.txt).
    edges = persist_evicting(
        copurchase_edges(spark, sf_dir).withColumn(
            "outdeg",
            F.count("*")
            .over(Window.partitionBy("src"))
            .cast("bigint"),
        ),
        "graph_edges",
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # bounded scalar (|V|), not a data collect
    ranks = nodes.select(
        "node", F.lit(1.0 / n).cast("double").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("r") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("c").cast(_DEC)).cast("double").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - _PR_D) / n)
                    + F.lit(_PR_D) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").alias("pagerank"),
    )


graph_pagerank.__doc__ = graph_pagerank.__doc__.format(
    i=_PR_ITERS, d=_PR_D
)


def _bfs_sql() -> str:
    ctes = [_edges_sql_ctes()]
    ctes.append(f"""d0 AS (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
      WHERE node % {2 * _SEED_MOD} = 0
    )""")
    for t in range(1, _BFS_ROUNDS + 1):
        ctes.append(f"""d{t} AS (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{t - 1}
        UNION ALL
        SELECT e.dst AS node, p.dist + 1 AS dist
        FROM edges e JOIN d{t - 1} p ON p.node = e.src
      ) u GROUP BY node
    )""")
    return f"""
    WITH {','.join(ctes)}
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           dist
    FROM d{_BFS_ROUNDS}
    """


@query("graph_bfs_reach", _bfs_sql())
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS ({r} synchronous rounds) from the seed set
    (customers with custkey % {m} == 0) over the co-purchase graph:
    emits every node within {r} hops of any seed with its exact hop
    distance (min over seeds) — the link-distance screen shape
    (e.g. 'drop every page within 2 hops of a known-bad host').
    Same Pregel-as-joins shape as graph_pagerank against the same
    persisted edge list; state is (node, dist) integers only, so the
    whole computation is exact by construction. The union+min-agg
    per round implements the textbook relaxation dist_{{t+1}}(v) =
    min(dist_t(v), min over in-neighbors u of dist_t(u)+1); a node
    outside the frontier carries no row, keeping per-round state
    |reached| rather than |V|."""
    # persist pinned hash-partitioned on src (guide §2.4): every
    # round's frontier join keys on src, so only the (small) frontier
    # side reshuffles per round; the repartition also makes the
    # nodes/seed distinct exchange-free over the cached layout
    edges = persist_evicting(
        copurchase_edges(spark, sf_dir).repartition("src"),
        "graph_edges_bfs",
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    d = nodes.filter(
        F.col("node") % (2 * _SEED_MOD) == 0
    ).select("node", F.lit(0).cast("bigint").alias("dist"))
    for _ in range(_BFS_ROUNDS):
        step = (
            edges.join(d, edges.src == d.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        d = (
            d.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    return d.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        "dist",
    )


graph_bfs_reach.__doc__ = graph_bfs_reach.__doc__.format(
    r=_BFS_ROUNDS, m=_SEED_MOD
)


# ---------- butterfly (bipartite 4-cycle) counting ----------

# Per-customer degree cap before wedge enumeration: a hub customer
# with degree d contributes C(d,2) wedges, so one pathological hub
# can dominate the join. The cap is applied identically by both
# engines (the winnowing hot-fp / containment posting-cap pattern);
# no sf0.01/sf0.1 customer comes near it, so it is a pure at-scale
# guard, not a result filter at test scales.
_BFLY_DEG_CAP = 256


def capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_edc_sql_ctes`'s edc: the distinct bipartite
    (cnode, snode) pair list with hub customers (degree >
    _BFLY_DEG_CAP) removed. Shared by graph_butterfly_count and
    graph_node_similarity."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _EDGE_QTY)
        .select("l_orderkey", "l_suppkey")
    )
    ed = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    degc = ed.groupBy("cnode").agg(F.count("*").alias("deg"))
    return ed.join(
        degc.filter(F.col("deg") <= _BFLY_DEG_CAP).select("cnode"),
        "cnode",
    )


# Shared capped-bipartite-pair CTE chain (ed → customer degree cap →
# edc) — interpolated by the butterfly and node-similarity oracles.
def _edc_sql_ctes() -> str:
    return f"""ed AS (
      SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= {_EDGE_QTY}
    ),
    degc AS (
      SELECT cnode, COUNT(*) AS deg FROM ed GROUP BY cnode
    ),
    edc AS (
      SELECT ed.* FROM ed JOIN degc ON degc.cnode = ed.cnode
      WHERE degc.deg <= {_BFLY_DEG_CAP}
    )"""


def _bfly_sql() -> str:
    return f"""
    WITH {_edc_sql_ctes()},
    w AS (
      SELECT a.snode AS s1, b.snode AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM edc a JOIN edc b
        ON a.cnode = b.cnode AND a.snode < b.snode
      GROUP BY 1, 2
    )
    SELECT s1 // 2 AS supp_a, s2 // 2 AS supp_b, n_common,
           CAST(n_common * (n_common - 1) // 2 AS BIGINT)
             AS n_butterflies
    FROM w WHERE n_common >= 2
    """


@query("graph_butterfly_count", _bfly_sql())
def graph_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (K2,2 / bipartite 4-cycle) counting over the
    co-purchase graph — the bipartite analogue of triangle counting
    (a bipartite graph has NO triangles, so 4-cycles are its basic
    cohesion motif; Sanei-Mehri et al., KDD'18): for every supplier
    pair sharing >= 2 customers, the number of shared customers and
    the exact butterfly count C(n_common, 2). High-butterfly pairs
    are near-interchangeable suppliers — the co-occurrence signal a
    recommender or assortment analysis reads off this graph.

    Spark form: wedge enumeration through the SHARED-customer side
    (one self-join of the degree-capped bipartite pair list on
    cnode), then a count aggregate — Σ_c C(deg(c), 2) wedge rows,
    the standard bound, with the per-customer degree cap making hub
    blowup impossible at 100 TB (cap applied identically in the
    oracle, so parity is unconditional). Integer arithmetic end to
    end; n·(n−1) is even, so the halved division is exact.
    """
    edc = capped_pairs(spark, sf_dir)
    a = edc.select("cnode", F.col("snode").alias("s1"))
    b = edc.select("cnode", F.col("snode").alias("s2"))
    w = (
        a.join(b, "cnode")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    nc = F.col("n_common")
    return w.select(
        F.shiftright("s1", 1).alias("supp_a"),
        F.shiftright("s2", 1).alias("supp_b"),
        "n_common",
        ((nc * (nc - F.lit(1))) / F.lit(2)).cast("bigint")
        .alias("n_butterflies"),
    )


# ---------- neighborhood similarity (link-prediction primitives) ----------


def _nodesim_sql() -> str:
    return f"""
    WITH {_edc_sql_ctes()},
    degs AS (
      SELECT snode, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edc GROUP BY snode
    ),
    w AS (
      SELECT a.snode AS s1, b.snode AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM edc a JOIN edc b
        ON a.cnode = b.cnode AND a.snode < b.snode
      GROUP BY 1, 2
    )
    SELECT w.s1 // 2 AS supp_a, w.s2 // 2 AS supp_b,
           w.n_common, da.deg AS deg_a, db.deg AS deg_b,
           CAST(w.n_common AS DOUBLE)
             / (da.deg + db.deg - w.n_common) AS jaccard,
           CAST(w.n_common AS DOUBLE)
             / least(da.deg, db.deg) AS overlap_coef,
           CAST(w.n_common AS DOUBLE)
             / sqrt(CAST(da.deg * db.deg AS DOUBLE)) AS cosine
    FROM w
    JOIN degs da ON da.snode = w.s1
    JOIN degs db ON db.snode = w.s2
    """


@query("graph_node_similarity", _nodesim_sql())
def graph_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-set similarity between supplier pairs sharing at
    least one customer — the three standard link-prediction /
    entity-resolution primitives over the co-purchase graph: Jaccard
    |A∩B|/|A∪B|, overlap coefficient |A∩B|/min(|A|,|B|), and
    set-cosine |A∩B|/√(|A|·|B|) of the customer neighborhoods. The
    graded companion to graph_butterfly_count's motif census: the
    butterfly count says HOW MUCH cohesion a pair has in absolute
    terms, these coefficients normalize it by degree (a 2-customer
    niche pair with full overlap outranks a hub pair sharing 2 of
    200). Degrees and commons both come from the SAME degree-capped
    pair list (_edc_sql_ctes / capped_pairs — one definition each
    side), so the coefficients are internally consistent.

    Determinism: counts are exact integers from the shared wedge
    join; each coefficient is one double division (cosine adds one
    exact integer product and one correctly-rounded sqrt) —
    bit-equal both engines.

    Scale: identical wedge bound to graph_butterfly_count
    (Σ_c C(deg(c), 2) with the per-customer cap); the degree frame
    is |suppliers| rows, broadcast into the final joins."""
    edc = capped_pairs(spark, sf_dir)
    degs = edc.groupBy("snode").agg(
        F.count("*").cast("bigint").alias("deg")
    )
    a = edc.select("cnode", F.col("snode").alias("s1"))
    b = edc.select("cnode", F.col("snode").alias("s2"))
    w = (
        a.join(b, "cnode")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    da = degs.select(F.col("snode").alias("s1"), F.col("deg").alias("deg_a"))
    db = degs.select(F.col("snode").alias("s2"), F.col("deg").alias("deg_b"))
    nc = F.col("n_common").cast("double")
    return (
        w.join(F.broadcast(da), "s1")
        .join(F.broadcast(db), "s2")
        .select(
            F.shiftright("s1", 1).alias("supp_a"),
            F.shiftright("s2", 1).alias("supp_b"),
            "n_common",
            "deg_a",
            "deg_b",
            (nc / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")))
            .alias("jaccard"),
            (nc / F.least("deg_a", "deg_b")).alias("overlap_coef"),
            (
                nc
                / F.sqrt((F.col("deg_a") * F.col("deg_b")).cast("double"))
            ).alias("cosine"),
        )
    )
