"""Iterative graph-analytics plans (implementations in
:mod:`..operators.graph`).

North-star extension (SURVEY §7.1 step 7) — no counterpart in the
reference (DataFusion 40 reaches fixpoints only via recursive CTEs).
The oracle unrolls the fixed iteration count as chained CTEs — the
SQL spelling of the same arithmetic, generated from the SAME damping
constants so the float literals are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import register, table
from ..operators import graph as G
from ..operators.materialize import materialize

_DAMP = 0.85
_ITERS = 5
_RD = 10  # per-round rounding digits (cross-engine float re-sync)


def _graph_cte() -> str:
    return """
WITH pairs AS (
  SELECT DISTINCT 2 * l_suppkey AS s, 2 * l_partkey + 1 AS p FROM lineitem
), e AS (
  SELECT s AS a, p AS b FROM pairs UNION ALL SELECT p AS a, s AS b FROM pairs
), deg AS (
  SELECT a, COUNT(*) AS deg FROM e GROUP BY a
), nodes AS (
  SELECT DISTINCT a AS node FROM e
)"""


def _pagerank_tail(reset_cte: str) -> str:
    """Shared iteration unroll: ``reset_cte`` must define base(node,
    reset); rank₀ = reset, rank_{k+1} = (1−d)·reset + d·Σ — the exact
    arithmetic of operators/graph.py:pagerank (same rounded reset, so
    float literals agree bit-for-bit)."""
    sql = reset_cte + """, p0 AS (
  SELECT node, reset AS rank FROM base
)"""
    for k in range(1, _ITERS + 1):
        sql += """, p%(k)d AS (
  SELECT b.node,
         ROUND(%(base)r * b.reset + %(damp)r * COALESCE(c.m, 0.0), %(rd)d)
           AS rank
  FROM base b
  LEFT JOIN (
    SELECT e.b, SUM(p.rank / d.deg) AS m
    FROM e JOIN p%(prev)d p ON p.node = e.a JOIN deg d ON d.a = e.a
    GROUP BY e.b
  ) c ON c.b = b.node
)""" % {"k": k, "prev": k - 1, "base": 1.0 - _DAMP, "damp": _DAMP,
        "rd": _RD}
    sql += """
SELECT node, node_type, pagerank, pos FROM (
  SELECT node,
         CASE WHEN node %% 2 = 0 THEN 'supplier' ELSE 'part' END AS node_type,
         ROUND(rank, 8) AS pagerank,
         CAST(ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS INT) AS pos
  FROM p%(last)d
) WHERE pos <= 20
""" % {"last": _ITERS}
    return sql


def _pagerank_oracle() -> str:
    return _pagerank_tail(_graph_cte() + """, tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), base AS (
  SELECT node, ROUND(1.0 / t.n, %(rd)d) AS reset
  FROM nodes CROSS JOIN tot t
)""" % {"rd": _RD})


def _ppr_oracle() -> str:
    return _pagerank_tail(_graph_cte() + """, seeds AS (
  SELECT node AS seed FROM nodes WHERE node %% 2 = 0 AND (node / 2) %% 50 = 0
), stot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS s FROM seeds
), base AS (
  SELECT n.node,
         ROUND(CASE WHEN sd.seed IS NOT NULL THEN 1.0 / st.s
                    ELSE 0.0 END, %(rd)d) AS reset
  FROM nodes n CROSS JOIN stot st
  LEFT JOIN seeds sd ON sd.seed = n.node
)""" % {"rd": _RD})


@register(
    "graph_pagerank_supply_chain",
    oracle=_pagerank_oracle(),
    doc="Fixed-iteration PageRank (5 rounds, d=0.85) over the "
        "supplier↔part co-occurrence graph mined from lineitem "
        "(symmetrized bipartite edges; node id parity encodes the "
        "side) — the 'which suppliers/parts anchor the supply chain' "
        "centrality.  Spark side is a driver loop of keyed joins with "
        "per-round checkpointing (work per round ∝ edges, state ∝ "
        "nodes — the scale path recursive CTEs don't have); the "
        "oracle unrolls the same five rounds as chained CTEs.  Both "
        "engines round every round's ranks to 10 decimals so float "
        "summation-order noise never compounds.  Top-20 by final "
        "rank, uniquely ordered. operators/graph.py:pagerank.",
    tags=("graph",),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _supply_edges(spark, sf_dir)
    pr = G.pagerank(e, iterations=_ITERS, damping=_DAMP, round_digits=_RD)
    return _top20(pr)


def _supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pairs = (li.select((F.col("l_suppkey") * 2).alias("s"),
                       (F.col("l_partkey") * 2 + 1).alias("p"))
             .distinct())
    # Symmetrize by a map-side explode, not union-of-two-selects: the
    # union spelling re-ran the whole scan+distinct once per branch
    # (no exchange reuse across the branches' differing projections —
    # r12 plan audit, plans/r12/graph_supply_edge_build_*.txt).
    return (pairs.select(F.explode(F.array(
        F.struct(F.col("s").alias("src"), F.col("p").alias("dst")),
        F.struct(F.col("p").alias("src"), F.col("s").alias("dst"))))
        .alias("e")).select("e.src", "e.dst"))


def _top20(pr: DataFrame) -> DataFrame:
    from ..operators.ranking import topk_with_rank
    # TakeOrdered prunes per partition before the 20-row rank window
    # (operators/ranking.py) — no whole-node-set single-partition shuffle
    return topk_with_rank(
        pr.select("node",
                  F.when(F.col("node") % 2 == 0, F.lit("supplier"))
                   .otherwise(F.lit("part")).alias("node_type"),
                  F.round(F.col("rank"), 8).alias("pagerank")),
        [F.col("pagerank").desc(), F.col("node")], 20, "pos")


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(),
    doc="PERSONALIZED PageRank: teleport mass restarts over a seed set "
        "only (every 50th supplier), so the stationary mass ranks the "
        "seeds' supply-chain neighborhoods — the similar-node / "
        "recommendation primitive (random walk with restart).  Same "
        "driver-loop machinery and per-round float re-sync as the "
        "uniform entry; the seed set is broadcast.  Top-20, uniquely "
        "ordered. operators/graph.py:pagerank(reset=...).",
    tags=("graph",),
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    seeds = (li.where(F.col("l_suppkey") % 50 == 0)
             .select((F.col("l_suppkey") * 2).alias("seed")).distinct())
    pr = G.pagerank(_supply_edges(spark, sf_dir), iterations=_ITERS,
                    damping=_DAMP, round_digits=_RD, reset=seeds)
    return _top20(pr)


# Part co-purchase graph: parts are connected when some order contains
# both.  Shared by the triangle-count and degree-distribution entries.
_COPURCHASE_CTE = """
WITH pairs AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase edges (the _COPURCHASE_CTE mirror).

    Built WITHOUT a self-join: one groupBy collects each order's
    distinct part set (sorted), the C(k,2) pairs expand MAP-SIDE via
    nested array transforms inside codegen, and one distinct
    deduplicates across orders — two shuffles total (groupBy +
    distinct) vs. the self-join spelling's four (two distinct builds +
    the join + the dedup), measured 1.6x faster at sf0.1.  Per-order
    fan-out is C(k,2) with k = parts per order (bounded, ~4 in TPC-H);
    an order with a pathological k would salt the groupBy, not change
    the shape."""
    li = table(spark, sf_dir, "lineitem")
    grouped = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps")))
    pairs = F.flatten(F.transform(
        F.col("ps"),
        lambda x, i: F.transform(
            F.slice(F.col("ps"), i + 2,
                    F.greatest(F.size(F.col("ps")) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("u"), y.alias("v")))))
    return (grouped.select(F.explode(pairs).alias("p"))
            .select("p.u", "p.v").distinct())


@register(
    "graph_triangle_count",
    oracle=f"""
{_COPURCHASE_CTE}, ori AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS s,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS d
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
), tri AS (
  SELECT e1.s AS a, e1.d AS b, e2.d AS c
  FROM ori e1
  JOIN ori e2 ON e2.s = e1.d
  JOIN ori e3 ON e3.s = e1.s AND e3.d = e2.d
)
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM tri JOIN part p ON p.p_partkey = LEAST(a, LEAST(b, c))
GROUP BY p.p_brand
ORDER BY brand
""",
    doc="Triangle counting on the part co-purchase graph (parts "
        "connected when one order contains both), grouped by the brand "
        "of each triangle's least vertex.  DEGREE-ORDERED orientation — "
        "each undirected edge points from its lower-(degree, id) "
        "endpoint — so oriented out-degree is O(sqrt(2m)) and wedge "
        "fan-out stays bounded on power-law graphs; a naive id-ordered "
        "orientation puts a low-id hub's whole neighborhood on one "
        "join key.  Two shuffled equi-joins close the wedges; no "
        "cartesian anywhere.  The oracle mirrors the orientation "
        "tie-break exactly, so every triangle — and the hash — pins "
        "the algorithm, not just the total. "
        "operators/graph.py:undirected_distinct,degree_orient,triangles.",
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    tri = G.triangles(G.degree_orient(_copurchase_edges(spark, sf_dir)))
    m = F.least(F.col("a"), F.least(F.col("b"), F.col("c")))
    return (tri.select(m.alias("m"))
            .join(part.select(F.col("p_partkey").alias("m"), "p_brand"), "m")
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(F.count("*").cast("bigint").alias("n_triangles"))
            .orderBy("brand"))


@register(
    "graph_degree_distribution",
    oracle=f"""
{_COPURCHASE_CTE}
SELECT deg AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg
GROUP BY deg
ORDER BY degree
""",
    doc="Degree distribution of the part co-purchase graph — the "
        "one-pass structural profile run before any graph algorithm "
        "(it decides broadcast vs shuffle regimes and salting needs; "
        "see diag_key_skew_profile for the relational twin).  Distinct "
        "pair build + one keyed count + one histogram agg; everything "
        "map-side combinable. operators/graph.py:undirected_distinct.",
    tags=("graph", "diagnostics"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both degree legs scan the edge list — materialize it once
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    return (deg.groupBy(F.col("deg").cast("bigint").alias("degree"))
            .agg(F.count("*").cast("bigint").alias("n_nodes"))
            .orderBy("degree"))


@register(
    "graph_adamic_adar",
    oracle=f"""
{_COPURCHASE_CTE}, und2 AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), centers AS (
  SELECT node, CAST(ROUND(1000000.0 / ln(deg)) AS BIGINT) AS wmicro
  FROM deg WHERE deg BETWEEN 2 AND 256
), wedges AS (
  SELECT a.v AS seed_id, b.v AS cand_id, c.wmicro
  FROM und2 a
  JOIN und2 b ON a.u = b.u AND a.v != b.v
  JOIN centers c ON c.node = a.u
  WHERE a.v % 200 = 0
), scored AS (
  SELECT seed_id, cand_id,
         CAST(SUM(wmicro) AS BIGINT) AS score_micro,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM und e
                    WHERE e.u = LEAST(w.seed_id, w.cand_id)
                      AND e.v = GREATEST(w.seed_id, w.cand_id))
  GROUP BY seed_id, cand_id
), ranked AS (
  SELECT seed_id, cand_id, score_micro, n_common,
         ROW_NUMBER() OVER (ORDER BY score_micro DESC, seed_id,
                            cand_id) AS r
  FROM scored
)
SELECT seed_id, cand_id,
       ROUND(score_micro / 1000000.0, 4) AS aa_score,
       n_common, CAST(r AS INT) AS rank
FROM ranked WHERE r <= 20 ORDER BY rank
""",
    doc="Adamic-Adar link prediction FOR A SEED SET on the part "
        "co-purchase graph: the top-20 (seed, candidate) part pairs "
        "most likely to co-occur next, scored sum(1/ln(deg(z))) over "
        "common neighbors z, existing edges excluded — the classic "
        "common-neighbor recommender in its practical 'recommend for "
        "these items' form.  The seed restriction (every 200th part) "
        "is what bounds work: all-pairs AA on this graph is 148M "
        "wedge pairs (avg degree ~120 — measured, 46-53 s however the "
        "shuffles are arranged), while per-seed wedges are "
        "deg x |N(z) ∩ seeds| — the same reason personalized PageRank "
        "exists beside uniform.  Wedges expand MAP-SIDE from each "
        "center's adjacency array with the center weight attached "
        "(integer micro-units — order-independent sums); hub centers "
        "(deg > 256) pruned as part of the semantics, mirrored in the "
        "oracle.  plans/graph_queries.py:graph_adamic_adar.",
    tags=("graph",),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    und2 = (und.select("u", "v")
            .unionAll(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v"))))
    adj = (und2.groupBy(F.col("u").alias("z"))
           .agg(F.array_sort(F.collect_list("v")).alias("nbrs")))
    deg = F.size("nbrs")
    centers = (adj.where((deg >= 2) & (deg <= 256))
               .withColumn("wmicro",
                           F.round(F.lit(1000000.0)
                                   / F.log(deg.cast("double")))
                            .cast("bigint")))
    seeds_in = F.filter(F.col("nbrs"), lambda x: x % 200 == 0)
    pairs = F.flatten(F.transform(
        seeds_in,
        lambda s: F.transform(
            F.filter(F.col("nbrs"), lambda b: b != s),
            lambda b: F.struct(s.alias("seed_id"), b.alias("cand_id")))))
    wedges = (centers.select(F.explode(pairs).alias("p"), "wmicro")
              .select("p.seed_id", "p.cand_id", "wmicro"))
    agg = (wedges.groupBy("seed_id", "cand_id")
           .agg(F.sum("wmicro").cast("bigint").alias("score_micro"),
                F.count(F.lit(1)).cast("bigint").alias("n_common")))
    lo = F.least(agg["seed_id"], agg["cand_id"])
    hi = F.greatest(agg["seed_id"], agg["cand_id"])
    scored = agg.join(und, (und["u"] == lo) & (und["v"] == hi),
                      "left_anti")
    # Global top-20: orderBy+limit plans a distributed
    # TakeOrderedAndProject (per-partition heaps, driver merge of 20-row
    # tails); the rank window then runs over the 20-row GlobalLimit —
    # never a one-task sort of the full candidate table (the r9
    # row_number-then-filter spelling was exactly that).
    order = [F.col("score_micro").desc(), F.col("seed_id"),
             F.col("cand_id")]
    top = scored.orderBy(*order).limit(20)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))
            .select("seed_id", "cand_id",
                    F.round(F.col("score_micro") / 1000000.0, 4)
                     .alias("aa_score"),
                    "n_common", F.col("rank").cast("int").alias("rank"))
            .orderBy("rank"))


@register(
    "graph_bfs_reach",
    oracle=f"""
{_COPURCHASE_CTE}, sym AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), d0 AS (
  SELECT node FROM deg WHERE node % 200 = 0
), d1 AS (
  SELECT DISTINCT s.b AS node FROM sym s JOIN d0 ON d0.node = s.a
  WHERE s.b NOT IN (SELECT node FROM d0)
), d2 AS (
  SELECT DISTINCT s.b AS node FROM sym s JOIN d1 ON d1.node = s.a
  WHERE s.b NOT IN (SELECT node FROM d0)
    AND s.b NOT IN (SELECT node FROM d1)
), d3 AS (
  SELECT DISTINCT s.b AS node FROM sym s JOIN d2 ON d2.node = s.a
  WHERE s.b NOT IN (SELECT node FROM d0)
    AND s.b NOT IN (SELECT node FROM d1)
    AND s.b NOT IN (SELECT node FROM d2)
)
SELECT * FROM (
  SELECT CAST(-1 AS INT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg WHERE node NOT IN (SELECT node FROM d0)
             AND node NOT IN (SELECT node FROM d1)
             AND node NOT IN (SELECT node FROM d2)
             AND node NOT IN (SELECT node FROM d3)
  UNION ALL
  SELECT CAST(0 AS INT), CAST(COUNT(*) AS BIGINT) FROM d0
  UNION ALL
  SELECT CAST(1 AS INT), CAST(COUNT(*) AS BIGINT) FROM d1
  UNION ALL
  SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT) FROM d2
  UNION ALL
  SELECT CAST(3 AS INT), CAST(COUNT(*) AS BIGINT) FROM d3
)
ORDER BY depth
""",
    doc="Multi-source BFS layers on the part co-purchase graph: "
        "min-hop distance from the every-200th-part seed set (the "
        "Adamic-Adar entry's seeds) to depth 3, one row per layer "
        "plus an unreached row — blast-radius / neighborhood-size "
        "profiling, the frontier-expansion primitive under every "
        "'within N hops' product question.  Per round: ONE frontier-"
        "edge equi-join + ONE anti-join against the visited set "
        "(work ∝ frontier-adjacent edges, rounds = the semantic depth "
        "cap); layers are checkpointed, counts aggregate at the end, "
        "nothing reaches the driver.  The oracle unrolls the three "
        "rounds as chained CTEs — set semantics, no floats, so the "
        "layer cardinalities cannot drift. "
        "operators/graph.py:bfs_layers.",
    tags=("graph", "iterative"),
)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir)
    nodes = (und.select(F.col("u").alias("node"))
             .unionByName(und.select(F.col("v").alias("node")))
             .distinct())
    seeds = nodes.where(F.col("node") % 200 == 0)
    return G.bfs_layers(und, seeds, max_depth=3)


_KCORE_K = 80
_KCORE_ROUNDS = 8


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    """Unrolled mirror of operators/graph.py:kcore_peel — round r keeps
    the nodes whose degree within round r-1's surviving subgraph is at
    least k; after the fixpoint every further unrolled round is
    provably identical, matching the operator's pad rows."""
    sql = _COPURCHASE_CTE + """, undm AS MATERIALIZED (
  SELECT u, v FROM und
), n0 AS MATERIALIZED (
  SELECT node AS n FROM deg
)"""
    for r in range(1, rounds + 1):
        sql += f""", d{r} AS MATERIALIZED (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM undm
    WHERE u IN (SELECT n FROM n{r - 1}) AND v IN (SELECT n FROM n{r - 1})
    UNION ALL
    SELECT v FROM undm
    WHERE u IN (SELECT n FROM n{r - 1}) AND v IN (SELECT n FROM n{r - 1})
  ) GROUP BY node
), n{r} AS MATERIALIZED (
  SELECT node AS n FROM d{r} WHERE d >= {k}
)"""
    rows = ["SELECT CAST(0 AS INT) AS round, CAST(0 AS BIGINT) AS "
            "n_removed, (SELECT CAST(COUNT(*) AS BIGINT) FROM n0) "
            "AS n_remaining"]
    for r in range(1, rounds + 1):
        rows.append(
            f"SELECT CAST({r} AS INT), "
            f"(SELECT COUNT(*) FROM n{r - 1}) - "
            f"(SELECT COUNT(*) FROM n{r}), "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM n{r})")
    return sql + "\n" + "\nUNION ALL\n".join(rows) + "\nORDER BY round"


@register(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    doc="k-core decomposition (Seidman) of the part co-purchase graph "
        "at k=80 by iterative peeling, reported as the full per-round "
        "convergence LEDGER (round, removed, remaining) — the "
        "cohesive-subgraph extraction behind community cores, spam "
        "filtering, and graph-sampling curricula; the cascade itself "
        "is the insight (removing one layer lowers neighbors' degrees "
        "and triggers the next).  Each round: two edge-list semi-joins "
        "against the surviving node set + one keyed count — work ∝ "
        "surviving edges; 8-round cap with a LOUD non-convergence "
        "raise, fixpoint rounds padded without recomputation (provably "
        "identical).  Converges in 6 rounds at both fixture scales "
        "(cores 1,857 / 18,863 of 2,000 / 20,000). "
        "operators/graph.py:kcore_peel.",
    tags=("graph", "iterative"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.kcore_peel(_copurchase_edges(spark, sf_dir),
                        k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _lpa_cte(rounds: int) -> str:
    """WITH-prefix ending at CTE l{rounds} = the converged-so-far label
    assignment; shared by the LPA communities entry and the modularity
    scorer so the two stay on the identical label state."""
    sql = _COPURCHASE_CTE + """, sym AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), l0 AS (
  SELECT node, node AS label FROM (SELECT DISTINCT a AS node FROM sym)
)"""
    for r in range(1, rounds + 1):
        sql += f""", l{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label) AS rn
    FROM (
      SELECT s.a AS node, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM sym s JOIN l{r - 1} l ON l.node = s.b
      GROUP BY s.a, l.label))
  WHERE rn = 1
)"""
    return sql


def _lpa_oracle(rounds: int = 3) -> str:
    return _lpa_cte(rounds) + f"""
SELECT CAST(label AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM l{rounds}
GROUP BY label
ORDER BY n_members DESC, community
LIMIT 20
"""


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(2),
    doc="Community detection on the part co-purchase graph by "
        "SYNCHRONOUS label propagation (Raghavan 2007), 2 fixed "
        "rounds, reported as the top-20 communities by size (2 rounds "
        "resolve 42 communities at sf0.01; by round 3 the dense "
        "co-purchase graph collapses to 3 — the diagnostic value is in "
        "the pre-collapse structure).  Fully "
        "deterministic where textbook LPA is not: synchronous "
        "snapshot updates, argmax by (count DESC, label ASC) via one "
        "max(struct(cnt, -label)) fold — no randomized tie-break, no "
        "async sweep order — which is exactly what makes a SQL oracle "
        "possible (3 chained CTE rounds of the same argmax).  Per "
        "round one edge-join + two keyed aggs, O(edges) work, "
        "O(nodes) checkpointed state. "
        "operators/graph.py:label_propagation.",
    tags=("graph", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = G.label_propagation(_copurchase_edges(spark, sf_dir), rounds=2)
    return (labels.groupBy(F.col("label").cast("bigint").alias("community"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
            .orderBy(F.col("n_members").desc(), "community")
            .limit(20))


def _modularity_oracle(rounds: int = 2) -> str:
    return _lpa_cte(rounds) + f""", m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und
), internal AS (
  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS ie
  FROM und e
  JOIN l{rounds} la ON la.node = e.u
  JOIN l{rounds} lb ON lb.node = e.v
  WHERE la.label = lb.label
  GROUP BY la.label
), degtot AS (
  SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS dt,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM deg d JOIN l{rounds} l ON l.node = d.node
  GROUP BY l.label
)
SELECT CAST(dg.label AS BIGINT) AS community,
       dg.n_members,
       CAST(COALESCE(i.ie, 0) AS BIGINT) AS internal_edges,
       dg.dt AS degree_total,
       CAST(COALESCE(i.ie, 0) AS DOUBLE) / m.m
         - (CAST(dg.dt AS DOUBLE) / (2 * m.m))
           * (CAST(dg.dt AS DOUBLE) / (2 * m.m)) AS modularity_term
FROM degtot dg LEFT JOIN internal i ON i.label = dg.label, m
ORDER BY dg.n_members DESC, community
LIMIT 20
"""


@register(
    "graph_modularity",
    oracle=_modularity_oracle(2),
    doc="Newman modularity accounting of the label-propagation "
        "communities (same 2-round deterministic LPA state as "
        "graph_label_propagation — the oracles share one CTE builder "
        "so the two entries can never drift apart): per community, "
        "member count, internal edge count, total degree, and the "
        "modularity term e_c/m - (d_c/2m)², top-20 by size.  The "
        "quality gate for ANY community assignment — LPA without a "
        "modularity readout is a partition you can't compare to the "
        "next round's.  All inputs are exact integers; each term is "
        "one float expression over three integers (never a float "
        "SUM across communities), so the report is bit-exact.  "
        "Scale: two label joins over the edge list + one degree "
        "join, all O(edges). operators/graph.py:label_propagation.",
    tags=("graph", "iterative"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    labels = G.label_propagation(und, rounds=2)
    m = und.count()
    la = labels.select(F.col("node").alias("u"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("v"), F.col("label").alias("lb"))
    internal = (und.join(la, "u").join(lb, "v")
                .where(F.col("la") == F.col("lb"))
                .groupBy(F.col("la").alias("label"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("ie")))
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).cast("bigint")
                                .alias("deg")))
    degtot = (deg.join(labels, "node")
              .groupBy("label")
              .agg(F.sum("deg").cast("bigint").alias("dt"),
                   F.count(F.lit(1)).cast("bigint").alias("n_members")))
    ie = F.coalesce(F.col("ie"), F.lit(0)).cast("bigint")
    term = (ie.cast("double") / F.lit(float(m))
            - (F.col("dt").cast("double") / F.lit(float(2 * m)))
            * (F.col("dt").cast("double") / F.lit(float(2 * m))))
    return (degtot.join(internal, "label", "left")
            .select(F.col("label").cast("bigint").alias("community"),
                    "n_members",
                    ie.alias("internal_edges"),
                    F.col("dt").alias("degree_total"),
                    term.alias("modularity_term"))
            .orderBy(F.col("n_members").desc(), "community")
            .limit(20))


def _bfs_dist_cte(max_depth: int = 4, n_seeds: int = 10) -> str:
    """WITH-prefix ending at CTE alldist(seed, node, depth) — min-hop
    distances from the n_seeds lowest-id nodes, in the redundant
    min-depth formulation: round r generates ALL (seed, node, r) pairs
    reachable by expanding round r-1's full set; distance = MIN(depth).
    Redundant tuples are harmless under MIN and keep the CTE chain
    trivially correct.  Shared by the closeness and harmonic entries."""
    sql = _COPURCHASE_CTE + f""", sym AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), seeds AS (
  SELECT node AS seed FROM deg ORDER BY node LIMIT {n_seeds}
), n0 AS (
  SELECT seed, seed AS node, 0 AS depth FROM seeds
)"""
    for r in range(1, max_depth + 1):
        sql += f""", n{r} AS (
  SELECT DISTINCT u.seed, s.b AS node
  FROM n{r - 1} u JOIN sym s ON s.a = u.node
)"""
    unions = "\nUNION ALL\n".join(
        f"SELECT seed, node, {r} AS depth FROM n{r}"
        for r in range(1, max_depth + 1))
    return sql + f""", alldist AS (
  SELECT seed, node, MIN(depth) AS depth FROM (
    SELECT seed, node, depth FROM n0
    UNION ALL
{unions}) GROUP BY seed, node
)
"""


def _closeness_oracle(max_depth: int = 4, n_seeds: int = 10) -> str:
    return _bfs_dist_cte(max_depth, n_seeds) + """
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(depth) AS BIGINT) AS dist_total,
       CAST(COUNT(*) - 1 AS DOUBLE) / SUM(depth) AS closeness
FROM alldist
GROUP BY seed
ORDER BY seed
"""


@register(
    "graph_closeness_centrality",
    oracle=_closeness_oracle(4, 10),
    doc="Closeness centrality of the 10 lowest-id parts in the "
        "co-purchase graph, bounded to 4 hops: per seed, nodes "
        "reached, exact hop-distance total, and closeness = "
        "(n_reached) / Σdist — the landmark form every distributed "
        "graph system uses at scale (exact all-pairs closeness is "
        "O(nm); landmark seeds make it O(k·m) with the same ranking "
        "power).  Spark runs a (seed, node)-keyed multi-source BFS — "
        "k seeds in ONE traversal with striped frontier state, per "
        "round one frontier-edges equi-join + one anti-join, work "
        "∝ frontier-adjacent edges; the oracle uses the redundant "
        "min-depth CTE form, provably identical under MIN.  Exact "
        "integers; closeness is one ratio of two. "
        "operators/graph.py:multi_seed_bfs_distances.",
    tags=("graph", "iterative"),
)
def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    deg_nodes = (und.select(F.col("u").alias("node"))
                 .unionAll(und.select(F.col("v").alias("node")))
                 .distinct())
    seeds = (deg_nodes.orderBy("node").limit(10)
             .select(F.col("node").alias("seed")))
    dist = G.multi_seed_bfs_distances(und, seeds, max_depth=4)
    return (dist.groupBy("seed")
            .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
                 F.sum("depth").cast("bigint").alias("dist_total"))
            .select(F.col("seed").cast("bigint").alias("seed"),
                    "n_reached", "dist_total",
                    (F.col("n_reached").cast("double")
                     / F.col("dist_total")).alias("closeness"))
            .orderBy("seed"))


@register(
    "graph_degree_assortativity",
    oracle=_COPURCHASE_CTE + """, sym AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), dd AS (
  SELECT da.deg AS x, db.deg AS y
  FROM sym JOIN deg da ON da.node = sym.a
           JOIN deg db ON db.node = sym.b
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM dd
)
SELECT m AS n_directed_edges, sx AS deg_sum, sxy AS deg_prod_sum,
       (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           AS assortativity
FROM sums
""",
    doc="Degree assortativity of the co-purchase graph (Newman 2002): "
        "Pearson correlation of endpoint degrees over the symmetrized "
        "edge list — one number separating hub-attracts-hub networks "
        "(r > 0, social) from hub-spoke ones (r < 0, technological/"
        "catalog), deciding whether degree-based sampling or salting "
        "is needed downstream.  Five integer sums in one partial-"
        "aggregable pass (largest ~ sum(deg²·...) well below 2^53 at "
        "fixture scale and bounded by m·max_deg² generally); r is one "
        "float expression over six exact integers — bit-identical "
        "across engines.  Scale: two broadcast-sized degree joins + "
        "one global agg, O(edges). plans/graph_queries.py.",
    tags=("graph",),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    sym = (und.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionByName(und.select(F.col("v").alias("a"),
                                   F.col("u").alias("b"))))
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("bigint").alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("x"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("y"))
    dd = sym.join(da, "a").join(db, "b")
    sums = dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"))
    md = F.col("m").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = ((md * F.col("sxy") - sxd * F.col("sy"))
         / (F.sqrt(md * F.col("sxx") - sxd * F.col("sx"))
            * F.sqrt(md * F.col("syy") - syd * F.col("sy"))))
    return sums.select(F.col("m").alias("n_directed_edges"),
                       F.col("sx").alias("deg_sum"),
                       F.col("sxy").alias("deg_prod_sum"),
                       r.alias("assortativity"))


@register(
    "graph_harmonic_centrality",
    oracle=_bfs_dist_cte(4, 10) + """
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(SUM(CASE WHEN depth = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       CAST(SUM(CASE WHEN depth = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       CAST(SUM(CASE WHEN depth = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
       CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         + CAST(SUM(CASE WHEN depth = 2 THEN 1 ELSE 0 END) AS DOUBLE) / 2
         + CAST(SUM(CASE WHEN depth = 3 THEN 1 ELSE 0 END) AS DOUBLE) / 3
         + CAST(SUM(CASE WHEN depth = 4 THEN 1 ELSE 0 END) AS DOUBLE) / 4
           AS harmonic
FROM alldist
GROUP BY seed
ORDER BY seed
""",
    doc="Harmonic centrality of the same 10 landmark seeds (Σ 1/d over "
        "reached nodes, 4-hop bound) — the disconnected-graph-safe "
        "twin of closeness (unreached nodes contribute 0 instead of "
        "poisoning the mean; Boldi & Vigna's axiomatically preferred "
        "form).  Shares the (seed,node)-keyed multi-source BFS with "
        "the closeness entry — one traversal, two centralities — and "
        "its oracle shares the alldist CTE builder so the entries "
        "cannot drift.  The harmonic sum is a FIXED 4-term expression "
        "over per-depth integer counts (n1 + n2/2 + n3/3 + n4/4), "
        "never a float fold over nodes — bit-exact by construction. "
        "operators/graph.py:multi_seed_bfs_distances.",
    tags=("graph", "iterative"),
)
def graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    deg_nodes = (und.select(F.col("u").alias("node"))
                 .unionAll(und.select(F.col("v").alias("node")))
                 .distinct())
    seeds = (deg_nodes.orderBy("node").limit(10)
             .select(F.col("node").alias("seed")))
    dist = G.multi_seed_bfs_distances(und, seeds, max_depth=4)
    nd = [F.sum(F.when(F.col("depth") == d, 1).otherwise(0))
          .cast("bigint").alias(f"n{d}") for d in (1, 2, 3, 4)]
    agg = dist.groupBy("seed").agg(*nd)
    harmonic = (F.col("n1").cast("double")
                + F.col("n2").cast("double") / F.lit(2)
                + F.col("n3").cast("double") / F.lit(3)
                + F.col("n4").cast("double") / F.lit(4))
    return (agg.select(F.col("seed").cast("bigint").alias("seed"),
                       "n1", "n2", "n3", "n4",
                       harmonic.alias("harmonic"))
            .orderBy("seed"))


@register(
    "graph_rich_club",
    oracle=_COPURCHASE_CTE + """
, bands AS (SELECT unnest([40, 80, 120, 160]) AS k),
rich AS (
  SELECT b.k, d.node
  FROM bands b JOIN deg d ON d.deg > b.k
), rc_nodes AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k FROM rich GROUP BY k
), rc_edges AS (
  SELECT b.k, CAST(COUNT(*) AS BIGINT) AS e_k
  FROM bands b
  JOIN und e ON TRUE
  JOIN deg du ON du.node = e.u AND du.deg > b.k
  JOIN deg dv ON dv.node = e.v AND dv.deg > b.k
  GROUP BY b.k
)
SELECT n.k AS k, n.n_k, COALESCE(e.e_k, 0) AS e_k,
       CASE WHEN n.n_k >= 2
            THEN 2.0 * COALESCE(e.e_k, 0) / (n.n_k * (n.n_k - 1))
            ELSE 0.0 END AS phi
FROM rc_nodes n LEFT JOIN rc_edges e ON e.k = n.k
ORDER BY k
""",
    doc="Rich-club coefficient of the co-purchase graph (Colizza et "
        "al. 2006): for degree thresholds k in {40, 80, 120, 160}, "
        "phi(k) = 2·E_k / (N_k·(N_k−1)) — how densely the hubs "
        "interconnect relative to a complete graph, the structural "
        "question behind 'do the head entities form a core the "
        "sampler must treat specially?'.  Pairs with assortativity: "
        "r gives the correlation, phi(k) the actual core density "
        "profile.  Exact integer node/edge counts per band (edge "
        "membership = two degree-join filters); phi one float "
        "expression over two ints.  Scale: the degree table is "
        "broadcast-sized; per band one filtered edge count, O(edges). "
        "plans/graph_queries.py:graph_rich_club.",
    tags=("graph",),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("bigint").alias("deg"))
           .transform(materialize))
    bands = spark.createDataFrame([(k,) for k in (40, 80, 120, 160)],
                                  "k int")
    rc_nodes = (bands.join(deg, deg["deg"] > bands["k"])
                .groupBy("k").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("n_k")))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    rc_edges = (F.broadcast(bands)
                .join(ed, (ed["du"] > bands["k"]) & (ed["dv"] > bands["k"]))
                .groupBy("k").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("e_k")))
    phi = (F.when(F.col("n_k") >= 2,
                  F.lit(2.0) * F.coalesce(F.col("e_k"), F.lit(0))
                  / (F.col("n_k") * (F.col("n_k") - 1)))
           .otherwise(F.lit(0.0)))
    return (rc_nodes.join(rc_edges, "k", "left")
            .select("k", "n_k",
                    F.coalesce(F.col("e_k"), F.lit(0)).cast("bigint")
                     .alias("e_k"),
                    phi.alias("phi"))
            .orderBy("k"))


@register(
    "graph_common_neighbors_jaccard",
    oracle=f"""
{_COPURCHASE_CTE}, und2 AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), centers AS (
  SELECT node FROM deg WHERE deg BETWEEN 2 AND 256
), wedges AS (
  SELECT a.v AS seed_id, b.v AS cand_id,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM und2 a
  JOIN und2 b ON a.u = b.u AND a.v != b.v
  JOIN centers c ON c.node = a.u
  WHERE a.v % 200 = 0
  GROUP BY 1, 2
), scored AS (
  SELECT w.seed_id, w.cand_id, w.n_common,
         ds.deg + dc.deg - w.n_common AS union_sz
  FROM wedges w
  JOIN deg ds ON ds.node = w.seed_id
  JOIN deg dc ON dc.node = w.cand_id
  WHERE NOT EXISTS (SELECT 1 FROM und e
                    WHERE e.u = LEAST(w.seed_id, w.cand_id)
                      AND e.v = GREATEST(w.seed_id, w.cand_id))
), ranked AS (
  SELECT seed_id, cand_id, n_common,
         ROUND(n_common * 1.0 / union_sz, 6) AS jaccard,
         ROW_NUMBER() OVER (
           ORDER BY (1000000000 * n_common) // union_sz DESC,
                    seed_id, cand_id) AS r
  FROM scored
)
SELECT seed_id, cand_id, n_common, jaccard, CAST(r AS INT) AS rank
FROM ranked WHERE r <= 20 ORDER BY rank
""",
    doc="Common-neighbor JACCARD link prediction for the same seed set "
        "as graph_adamic_adar (every 200th part on the co-purchase "
        "graph): J(s,c) = |N(s) ∩ N(c)| / |N(s) ∪ N(c)| with existing "
        "edges excluded, top-20 — the normalized companion of AA "
        "(degree-corrected, so hubs stop dominating).  Same map-side "
        "wedge expansion from center adjacency arrays (hub centers "
        "deg > 256 pruned as semantics, mirrored in the oracle); the "
        "union size comes from two degree joins and the COUNT itself — "
        "all integers, so the rank key is the exact integer quotient "
        "(1e9·common) div union, never a float compare.  Scale: wedge "
        "work is the seed-restricted fan-out, identical to AA; the "
        "top-20 window runs over the aggregated pair table. "
        "plans/graph_queries.py:graph_cn_jaccard.",
    tags=("graph",),
)
def graph_cn_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    und2 = (und.select("u", "v")
            .unionAll(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v"))))
    adj = (und2.groupBy(F.col("u").alias("z"))
           .agg(F.array_sort(F.collect_list("v")).alias("nbrs")))
    deg = adj.select(F.col("z").alias("node"),
                     F.size("nbrs").cast("bigint").alias("deg"))
    centers = adj.where((F.size("nbrs") >= 2) & (F.size("nbrs") <= 256))
    seeds_in = F.filter(F.col("nbrs"), lambda x: x % 200 == 0)
    pairs = F.flatten(F.transform(
        seeds_in,
        lambda s: F.transform(
            F.filter(F.col("nbrs"), lambda b: b != s),
            lambda b: F.struct(s.alias("seed_id"), b.alias("cand_id")))))
    wedges = (centers.select(F.explode(pairs).alias("p"))
              .select("p.seed_id", "p.cand_id"))
    agg = (wedges.groupBy("seed_id", "cand_id")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))
    ds = deg.select(F.col("node").alias("seed_id"),
                    F.col("deg").alias("__ds"))
    dc = deg.select(F.col("node").alias("cand_id"),
                    F.col("deg").alias("__dc"))
    scored = (agg.join(ds, "seed_id").join(dc, "cand_id")
              .withColumn("__union",
                          F.col("__ds") + F.col("__dc") - F.col("n_common")))
    lo = F.least(scored["seed_id"], scored["cand_id"])
    hi = F.greatest(scored["seed_id"], scored["cand_id"])
    new_only = scored.join(und, (und["u"] == lo) & (und["v"] == hi),
                           "left_anti")
    # Same top-20 shape as graph_adamic_adar: distributed
    # TakeOrderedAndProject first, rank window over the 20-row limit.
    new_only = new_only.withColumn(
        "__key", F.expr("(1000000000 * n_common) div __union"))
    order = [F.col("__key").desc(), F.col("seed_id"), F.col("cand_id")]
    top = new_only.orderBy(*order).limit(20)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))
            .select("seed_id", "cand_id", "n_common",
                    F.round(F.col("n_common").cast("double")
                            / F.col("__union"), 6).alias("jaccard"),
                    F.col("rank").cast("int").alias("rank"))
            .orderBy("rank"))


@register(
    "graph_local_clustering_coefficient",
    oracle=f"""
{_COPURCHASE_CTE}, und2 AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), seeds AS (
  SELECT node, deg FROM deg
  WHERE node % 100 = 0 AND deg BETWEEN 2 AND 256
), nbr_pairs AS (
  SELECT a.u AS node, a.v AS x, b.v AS y
  FROM und2 a JOIN und2 b ON a.u = b.u AND a.v < b.v
  JOIN seeds s ON s.node = a.u
), tri AS (
  SELECT p.node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM nbr_pairs p
  JOIN und e ON e.u = p.x AND e.v = p.y
  GROUP BY p.node
)
SELECT s.node, s.deg,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       ROUND(2.0 * COALESCE(t.n_tri, 0) / (s.deg * (s.deg - 1)), 6)
           AS clustering
FROM seeds s LEFT JOIN tri t ON t.node = s.node
ORDER BY s.node
""",
    doc="Local clustering coefficient for a seed set (every 100th part "
        "on the co-purchase graph, hub nodes deg > 256 pruned as "
        "semantics): cc(v) = closed-wedge fraction = edges among N(v) "
        "over C(deg,2) — the per-node community-tightness readout "
        "beside the corpus-wide triangle count.  Neighbor pairs expand "
        "MAP-SIDE from each seed's adjacency array (x < y canonical), "
        "then ONE equi-join against the undirected edge list closes "
        "the wedges — work is sum of C(deg,2) over the bounded-degree "
        "seed set, never all-pairs; the undirected edge list is "
        "materialized once and probed hash-partitioned.  Counts exact; "
        "cc one integer ratio. plans/graph_queries.py:graph_local_cc.",
    tags=("graph",),
)
def graph_local_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _copurchase_edges(spark, sf_dir).transform(materialize)
    und2 = (und.select("u", "v")
            .unionAll(und.select(F.col("v").alias("u"),
                                 F.col("u").alias("v"))))
    adj = (und2.groupBy(F.col("u").alias("node"))
           .agg(F.array_sort(F.collect_list("v")).alias("nbrs")))
    seeds = (adj.where((F.col("node") % 100 == 0)
                       & (F.size("nbrs") >= 2) & (F.size("nbrs") <= 256))
             .select("node", "nbrs",
                     F.size("nbrs").cast("bigint").alias("deg")))
    # canonical x < y pairs, map-side from the sorted adjacency array
    pairs = F.flatten(F.transform(
        F.col("nbrs"),
        lambda x: F.transform(
            F.filter(F.col("nbrs"), lambda y: y > x),
            lambda y: F.struct(x.alias("x"), y.alias("y")))))
    wedges = (seeds.select("node", F.explode(pairs).alias("p"))
              .select("node", "p.x", "p.y"))
    tri = (wedges.join(und, (und["u"] == wedges["x"])
                       & (und["v"] == wedges["y"]))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri")))
    return (seeds.join(tri, "node", "left")
            .select("node", "deg",
                    F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint")
                     .alias("n_tri"),
                    F.round(F.lit(2.0)
                            * F.coalesce(F.col("n_tri"), F.lit(0))
                            / (F.col("deg") * (F.col("deg") - 1)), 6)
                     .alias("clustering"))
            .orderBy("node"))


def _hits_oracle(iterations: int = 4, rd: int = 10) -> str:
    """Unrolled HITS rounds as chained CTEs — every sum/normalize
    rounded to the same digits as the Spark driver loop.  The ra/rh
    CTEs are referenced twice (projection + total subquery) and DuckDB
    inlines CTEs by default, so they are AS MATERIALIZED (the pinned
    re-execution hazard)."""
    parts = ["""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM lineitem
), h0 AS (
  SELECT DISTINCT src AS node, 1.0 AS h FROM edges
)"""]
    prev_h = "h0"
    for i in range(1, iterations + 1):
        parts.append(f""",
ra{i} AS MATERIALIZED (
  SELECT dst, ROUND(SUM(h), {rd}) AS ra
  FROM edges JOIN {prev_h} ON edges.src = {prev_h}.node
  GROUP BY dst
), a{i} AS (
  SELECT dst AS node,
         ROUND(ra / (SELECT SUM(ra) FROM ra{i}), {rd}) AS a
  FROM ra{i}
), rh{i} AS MATERIALIZED (
  SELECT src, ROUND(SUM(a), {rd}) AS rh
  FROM edges JOIN a{i} ON edges.dst = a{i}.node
  GROUP BY src
), h{i} AS (
  SELECT src AS node,
         ROUND(rh / (SELECT SUM(rh) FROM rh{i}), {rd}) AS h
  FROM rh{i}
)""")
        prev_h = f"h{i}"
    parts.append(f""",
top_a AS (
  SELECT 'authority' AS role, node, ROUND(a, 8) AS score,
         CAST(ROW_NUMBER() OVER (ORDER BY ROUND(a, 8) DESC, node)
              AS INT) AS pos
  FROM a{iterations} QUALIFY pos <= 10
), top_h AS (
  SELECT 'hub' AS role, node, ROUND(h, 8) AS score,
         CAST(ROW_NUMBER() OVER (ORDER BY ROUND(h, 8) DESC, node)
              AS INT) AS pos
  FROM h{iterations} QUALIFY pos <= 10
)
SELECT role, node, score, pos FROM top_a
UNION ALL
SELECT role, node, score, pos FROM top_h
ORDER BY role, pos""")
    return "".join(parts)


@register(
    "graph_hits_hubs_authorities",
    oracle=_hits_oracle(),
    doc="Kleinberg HITS (JACM 1999) over the DIRECTED supplier→part "
        "bipartite graph from lineitem: suppliers are hubs (good "
        "suppliers stock authoritative parts), parts are authorities "
        "(good parts are stocked by hub suppliers) — the "
        "mutually-recursive centrality pair PageRank's single score "
        "cannot express, and the classic second algorithm of the "
        "link-analysis family.  4 alternating rounds of keyed join + "
        "partial-agg sum (work ∝ edges, state ∝ nodes), sum-normalized "
        "and rounded to 10 decimals every half-round on BOTH engines "
        "(the pagerank float re-sync recipe); the oracle unrolls the "
        "same rounds as chained CTEs with the doubly-referenced sums "
        "AS MATERIALIZED (the pinned DuckDB CTE-inlining hazard).  "
        "Top-10 authorities + top-10 hubs via distributed TakeOrdered "
        "+ 10-row rank windows. operators/graph.py:hits.",
    tags=("graph",),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits
    from ..operators.ranking import topk_with_rank
    li = table(spark, sf_dir, "lineitem")
    edges = (li.select((F.col("l_suppkey") * 2).alias("src"),
                       (F.col("l_partkey") * 2 + 1).alias("dst"))
             .distinct())
    hubs, auths = hits(edges, iterations=4, round_digits=10)
    top_a = topk_with_rank(
        auths.select("node", F.round(F.col("a"), 8).alias("score")),
        [F.col("score").desc(), F.col("node")], 10, "pos")
    top_h = topk_with_rank(
        hubs.select("node", F.round(F.col("h"), 8).alias("score")),
        [F.col("score").desc(), F.col("node")], 10, "pos")
    return (top_a.select(F.lit("authority").alias("role"), "node",
                         "score", "pos")
            .unionAll(top_h.select(F.lit("hub").alias("role"), "node",
                                   "score", "pos"))
            .orderBy("role", "pos"))


def _katz_oracle(iterations: int = 4, rd: int = 10) -> str:
    parts = [_COPURCHASE_CTE + """, edges AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM und
  UNION ALL
  SELECT v AS src, u AS dst FROM und
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), x0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) AS x FROM nodes
)"""]
    prev = "x0"
    for i in range(1, iterations + 1):
        parts.append(f""",
s{i} AS MATERIALIZED (
  SELECT dst, ROUND(SUM(x), {rd}) AS s
  FROM edges JOIN {prev} ON edges.src = {prev}.node
  GROUP BY dst
), x{i} AS (
  SELECT node,
         ROUND(CAST(1.0 AS DOUBLE)
               + CAST(0.05 AS DOUBLE)
                 * COALESCE(s, CAST(0.0 AS DOUBLE)), {rd}) AS x
  FROM nodes LEFT JOIN s{i} ON s{i}.dst = nodes.node
)""")
        prev = f"x{i}"
    parts.append(f"""
SELECT node, ROUND(x, 8) AS katz,
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(x, 8) DESC, node)
            AS INT) AS pos
FROM {prev} QUALIFY pos <= 20
ORDER BY pos""")
    return "".join(parts)


@register(
    "graph_katz_centrality",
    oracle=_katz_oracle(),
    doc="Katz centrality (Psychometrika 1953) over the symmetrized "
        "part co-purchase graph: x = Σ_L α^L·(walks of length L into "
        "v), truncated at 4 rounds of x ← β + α·A·x with α=0.05, β=1 "
        "— the attenuated-path-count member of the centrality family "
        "(PageRank normalizes it by out-degree, HITS splits it into "
        "two mutually-recursive scores; this entry completes the "
        "trio).  Spark side is 4 keyed join + partial-agg rounds with "
        "a node LEFT join so zero-indegree nodes keep the bare β term "
        "(no out-degree division — Katz needs no dangling handling); "
        "per-round ROUND to 10 digits on BOTH engines (the pagerank "
        "float re-sync recipe), oracle unrolls the same rounds as "
        "chained CTEs with the doubly-referenced sums AS MATERIALIZED "
        "(the pinned DuckDB CTE-inlining hazard).  Top-20 via "
        "distributed TakeOrdered + 20-row rank window, both engines "
        "ranking on the identical ROUND(x, 8) key. "
        "operators/graph.py:katz_centrality.",
    tags=("graph",),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import katz_centrality
    from ..operators.ranking import topk_with_rank
    und = _copurchase_edges(spark, sf_dir)
    edges = (und.select("u", "v")
             .unionAll(und.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
             .select(F.col("u").alias("src"), F.col("v").alias("dst")))
    x = katz_centrality(edges, iterations=4, alpha=0.05, beta=1.0,
                        round_digits=10)
    return topk_with_rank(
        x.select("node", F.round(F.col("x"), 8).alias("katz")),
        [F.col("katz").desc(), F.col("node")], 20, "pos")
