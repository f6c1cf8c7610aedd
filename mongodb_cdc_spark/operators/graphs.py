"""Graph analytics over relational edges: triangle counting on the
co-order part graph. Companion to the connected-components labeler in
extensions.py (`ext_dedup_cluster`) — together they cover the two
canonical MapReduce graph kernels.

The reference has no graph layer (SURVEY.md §2A); this is warehouse
surface gained by the switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import register_views
from mongodb_cdc_spark.registry import query

# --------------------------------------------------------------------------
# graph_triangle_count
# --------------------------------------------------------------------------

# Minimum co-occurrence support for an edge: RELATIVE to order volume
# (floor 2 absolute) — parts must be co-ordered in >= max(2, orders/50k)
# orders. This is the frequent-itemset minsup prune every production
# co-occurrence graph applies, and it MUST be relative: an absolute
# threshold stops pruning as order volume grows over a fixed catalog
# (support inflates linearly with volume), densifying the graph toward
# |parts|^2 noise edges. Measured at sf0.1: 1.2M raw edges -> 3.9k
# supported edges, a 300x wedge-work reduction for the same signal.


def _edges_sql(div: str) -> str:
    # (order, part) is DISTINCT'd BEFORE the self-join: the raw join
    # explodes per-order lineitem pairs (quadratic in duplicate part
    # rows per order) and then needs a COUNT(DISTINCT) to de-inflate
    # support; deduping first shrinks the join input, turns support into
    # a plain COUNT(*), and produces the IDENTICAL edge set (an order
    # contributes at most one co-occurrence per part pair either way).
    # Measured 6.75 s -> 2.0 s on graph_pagerank at sf0.1.
    return f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS a, b.l_partkey AS b,
           COUNT(*) AS support
    FROM op a
    JOIN op b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= (
        SELECT GREATEST(CAST(2 AS BIGINT), COUNT(*) {div} 50000)
        FROM orders
    )
"""


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_edges_sql("//")})
    SELECT
      (SELECT COUNT(DISTINCT a) FROM (
          SELECT a FROM edges UNION ALL SELECT b FROM edges
      ) nodes(a)) AS n_nodes,
      (SELECT COUNT(*) FROM edges) AS n_edges,
      (SELECT COUNT(*)
       FROM edges e1
       JOIN edges e2 ON e2.a = e1.b
       JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the frequent-co-order part graph (parts are
    nodes; an edge joins two parts co-ordered in >= max(2, orders/50k)
    orders — the RELATIVE minsup threshold that keeps the graph sparse
    at every volume, see `_edges_sql`). Edges are ORIENTED low-id -> high-id before
    counting, so every triangle is enumerated exactly once as a < b < c:
    the wedge join (e1.b = e2.a) builds a-b-c paths and the closing join
    checks a-c — the standard two-join triangle enumeration, never an
    all-pairs product.

    Scale: edge construction explodes per-order pairs — bounded by order
    size squared (cap basket size upstream for pathological orders) —
    and support counts DISTINCT co-ordering orders (multiplicity inside
    one order does not inflate it) while the same (a, b)-keyed shuffle
    dedups and prunes: wedge work then scales with the square of SUPPORTED degree,
    not raw degree (300x lighter here; the gap widens as order volume
    grows over a fixed catalog). Both triangle joins are equi-joins on
    single keys; at extreme density the further win is orienting edges
    by DEGREE (low-degree endpoint first) so wedge lists stay short —
    id-ordering is the deterministic stand-in on this near-uniform
    degree distribution. Counts are exact BIGINTs."""
    register_views(spark, sf_dir)
    # materialize the pruned edge list ONCE: five downstream consumers
    # (e1/e2/e3, the edge count, the node set) would otherwise each
    # recompute the lineitem self-join + support aggregate — the
    # dominant cost (measured ~5x the post-prune work at sf0.1)
    edges = (
        spark.sql(_edges_sql("div")).select("a", "b").localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("a")).union(edges.select(F.col("b"))).distinct()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b"))
    tri = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .crossJoin(nodes.agg(F.count("*").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


# --------------------------------------------------------------------------
# graph_pagerank — bounded-iteration PageRank in exact integer arithmetic
# --------------------------------------------------------------------------
# Same minsup-pruned co-order part graph as graph_triangle_count, made
# directed by emitting both orientations. Ranks live in MICRO-units
# (1.0 == 1_000_000) and every step is integer: contribution =
# rank div degree (floor), new rank = 150_000 + (850 * sum_in) div 1000
# (damping 0.85). Integer sums are order-independent, so the result is
# bit-identical across engines and across partitionings — the same
# determinism discipline as the fixed-point money aggregates, applied to
# an iterative algorithm. Three iterations are unrolled; production runs
# the identical step under a convergence loop with localCheckpoint every
# few steps (the ext_dedup_cluster lineage-truncation pattern).

_PR_TOPK = 20


def _pr_sql() -> str:
    edges = _edges_sql("//")
    return f"""
    WITH edges AS ({edges}),
    und AS (
      SELECT a AS src, b AS dst FROM edges
      UNION ALL
      SELECT b AS src, a AS dst FROM edges
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM und GROUP BY src),
    r1 AS (
      SELECT u.dst AS node,
             150000 + (850 * SUM(1000000 // g.d)) // 1000 AS rank
      FROM und u JOIN deg g ON g.src = u.src
      GROUP BY u.dst
    ),
    r2 AS (
      SELECT u.dst AS node,
             150000 + (850 * SUM(r.rank // g.d)) // 1000 AS rank
      FROM und u JOIN deg g ON g.src = u.src JOIN r1 r ON r.node = u.src
      GROUP BY u.dst
    ),
    r3 AS (
      SELECT u.dst AS node,
             150000 + (850 * SUM(r.rank // g.d)) // 1000 AS rank
      FROM und u JOIN deg g ON g.src = u.src JOIN r2 r ON r.node = u.src
      GROUP BY u.dst
    )
    SELECT node, CAST(rank AS BIGINT) AS rank_e6
    FROM r3 ORDER BY rank DESC, node ASC LIMIT {_PR_TOPK}
"""


@query("graph_pagerank", oracle=_pr_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank over the minsup-pruned co-order part graph
    (damping 0.85, 3 unrolled iterations, uniform 1.0 start), computed
    ENTIRELY in integer micro-units: floor-divide by degree for the
    contribution, integer damping, BIGINT sums. No floating point means
    no cross-engine or cross-partitioning drift — the iterative twin of
    the fixed-point aggregate discipline.

    Scale per iteration: one join of the rank vector to the edge list on
    src (both keyed on node id — co-partitioned after the first shuffle,
    AQE reuses the exchange), one groupBy(dst) with map-side partial
    sums. Work is O(edges) per iteration on the PRUNED graph (the
    relative minsup keeps |edges| ~ supported co-occurrences, not
    |parts|^2). Every node has degree >= 1 by construction (it appears
    in an edge), so there are no dangling-mass corrections, and the
    undirected doubling means every node also receives mass each step.
    Selection is sort+limit -> TakeOrderedAndProject."""
    register_views(spark, sf_dir)
    # one materialization of the pruned graph: the three unrolled
    # iterations (plus deg) each consume `und`; without this every
    # iteration re-runs the whole edge build (the LSH-recompute lesson)
    edges = (
        spark.sql(_edges_sql("div")).select("a", "b").localCheckpoint(eager=True)
    )
    und = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranked = und.join(deg, "src").groupBy(F.col("dst").alias("node")).agg(
        F.expr("150000 + (850 * SUM(1000000 div d)) div 1000").alias("rank")
    )
    for _ in range(2):
        contrib = (
            und.join(deg, "src")
            .join(ranked.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.expr("150000 + (850 * SUM(rank div d)) div 1000").alias("rank"))
        )
        ranked = contrib
    return (
        ranked.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(_PR_TOPK)
        .select("node", F.col("rank").cast("bigint").alias("rank_e6"))
    )
