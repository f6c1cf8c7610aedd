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

from mongodb_cdc_spark.io import load_table, register_views
from mongodb_cdc_spark.registry import query
from mongodb_cdc_spark.operators._util import new_stage, publish_store

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


# --------------------------------------------------------------------------
# maintained co-order edge store — the 100 TB answer to the edge build
# --------------------------------------------------------------------------
# The edge builds above self-join the (order, part) fact against itself
# per query — the one operator SCALING.md flags as single-machine-bound
# near ~600 M lineitem rows. Production never re-derives the graph per
# query: it maintains the pair-support aggregate as a table (this store)
# and refreshes it INCREMENTALLY per ingest wave (`maintenance_edge_refresh`)
# — co-order pairs live entirely within one order, so a wave of new
# orders contributes exactly its own pairs and supports ADD. The fact ×
# fact self-join is thereby amortized to one wave-sized build per ingest,
# and every graph query reads a (a, b, support) aggregate whose size is
# the number of DISTINCT co-ordered pairs, not the fact.
#
# The store holds ALL pair supports (support >= 1, no minsup HAVING):
# the relative minsup threshold is applied at READ time, because a pair
# below today's threshold can cross it after any wave — pruning inside
# the store would make the maintenance lossy. Orientation is a < b.

_PAIR_SUPPORT_SQL = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS support
    FROM op a
    JOIN op b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
"""


def edge_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, stage-then-rename) and return the co-order pair
    support store for ``sf_dir``: one row per oriented part pair
    (a < b) with its exact co-ordering order count. Shared by the
    maintenance operator and every store-consuming graph query."""
    import os as _os

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    import json as _json

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    # _v2: adds the _corpus_meta.json sidecar (orders count at build
    # time) so read-time threshold derivation needs no orders scan.
    path = _os.path.join(scratch_root(), f"coorder_edges_{sf_name}_v2")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        register_views(spark, sf_dir)
        pairs = spark.sql(_PAIR_SUPPORT_SQL)
        n_orders = spark.sql("SELECT COUNT(*) AS n FROM orders").first()["n"]
        stage = new_stage(path)
        # repartition by the pagerank join key so store scans start
        # co-partitioned on `a` (file-level clustering; the read side
        # still shuffles once for the und/deg build, but off an
        # aggregate, not the fact)
        pairs.repartition(8, "a").write.mode("overwrite").parquet(stage)
        # underscore-prefixed sidecar: Spark's file listing skips it.
        # Holds the corpus stats the relative minsup needs at read time;
        # a production refresh wave updates it alongside the merge.
        with open(_os.path.join(stage, "_corpus_meta.json"), "w") as fh:
            _json.dump({"n_orders": int(n_orders)}, fh)
        publish_store(stage, path)
    return path


def _edge_store_threshold(path: str) -> int:
    """Relative minsup threshold from the store's corpus sidecar —
    max(2, n_orders/50k), the same formula as `_edges_sql`, derived
    without touching the orders table at read time."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_corpus_meta.json")) as fh:
        meta = _json.load(fh)
    return max(2, int(meta["n_orders"]) // 50000)


@query(
    "maintenance_edge_store",
    oracle=f"""
    WITH ps AS ({_PAIR_SUPPORT_SQL})
    SELECT (SELECT COUNT(*) FROM ps) AS n_pairs,
           CAST((SELECT COALESCE(SUM(support), 0) FROM ps) AS BIGINT)
             AS support_total,
           CAST(0 AS BIGINT) AS orientation_violations,
           CAST(0 AS BIGINT) AS dup_pairs
    """,
)
def maintenance_edge_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the co-order pair-support aggregate (one row per oriented
    part pair with exact support) and read it back — the maintenance
    step that amortizes the fact x fact edge build across every graph
    query. The oracle is EXACT on the full store: pair count and total
    support match an independent DuckDB build, orientation (a < b
    everywhere) and keyedness (no duplicate pairs) hold structurally.

    Scale: built once per ingest wave (see `maintenance_edge_refresh`
    for the incremental path), size = distinct co-ordered pairs — the
    sf0.1 store is ~1.2 M rows of 3 BIGINTs vs a 6 M-row fact, and at
    100 TB the read side of every graph query scans this aggregate
    instead of shuffling lineitem."""
    store = spark.read.parquet(edge_store_path(spark, sf_dir))
    return store.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("support").cast("bigint").alias("support_total"),
        F.sum(F.when(F.col("a") >= F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("orientation_violations"),
        (F.count(F.lit(1)) - F.countDistinct("a", "b"))
        .cast("bigint")
        .alias("dup_pairs"),
    )


@query("graph_pagerank_from_store", oracle=_pr_sql())
def graph_pagerank_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`graph_pagerank`'s production shape: identical top-20 integer
    PageRank (same oracle, hash-identical result), but the edge list
    comes from the persisted pair-support store with the relative
    minsup applied at read time — no lineitem self-join in the query
    path. The iteration loop mirrors graph_pagerank above line for
    line; only the edge source differs.

    Scale: the query-path cost drops from O(fact self-join) to
    O(store scan + 3 keyed joins on the pruned aggregate). The
    threshold comes from the store's corpus sidecar (no orders scan),
    and the pruned edge list is cached rather than checkpointed — the
    source is a cheap pushed-filter store scan, so re-derivation is
    affordable and the whole query is a single Spark job."""
    path = edge_store_path(spark, sf_dir)
    thr = _edge_store_threshold(path)
    edges = (
        spark.read.parquet(path)
        .where(F.col("support") >= F.lit(thr))
        .select("a", "b")
        .cache()
    )
    und = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranked = und.join(deg, "src").groupBy(F.col("dst").alias("node")).agg(
        F.expr("150000 + (850 * SUM(1000000 div d)) div 1000").alias("rank")
    )
    for _ in range(2):
        ranked = (
            und.join(deg, "src")
            .join(ranked.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.expr("150000 + (850 * SUM(rank div d)) div 1000").alias("rank"))
        )
    return (
        ranked.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(_PR_TOPK)
        .select("node", F.col("rank").cast("bigint").alias("rank_e6"))
    )


@query(
    "maintenance_edge_refresh",
    oracle=f"""
    WITH ps AS ({_PAIR_SUPPORT_SQL})
    SELECT (SELECT COUNT(*) FROM ps) AS n_pairs,
           CAST((SELECT COALESCE(SUM(support), 0) FROM ps) AS BIGINT)
             AS support_total,
           CAST(0 AS BIGINT) AS merge_mismatches
    """,
)
def maintenance_edge_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental edge-store refresh, verified against the full build:
    split orders into a base corpus and an ingest wave (the
    deterministic test stand-in is l_orderkey % 10 == 0 ~ 10% of
    orders; production keys the wave on the ingest watermark), build
    pair supports for each side INDEPENDENTLY, and merge by summed
    support. Because a co-order pair lives entirely within one order,
    wave supports ADD exactly — the merged store must equal the
    from-scratch build row for row, and the returned
    ``merge_mismatches`` (full-outer-join rows where supports differ or
    a pair is missing on either side) proves it at 0.

    Scale: this is the operator that retires the flagged fact x fact
    self-join at 100 TB — the steady-state cost is one self-join over
    the WAVE's lineitems (bounded by wave size x basket^2) plus one
    keyed merge shuffle of store + delta on (a, b). The base build here
    exists only to verify the algebra; production reads the persisted
    store as the base."""
    # Round 12 (guide §2.4 "two operations keyed the same way share one
    # exchange", §1.2): the two SQL arms each re-scanned lineitem and
    # re-shuffled their own DISTINCT (l_orderkey, l_partkey) — but the
    # distinct is side-independent (the %10 wave split partitions whole
    # orders), so ONE distinct pass is materialized and both arms filter
    # it. The arms stay independent self-join + aggregate chains built
    # from their own order slices — identical pair multisets, identical
    # merge algebra; only the shared scan/dedup is deduplicated.
    op_all = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def pair_support(op: DataFrame) -> DataFrame:
        a = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a")
        )
        b = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b")
        )
        return (
            a.join(b, "k")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )

    base = pair_support(op_all.filter(F.col("l_orderkey") % 10 != 0))
    delta = pair_support(op_all.filter(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionAll(delta)
        .groupBy("a", "b")
        .agg(F.sum("support").alias("support"))
    )
    full = spark.read.parquet(edge_store_path(spark, sf_dir)).select(
        "a", "b", F.col("support").alias("support_full")
    )
    joined = merged.join(full, ["a", "b"], "full_outer")
    return joined.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("support_full").cast("bigint").alias("support_total"),
        F.sum(
            F.when(
                ~F.col("support").eqNullSafe(F.col("support_full")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("merge_mismatches"),
    )


@query(
    "graph_triangle_from_store",
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
def graph_triangle_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`graph_triangle_count`'s production shape (same oracle,
    hash-identical result): the oriented edge list comes from the
    persisted pair-support store with the relative minsup applied at
    read time from the corpus sidecar — zero lineitem scans in the
    query path, mirroring `graph_pagerank_from_store`. The two-join
    wedge enumeration is unchanged; with the edge build amortized into
    the store, the query cost is purely the wedge work on the PRUNED
    graph."""
    path = edge_store_path(spark, sf_dir)
    thr = _edge_store_threshold(path)
    edges = (
        spark.read.parquet(path)
        .where(F.col("support") >= F.lit(thr))
        .select("a", "b")
        .cache()
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
# graph_link_predict_from_store — neighborhood-Jaccard link prediction
# over the maintained co-order graph
# --------------------------------------------------------------------------

_LP_TOPK = 20


@query(
    "graph_link_predict_from_store",
    oracle=f"""
    WITH ps AS MATERIALIZED ({_PAIR_SUPPORT_SQL}),
    thr AS MATERIALIZED (
      SELECT GREATEST(2, COUNT(*) // 50000) AS t FROM orders
    ),
    edges AS MATERIALIZED (
      SELECT a, b FROM ps WHERE support >= (SELECT t FROM thr)
    ),
    und AS MATERIALIZED (
      SELECT a AS node, b AS nbr FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY node
    ),
    shared AS MATERIALIZED (
      SELECT x.node AS a, y.node AS b, CAST(COUNT(*) AS BIGINT) AS c
      FROM und x JOIN und y ON x.nbr = y.nbr AND x.node < y.node
      GROUP BY x.node, y.node
    ),
    cand AS MATERIALIZED (
      SELECT s.a, s.b, s.c, da.d AS da, db.d AS db,
             (s.c * 1000000) // (da.d + db.d - s.c) AS jaccard_e6
      FROM shared s
      JOIN deg da ON da.node = s.a
      JOIN deg db ON db.node = s.b
      LEFT JOIN edges e ON e.a = s.a AND e.b = s.b
      WHERE e.a IS NULL
    )
    SELECT rk, a AS node_a, b AS node_b, c AS shared_nbrs,
           da AS degree_a, db AS degree_b, jaccard_e6
    FROM (
      SELECT a, b, c, da, db, jaccard_e6,
             ROW_NUMBER() OVER (
               ORDER BY jaccard_e6 DESC, a ASC, b ASC) AS rk
      FROM cand
    ) t
    WHERE rk <= {_LP_TOPK}
    ORDER BY rk ASC
    """,
)
def graph_link_predict_from_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction over the maintained co-order graph: the top-20
    NON-ADJACENT part pairs by exact neighborhood Jaccard — the
    collaborative-filtering "products bought together with the same
    things" recommender primitive, served FROM THE PERSISTED EDGE STORE
    with the relative minsup applied at read time (zero lineitem scans,
    the `graph_pagerank_from_store` contract). Jaccard is exact integer
    arithmetic (shared*1e6 // (da+db-shared), positive operands), ranks
    totally ordered by (jaccard, a, b) — hash-checked against DuckDB's
    from-scratch rebuild of the same graph from the fact.

    Scale: candidate pairs are WEDGE pairs only (one self-join of the
    adjacency on the shared neighbor — sum(deg^2) work over the
    minsup-pruned graph, the `graph_triangle_from_store` cost class),
    never all-pairs; degrees and the adjacency are store-aggregate-
    sized; selection is TakeOrdered."""
    path = edge_store_path(spark, sf_dir)
    thr = _edge_store_threshold(path)
    edges = (
        spark.read.parquet(path)
        .filter(F.col("support") >= thr)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    und = edges.unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).toDF(
        "node", "nbr"
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x = und.alias("x")
    y = und.alias("y")
    shared = (
        x.join(
            y,
            (F.col("x.nbr") == F.col("y.nbr"))
            & (F.col("x.node") < F.col("y.node")),
        )
        .groupBy(F.col("x.node").alias("a"), F.col("y.node").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cand = (
        shared.join(edges, ["a", "b"], "left_anti")
        .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
        .selectExpr(
            "a", "b", "c", "da", "db",
            "(c * 1000000) div (da + db - c) AS jaccard_e6",
        )
    )
    top = cand.orderBy(
        F.col("jaccard_e6").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_LP_TOPK)
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.pmod(F.col("a"), F.lit(1))).orderBy(
        F.col("jaccard_e6").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return top.select(
        F.row_number().over(w).alias("rk"),
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        F.col("c").alias("shared_nbrs"),
        F.col("da").alias("degree_a"),
        F.col("db").alias("degree_b"),
        F.col("jaccard_e6").cast("bigint").alias("jaccard_e6"),
    ).orderBy("rk")
