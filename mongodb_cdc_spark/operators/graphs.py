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

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query

# --------------------------------------------------------------------------
# graph_triangle_count
# --------------------------------------------------------------------------

_EDGES_SQL = """
    SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
    FROM lineitem l1
    JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_partkey < l2.l_partkey
"""


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL})
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
    """Triangle count on the co-order part graph (parts are nodes; an
    edge joins two parts that appear in the same order). Edges are
    ORIENTED low-id -> high-id before counting, so every triangle is
    enumerated exactly once as a < b < c: the wedge join (e1.b = e2.a)
    builds a-b-c paths and the closing join checks a-c — the standard
    two-join triangle enumeration, never an all-pairs product.

    Scale: edge construction explodes per-order pairs — bounded by
    order size squared, the co-occurrence cap every co-*-graph needs
    (cap basket size upstream for pathological orders); DISTINCT dedups
    edges in one shuffle on (a, b). Both triangle joins are equi-joins
    on single keys; at 100 TB the win is orienting edges by DEGREE
    (low-degree endpoint first) so wedge lists stay short — id-ordering
    is the deterministic stand-in here, same asymptotics on this
    near-uniform degree distribution. Counts are exact BIGINTs."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    edges = spark.sql(_EDGES_SQL)
    edges.createOrReplaceTempView("tri_edges")
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
