"""Sort / limit / top-k operators (SURVEY.md §2B).

The reference's only ordering-adjacent operator is the oplog audit scan's
``limit(100)`` (js:496) — limit pushdown. Generalized to deterministic
top-k and global multi-key sort.

Scale notes: ``orderBy().limit(k)`` plans as TakeOrderedAndProject — each
partition keeps its local top-k heap and only k rows per partition reach
the driver-side merge; no global sort ever materializes. The global
row_number in `sort_multikey` is the opposite: a deliberate single-
partition window to make total order observable to the hash check — fine
for ranked-report output sizes, never for fact-scale data (the docstring
is the warning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 orders by price, o_orderkey tiebreak for a deterministic
    result set. Physical plan: TakeOrderedAndProject (per-partition heaps,
    no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sort_multikey",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
           ROW_NUMBER() OVER (
             ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC) AS pos
    FROM supplier
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total order surfaced as a rank column so the
    order-insensitive hash still verifies the ordering. Runs on the
    supplier dimension: a global (unpartitioned) window is single-task by
    construction, acceptable only at dimension scale."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(
        F.col("s_nationkey").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        "s_acctbal",
        F.row_number().over(w).alias("pos"),
    )
