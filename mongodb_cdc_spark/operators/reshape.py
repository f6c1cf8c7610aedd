"""Reshaping + order-statistic operators (STD surface beyond §2B's
minimum): pivot, unpivot, exact discrete median. Rounds out the
analytics-engine surface a reference user would expect.

Scale notes: pivot with an explicit value list is a single hash aggregate
(no second pass to discover values — always pass the list at scale);
unpivot is Expand (row explosion, no shuffle); the discrete median uses
one keyed sort per group, expressed identically in both engines so the
element pick is parity-exact (no interpolation arithmetic to diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import sum2, sum2_sql
from mongodb_cdc_spark.registry import query


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sum2_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_O')[1]},
           {sum2_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_F')[1]}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot line status into columns (explicit value list -> one pass).
    Expressed as conditional aggregation — exactly what Catalyst rewrites
    ``.pivot(col, values)`` into, minus the generated column names, which
    are pinned here for the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        sum2("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "qty_O"),
        sum2("CASE WHEN l_linestatus = 'F' THEN l_quantity END", "qty_F"),
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT o_orderkey, 'o_totalprice' AS measure, o_totalprice AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'o_custkey_as_double', CAST(o_custkey AS DOUBLE) FROM orders
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) via ``stack`` — wide measures to (name, value) rows;
    the primitive under the CDC field-wise diff's key-value comparison
    (SURVEY.md R14 mapping)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'o_totalprice', o_totalprice,"
            " 'o_custkey_as_double', CAST(o_custkey AS DOUBLE))"
        ).alias("measure", "value"),
    )


@query(
    "agg_median_disc",
    oracle="""
    SELECT l_returnflag, l_extendedprice AS median_price
    FROM (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ) WHERE rn = (n + 1) // 2
    """,
)
def agg_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete median (lower median element) per group, written as
    the identical rank-pick in both engines: a concrete element of the
    input — no interpolation arithmetic, hence no cross-engine FP drift.
    (Continuous quantiles at scale belong to approx_percentile sketches —
    see agg_approx_count_distinct's rationale.)"""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    wn = Window.partitionBy("l_returnflag")
    return (
        li.select(
            "l_returnflag",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("l_returnflag", F.col("l_extendedprice").alias("median_price"))
    )
