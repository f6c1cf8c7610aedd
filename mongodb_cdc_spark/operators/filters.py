"""Projection / filter operators (SURVEY.md §2B).

These are the batch-relational formulations of the reference's server-side
`$match` pushdown (js:221-232): Catalyst pushes every one of these
predicates into the parquet scan (check ``.explain``: PushedFilters), the
same way the reference ships its `$match` stage into mongod.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import round2, round2_sql
from mongodb_cdc_spark.registry import query


@query(
    "project_select",
    oracle=f"""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_no,
           l_quantity AS qty,
           {round2_sql('l_extendedprice * (1 - l_discount)', 'net_price')[1]}
    FROM lineitem
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename + computed column ``net_price``.

    Per-row arithmetic only; the fixed-point round (`_util.round2`) keeps
    the emitted double bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("qty"),
        round2("l_extendedprice * (1 - l_discount)", "net_price"),
    )


@query(
    "filter_optype_isin",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('signup', 'purchase')
    """,
)
def filter_optype_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's operation-type `$in` filter verbatim (js:221-223:
    ``$match: {operationType: {$in: ['insert','update']}}``) over the
    `events` stand-in."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "filter_time_range",
    oracle="""
    SELECT event_id, user_id, event_type,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range predicate (js:226-232: optional clusterTime >= start /
    <= end added to the `$match`). Whole-second bounds are stable under
    the engines' ns-vs-µs precision difference."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").between("2024-01-05 00:00:00", "2024-01-15 00:00:00")
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
    )


@query(
    "filter_compound_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE ((o_orderstatus = 'F' AND o_totalprice > 100000)
           OR o_orderpriority = '1-URGENT')
      AND NOT (o_orderstatus IS NOT DISTINCT FROM 'P')
    """,
)
def filter_compound_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition + null-safe comparison (``eqNullSafe`` ≅
    SQL IS NOT DISTINCT FROM)."""
    o = load_table(spark, sf_dir, "orders")
    keep = (
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)
    ) | (F.col("o_orderpriority") == "1-URGENT")
    return o.filter(keep & ~F.col("o_orderstatus").eqNullSafe("P")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
