"""TPC-H-shaped composite benchmark queries (Q3 / Q5 / Q10 analogs over
the driver's star schema). The reference has no query engine at all
(SURVEY.md §2A "explicitly absent"), so these are the proof that a user
gets real warehouse analytics from the switch: multi-way star joins,
selective dimension filters, grouped revenue aggregates, deterministic
top-k — each one a composition of mechanics the registry already proves
in isolation (broadcast dims, fixed-point sums, TakeOrdered), now
exercised as end-to-end shapes Catalyst must plan well TOGETHER.

Shared-template discipline: one SQL text per query, formatted per
dialect (the only splits are the fixed-point sum and epoch helpers), so
the Spark plan and the DuckDB oracle cannot drift semantically.

Scale notes: all three are classic star shapes — dimension sides are
broadcast (region/nation/customer at dim scale), the single fact shuffle
is the grouped aggregate on bounded keys, and both top-k queries carry
unique tiebreaks and plan as TakeOrderedAndProject. AQE reorders the
join chain by runtime sizes; nothing here pins a join order by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongodb_cdc_spark.io import register_views
from mongodb_cdc_spark.operators._util import sum2_sql
from mongodb_cdc_spark.registry import query

_DISC = "l_extendedprice * (1 - l_discount)"


def _q3(dialect: int, epoch: str) -> str:
    rev = sum2_sql(_DISC, "revenue")[dialect]
    return f"""
    SELECT l_orderkey,
           {rev},
           {epoch} AS o_orderdate_s,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """


@query(
    "sql_tpch_q3",
    oracle=_q3(1, "(epoch_ns(o_orderdate) // 1000000000)"),
)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority revenue): segment-filtered
    customers x unshipped orders x open lineitems, top-10 orders by
    revenue. Customer prunes to one segment and broadcasts; the only
    shuffle is the per-order aggregate; top-10 is per-partition heaps
    with the unique l_orderkey tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(_q3(0, "CAST(to_unix_timestamp(o_orderdate) AS BIGINT)"))


def _q5(dialect: int) -> str:
    rev = sum2_sql(_DISC, "revenue")[dialect]
    return f"""
    SELECT n_name, COUNT(*) AS n_lines, {rev}
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """


@query("sql_tpch_q5", oracle=_q5(1))
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): the 6-way star join with
    the region filter walking down the dimension chain and the
    local-supplier condition (s_nationkey = c_nationkey) joining two
    dimension paths of the same fact row. Every dimension side is
    broadcast-range; the fact is shuffled once for the per-nation
    aggregate. The classic AQE test: join order is chosen from runtime
    sizes, not syntax order."""
    register_views(spark, sf_dir)
    return spark.sql(_q5(0))


def _q10(dialect: int) -> str:
    rev = sum2_sql(_DISC, "revenue")[dialect]
    return f"""
    SELECT c_custkey, c_name, n_name, {rev}
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """


@query("sql_tpch_q10", oracle=_q10(1))
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): one quarter of orders,
    returned lineitems only, top-20 customers by lost revenue — the
    churn-triage query. Time + returnflag predicates push to the fact
    scans; the grouped aggregate is bounded by active customers; top-20
    carries the unique c_custkey tiebreak."""
    register_views(spark, sf_dir)
    return spark.sql(_q10(0))
