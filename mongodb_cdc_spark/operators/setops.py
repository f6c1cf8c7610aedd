"""Set operators (SURVEY.md §2B "Set operations").

The reference's one set-ish operation is distinct-id extraction during the
window audit (js:499 ``new Set(...)``) — generalized to the full
union/intersect/except surface.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
the distinct variants shuffle on the full row — at 100 TB prefer
aggregating or semi-joining on a key over whole-row DISTINCT when
semantics allow (cf. cdc.py which uses keyed distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@query(
    "set_union_all",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two filtered slices (unionByName: schema aligned by
    column name, not position)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type"]
    a = ev.filter(F.col("event_type") == "signup").select(*cols)
    b = ev.filter(F.col("event_type") == "purchase").select(*cols)
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup after concatenation)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (SQL INTERSECT ALL): each orderkey kept
    min(left-count, right-count) times. Spark plans ``intersectAll`` as a
    count-per-side aggregate + generate — one shuffle on the row, no
    pairwise join blow-up; the multiset semantics matter when dedup
    accounting must preserve multiplicity (e.g. per-occurrence audit
    counts, unlike the set-semantic `set_intersect`)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (SQL EXCEPT ALL): occurrences on the left minus
    occurrences on the right, floored at zero — the multiset complement
    of `set_intersect_all`, planned the same shuffle-once way."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.exceptAll(b)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in both customer and supplier (set semantics,
    like SQL INTERSECT)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT o_orderkey AS orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent orders with no returned line (non-empty at every test SF).
    ``subtract`` is SQL EXCEPT (distinct set difference) — NOT
    ``exceptAll().distinct()``, which would keep rows that merely occur
    more often on the left."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.subtract(b)
