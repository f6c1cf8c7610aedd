"""TPC-H-shaped composite benchmark queries (Q3 / Q4 / Q5 / Q6 / Q10 /
Q14 / Q18 analogs over the driver's star schema). The reference has no
query engine at all
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


def _q6(dialect: int) -> str:
    rev = sum2_sql("l_extendedprice * l_discount", "revenue")[dialect]
    return f"""
    SELECT {rev}, COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """


@query("sql_tpch_q6", oracle=_q6(1))
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast-revenue change): the pure
    scan-filter-aggregate query — no join, no group key, one global sum.
    This is the pushdown showcase: all three predicates reach the parquet
    reader as PushedFilters, ReadSchema carries only the four touched
    columns, and the aggregate is a map-side partial with a single-row
    final merge. At 100 TB the query's cost IS the scan; everything
    Catalyst prunes here multiplies. Double equality predicates on
    l_discount are exact IEEE compares (the generator writes round
    hundredths; both engines see identical bits)."""
    register_views(spark, sf_dir)
    return spark.sql(_q6(0))


def _q4(dialect: int) -> str:
    return """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """


@query("sql_tpch_q4", oracle=_q4(1))
def sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): one quarter of orders
    that have at least one LATE lineitem (shipped >60 days after the
    order date — the schema has no commit/receipt dates, so late-ship is
    the analog of Q4's commit<receipt predicate), counted per priority.
    Catalyst decorrelates the EXISTS into a LEFT SEMI join on
    l_orderkey: the fact-fact join ships only (l_orderkey, l_shipdate)
    from lineitem, the quarter filter prunes orders before the join, and
    the correlated date predicate rides the join condition. Semi-join
    short-circuits per key, so multiplicity on the lineitem side never
    inflates the shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(_q4(0))


def _q14(dialect: int) -> str:
    div = ("div", "//")[dialect]
    # CAST around each SUM: DuckDB sums BIGINT into HUGEINT, which lands
    # as float64 in the driver's pandas hasher — the round-1 fn_json bug.
    promo = (
        "CAST(SUM(CASE WHEN p_type = 'PROMO' "
        "THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END) AS BIGINT)"
    )
    total = (
        "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)"
        " AS BIGINT)) AS BIGINT)"
    )
    return f"""
    SELECT {promo} AS promo_cents,
           {total} AS total_cents,
           CAST(({promo} * 10000) {div} {total} AS DOUBLE) / 100.0 AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """


@query("sql_tpch_q14", oracle=_q14(1))
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one month of lineitems joined
    to `part`, promo revenue share as a percentage. The part side is
    dimension-scale and broadcasts, so the fact never shuffles for the
    join; the month filter pushes to the fact scan; the global ratio is
    a one-row aggregate. The percentage is integer arithmetic end-to-end
    (cents x 10000, truncating division — both operands non-negative, so
    Spark's `div` and DuckDB's `//` agree), never a float division of
    float sums."""
    register_views(spark, sf_dir)
    return spark.sql(_q14(0))


def _q18(dialect: int, epoch: str) -> str:
    qty = "CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)"
    # Aggregate-once rewrite (round 5, the 100x-table residual): the
    # textbook form scans lineitem TWICE — once in the IN/HAVING subquery,
    # then again to re-sum quantities after the 3-way join. But the outer
    # GROUP BY is keyed on o_orderkey (c_custkey/c_name/o_orderdate are
    # functionally dependent through orders), so the re-aggregation IS the
    # subquery's aggregate: compute per-order qty once, keep the >25000
    # survivors (~1%), and join those to orders/customer. Identical rows
    # (gate-verified both SFs), half the lineitem work, and at 100x the
    # survivor set is small enough that AQE turns both remaining joins
    # into broadcasts over a single lineitem scan.
    return f"""
    WITH order_qty AS (
        SELECT l_orderkey, {qty} AS qty_cents
        FROM lineitem
        GROUP BY l_orderkey
        HAVING {qty} > 25000
    )
    SELECT c_custkey, c_name, o_orderkey,
           {epoch} AS o_orderdate_s,
           qty_cents
    FROM order_qty
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY qty_cents DESC, o_orderkey ASC
    LIMIT 20
    """


@query(
    "sql_tpch_q18",
    oracle=_q18(1, "(epoch_ns(o_orderdate) // 1000000000)"),
)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity exceeds a threshold only ~1% of orders clear, joined back
    to customers, top-20 by quantity. The IN subquery plans as a
    semi-join against a pre-aggregated key set — the HAVING filter
    collapses lineitem to qualifying orderkeys BEFORE the 3-way join, so
    the expensive join only sees the ~1% survivors. Quantity sums are
    exact cent-scaled BIGINTs on both engines; top-20 carries the unique
    o_orderkey tiebreak and plans as TakeOrderedAndProject."""
    register_views(spark, sf_dir)
    return spark.sql(_q18(0, "CAST(to_unix_timestamp(o_orderdate) AS BIGINT)"))


def _q19(dialect: int) -> str:
    rev = sum2_sql(_DISC, "revenue")[dialect]
    return f"""
    SELECT {rev}, COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size >= 1 AND p_size <= 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size >= 1 AND p_size <= 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size >= 1 AND p_size <= 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """


@query("sql_tpch_q19", oracle=_q19(1))
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    OR-of-conjunctions query that stress-tests predicate handling. The
    planner-relevant behaviors: (a) Catalyst derives the IMPLIED
    single-table predicates from the disjunction — `p_brand IN (12, 23,
    3)` pushes to the part scan and `l_quantity BETWEEN 1 AND 30` to the
    lineitem scan (each conjunct of every branch contributes to a
    per-side OR that prunes before the join); (b) the residual
    cross-table disjunction evaluates post-join in codegen; (c) part
    stays broadcast. Without (a), a disjunctive filter reads both
    relations in full — at 100 TB the difference between scanning three
    brands and scanning the catalog."""
    register_views(spark, sf_dir)
    return spark.sql(_q19(0))


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
