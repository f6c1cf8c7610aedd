"""SQL subquery + CTE surface — the parser/decorrelation side of the
engine. These run through ``spark.sql`` with oracle text that is the SAME
SQL (both engines are ANSI here), so the check verifies Spark's subquery
DECORRELATION (correlated scalar -> aggregate + join rewrite; IN ->
semi-join) produces relationally identical results.

Scale notes: Catalyst rewrites every correlated subquery below into a
keyed join + aggregate — nothing executes per-row. The recursive CTE
(Spark >= 4.0) iterates driver-side over set-based steps; the date-spine
pattern it implements (gap-filled time series) has a step count bounded
by calendar months, not data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongodb_cdc_spark.io import register_views
from mongodb_cdc_spark.registry import query

_CORRELATED_SCALAR = """
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
"""


@query("sql_correlated_scalar", oracle=_CORRELATED_SCALAR)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery per outer row — Catalyst decorrelates
    into one aggregate + left join (verify with .explain: no per-row
    plans). The oracle is the identical SQL text."""
    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SCALAR)


_IN_SUBQUERY = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
"""


@query("sql_in_subquery", oracle=_IN_SUBQUERY)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — planned as a left semi join."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SUBQUERY)


_DATE_SPINE = """
WITH RECURSIVE months(m) AS (
  SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
)
SELECT year(m) * 100 + month(m) AS ym,
       COUNT(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY year(m) * 100 + month(m)
"""


@query("sql_recursive_cte", oracle=_DATE_SPINE)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark >= 4.0): a month date-spine spanning the
    orders range, left-joined back so EMPTY months appear with zero —
    the gap-filling idiom plain GROUP BY cannot express (it has no row to
    group). Output is (yyyymm int, count): no timestamps to hash.

    The spine bounds are resolved to literals FIRST (one 2-scalar
    aggregate): Spark's recursion re-evaluates the step query each
    iteration, so a correlated ``(SELECT MAX(..) FROM orders)`` inside
    the step rescans the fact table once per month — ~80 scans for this
    range (measured 16 s at sf0.001 vs 0.2 s with literal bounds). The
    oracle keeps the self-contained form; DuckDB's recursion evaluates
    its step subquery against a materialized result, so it does not pay
    the rescan.

    Iteration count is a driver-side cost (one job per recursion round):
    the anchor seeds the first YEAR of months (capped at hi) and the
    step advances by 1 YEAR, so rounds = #years (~7), not #months (~80)
    — same spine, ~10× fewer driver round trips (2.8 s -> 1.5 s at
    sf0.1; the rest is the bounds scalar + the spine-to-orders join)."""
    register_views(spark, sf_dir)
    lo, hi = spark.sql(
        "SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS STRING), "
        "       CAST(date_trunc('month', MAX(o_orderdate)) AS STRING) FROM orders"
    ).first()
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
          SELECT explode(sequence(
                   TIMESTAMP '{lo}',
                   least(TIMESTAMP '{lo}' + INTERVAL 11 MONTH, TIMESTAMP '{hi}'),
                   INTERVAL 1 MONTH)) AS m
          UNION ALL
          SELECT m + INTERVAL 1 YEAR FROM months
          WHERE m + INTERVAL 1 YEAR <= TIMESTAMP '{hi}'
        )
        SELECT year(m) * 100 + month(m) AS ym,
               COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        GROUP BY year(m) * 100 + month(m)
    """)


_LATERAL_TOPN = """
SELECT n_name, t.c_custkey, t.c_name, t.acctbal_cents
FROM nation,
LATERAL (
  SELECT c_custkey, c_name,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 3
) t
"""


@query("sql_lateral_topn", oracle=_LATERAL_TOPN)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT: the
    top-3 customers by account balance for every nation — the SQL shape
    analysts write for grouped top-N, handed to Catalyst's subquery
    decorrelation (DecorrelateInnerQuery rewrites it to a ranked window,
    one keyed shuffle — never a per-nation re-scan of customer, which is
    what the naive nested-loop reading would cost at 100 TB). Identical
    text runs on DuckDB, which decorrelates the same way — a cross-engine
    check of decorrelation SEMANTICS, not just one plan.

    Determinism: cents are fixed-pointed, the per-group order carries the
    unique c_custkey tiebreak, and c_custkey is in the output."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN)


# --------------------------------------------------------------------------
# sql_null_semantics
# --------------------------------------------------------------------------


def _null_semantics(dialect: int) -> str:
    nseq = ("<=>", "IS NOT DISTINCT FROM")[dialect]
    return f"""
    WITH nullable_set AS (
        SELECT DISTINCT NULLIF(o_orderstatus, 'F') AS st
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT
      (SELECT COUNT(*) FROM orders
       WHERE o_orderstatus NOT IN (SELECT st FROM nullable_set))
        AS n_not_in_with_null,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderstatus NOT IN
         (SELECT st FROM nullable_set WHERE st IS NOT NULL))
        AS n_not_in_filtered,
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM nullable_set s
                         WHERE s.st = o.o_orderstatus))
        AS n_anti_join,
      (SELECT COUNT(*) FROM orders o
       JOIN nullable_set s
         ON NULLIF(o.o_orderstatus, 'F') {nseq} s.st)
        AS n_null_safe_matches
    """


@query("sql_null_semantics", oracle=_null_semantics(1))
def sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic corner surface, reported as data: against a
    nullable IN-set (it contains a genuine NULL), the same membership
    question is asked four ways — (1) NOT IN, which by ANSI 3VL returns
    ZERO rows the moment the set holds a NULL (every non-member compare
    yields UNKNOWN — the classic production trap); (2) NOT IN with the
    NULL filtered, the usual fix; (3) NOT EXISTS, whose anti-join
    semantics ignore the NULL and agree with (2); (4) a NULL-SAFE
    equality join (Spark `<=>` / ANSI IS NOT DISTINCT FROM) where NULL
    DOES match NULL, counting the rows only that operator can pair.

    The engine behaviors under test: Catalyst must plan the NOT IN as a
    null-aware anti-join (not drop the null semantics), and the
    null-safe condition must still plan as a HASHABLE equi-join (Spark
    hashes <=> keys; a naive planner falls back to nested-loop).
    Scale: the set is dimension-sized; all four probes are broadcast
    semi/anti joins over one fact scan each."""
    register_views(spark, sf_dir)
    return spark.sql(_null_semantics(0))


# --------------------------------------------------------------------------
# sql_pipe_syntax — Spark 4 pipe-operator SQL
# --------------------------------------------------------------------------

_PIPE_AS_ANSI = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@query("sql_pipe_syntax", oracle=_PIPE_AS_ANSI)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (`FROM t |> WHERE ... |> AGGREGATE`):
    the same relational plan as the ANSI formulation — the oracle IS the
    ANSI form, so the check certifies that the pipe parser lowers to the
    identical algebra (filter -> aggregate, fixed-point money sums). The
    pipe form exists for pipeline-authoring ergonomics; there is no
    physical-plan difference, which is exactly what the hash equality
    demonstrates."""
    register_views(spark, sf_dir)
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS price_cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, price_cents
    """)


# --------------------------------------------------------------------------
# sql_group_by_all — GROUP BY ALL syntax parity
# --------------------------------------------------------------------------


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB): every non-aggregate select
    item becomes a grouping key implicitly — the analyst-SQL ergonomics
    both engines converged on, run AS that syntax on BOTH sides so the
    parity claim is the literal clause, not a rewrite.

    Scale: identical plan to the explicit two-key hash aggregate
    (map-side combine, group-bounded shuffle); ALL is sugar resolved at
    analysis time."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        """
    )
