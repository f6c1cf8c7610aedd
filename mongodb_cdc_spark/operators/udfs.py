"""UDF / UDAF / UDTF surface (SURVEY.md §2B).

The engine's position (and the reference's, implicitly — its per-event
transform js:157-186 is trivially expressible relationally): UDFs are the
slow path. These four operators exist to prove the full extension surface
works, each with a note on when the tier is actually warranted:

* row-at-a-time Python UDF — serde per row, breaks codegen; registered
  for parity, never for the hot path;
* pandas (Arrow) UDF — vectorized batches, the right tier when Python is
  genuinely needed (custom scoring, library calls);
* grouped applyInPandas UDAF — per-group pandas frames, for aggregation
  logic SQL can't express;
* Python UDTF (Spark >= 3.5) — one-to-many row generation in Python.

Determinism: the UDAF sums in fixed-point int64 inside pandas (shuffle
order reaches the Python worker, so float sums would be run-dependent —
same discipline as _util, applied in numpy).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@udf(DoubleType())
def _clip_py(v: float) -> float:
    """Row-at-a-time clip(value, 0, 100)."""
    if v is None:
        return None
    return 0.0 if v < 0 else (100.0 if v > 100 else float(v))


@query(
    "udf_python_scalar",
    oracle="""
    SELECT event_id, LEAST(GREATEST(value, 0), 100) AS clipped
    FROM events
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the anti-pattern tier, kept for surface
    parity): clip(value, 0, 100). Pass-through doubles, no FP discipline
    needed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _clip_py("value").alias("clipped"))


@pandas_udf(DoubleType())
def _clip_pandas(v: pd.Series) -> pd.Series:
    """Arrow-vectorized clip(value, 0, 100)."""
    return v.clip(lower=0.0, upper=100.0)


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, LEAST(GREATEST(value, 0), 100) AS clipped
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as `udf_python_scalar`, vectorized over Arrow
    batches — the 10-100x-faster tier when Python is unavoidable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _clip_pandas("value").alias("clipped"))


def _weighted_avg_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Weighted avg price by quantity for one group, in fixed-point int64:
    rows arrive in shuffle order, so float accumulation would be
    run-dependent; integer sums are order-free. Mirrors _util.avg2's
    rounding formula exactly."""
    import numpy as np

    num = int(np.floor(pdf["l_extendedprice"] * pdf["l_quantity"] * 10000).astype("int64").sum())
    den = int(np.floor(pdf["l_quantity"] * 10000).astype("int64").sum())
    if den == 0:
        wavg = None
    else:
        # round(num/den, 2) half-up in integer domain:
        # cents = floor(num*100/den + 1/2) = (200*num + den) // (2*den)
        cents = (200 * num + den) // (2 * den) if num >= 0 else -(
            (200 * -num + den) // (2 * den)
        )
        wavg = cents / 100.0
    return pd.DataFrame(
        {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "weighted_avg_price": [wavg]}
    )


@query(
    "udaf_grouped_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST((CASE WHEN SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000) AS BIGINT)) >= 0
             THEN (200 * SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000) AS BIGINT))
                   + SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)))
                  // (2 * SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)))
             ELSE -((200 * -SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000) AS BIGINT))
                   + SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)))
                  // (2 * SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT))))
             END) AS DOUBLE) / 100.0 AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas UDAF via applyInPandas: qty-weighted average price
    per return flag, accumulated in fixed-point int64 so the result is
    independent of row arrival order."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(
            _weighted_avg_group,
            schema="l_returnflag string, weighted_avg_price double",
        )
    )


@udtf(returnType="l_orderkey bigint, l_linenumber int, bucket_unit int")
class _QuantityBuckets:
    """Emit one row per 10-unit bucket of l_quantity (at least one)."""

    def eval(self, l_orderkey: int, l_linenumber: int, l_quantity: float):
        n = max(1, int(l_quantity // 10) + (1 if l_quantity % 10 > 0 else 0))
        for i in range(n):
            yield l_orderkey, l_linenumber, i


@query(
    "udtf_explode_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, unnest(generate_series(0, buckets - 1)) AS bucket_unit
    FROM (
      SELECT l_orderkey, l_linenumber,
             GREATEST(1, CAST(CEIL(l_quantity / 10) AS INT)) AS buckets
      FROM lineitem
    )
    """,
)
def udtf_explode_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark >= 3.5): one output row per 10-unit quantity
    bucket per lineitem — one-to-many generation in Python. The oracle is
    the relational formulation (generate_series unnest); at scale the
    relational form wins — the UDTF tier is for generation logic SQL
    can't express."""
    li = load_table(spark, sf_dir, "lineitem")
    spark.udtf.register("quantity_buckets", _QuantityBuckets)
    li.select("l_orderkey", "l_linenumber", "l_quantity").createOrReplaceTempView(
        "_udtf_input"
    )
    return spark.sql(
        """
        SELECT t.l_orderkey, t.l_linenumber, t.bucket_unit
        FROM _udtf_input,
        LATERAL quantity_buckets(l_orderkey, l_linenumber, l_quantity) t
        """
    )


def _cogroup_profile(evdf: pd.DataFrame, odf: pd.DataFrame) -> pd.DataFrame:
    """Per-key pandas merge over BOTH frames: activity profile from the
    event side + order side together. Integer outputs only (counts and
    key maxima) — exact under any shuffle order."""
    uid = (
        evdf["user_id"].iloc[0]
        if len(evdf)
        else odf["o_custkey"].iloc[0]
    )
    return pd.DataFrame(
        {
            "user_id": [int(uid)],
            "n_events": [len(evdf)],
            "n_orders": [len(odf)],
            "last_event_id": [int(evdf["event_id"].max()) if len(evdf) else -1],
            "last_order_key": [int(odf["o_orderkey"].max()) if len(odf) else -1],
        }
    )


@query(
    "udf_cogrouped_profile",
    oracle="""
    SELECT COALESCE(e.user_id, o.o_custkey) AS user_id,
           CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(e.last_event_id, -1) AS BIGINT) AS last_event_id,
           CAST(COALESCE(o.last_order_key, -1) AS BIGINT) AS last_order_key
    FROM (SELECT user_id, COUNT(*) AS n_events, MAX(event_id) AS last_event_id
          FROM events GROUP BY user_id) e
    FULL OUTER JOIN
         (SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderkey) AS last_order_key
          FROM orders GROUP BY o_custkey) o
      ON e.user_id = o.o_custkey
    """,
)
def udf_cogrouped_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (the last pandas API tier): events and
    orders cogrouped on user key, each group's BOTH frames handed to one
    Python function — the shape for per-key logic that genuinely needs
    two tables at once (custom as-of matching, per-entity reconciliation).
    This particular profile IS relationally expressible (that's what
    makes it exactly oracle-checkable — two aggregates + full outer
    join), so like `udf_python_scalar` it's surface-parity tier: at scale
    prefer the relational form; reach for cogroup only past SQL's edge.
    Scale shape: one shuffle per side on the key, then per-group Arrow
    batches; no state, no collect.

    The explicit repartition matters: this stage's cost is per-GROUP
    Python overhead, not bytes, but AQE's coalescing cost model is
    bytes-based — at sf0.1 it folded the small shuffle into one task and
    serialized 15k group calls (measured 17 s; 4.8 s with parallelism
    pinned). Pre-hashing both sides on the key satisfies the cogroup's
    required distribution, so no coalescible exchange is inserted. The
    general rule: never let a bytes-small, group-many Python stage
    inherit AQE's partition count."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id")
        .repartition(n_part, "user_id")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey")
        .repartition(n_part, "o_custkey")
    )
    out_schema = (
        "user_id bigint, n_events bigint, n_orders bigint, "
        "last_event_id bigint, last_order_key bigint"
    )
    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(lambda e, o: _cogroup_profile(e, o), out_schema)
    )


@udtf(returnType="event_type string, n bigint, max_gap_s bigint")
class _TypeGapProfile:
    """Per-partition stateful profile: row count and the largest gap
    (seconds) between consecutive events, consumed in the engine-supplied
    PARTITION BY event_type ORDER BY (ts_s, event_id) order. All-integer
    state — exact under any partitioning."""

    def __init__(self):
        self._type = None
        self._n = 0
        self._prev = None
        self._max_gap = 0

    def eval(self, row):
        self._type = row["event_type"]
        self._n += 1
        if self._prev is not None and row["ts_s"] - self._prev > self._max_gap:
            self._max_gap = row["ts_s"] - self._prev
        self._prev = row["ts_s"]

    def terminate(self):
        if self._n:
            yield self._type, self._n, self._max_gap


@query(
    "udtf_table_args",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_s
    FROM (
      SELECT event_type,
             (epoch_ns(ts) // 1000000000)
               - LAG(epoch_ns(ts) // 1000000000) OVER (
                   PARTITION BY event_type
                   ORDER BY epoch_ns(ts) // 1000000000 ASC, event_id ASC
                 ) AS gap
      FROM events
    )
    GROUP BY event_type
    """,
)
def udtf_table_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF with a TABLE argument (Spark >= 3.5): the
    engine partitions and orders the input (PARTITION BY event_type
    ORDER BY (ts_s, event_id)) and streams each partition's rows through
    per-partition Python state, with terminate() emitting one summary
    row per partition — the custom-stateful-aggregation API tier in its
    batch form (`applyInPandasWithState` is the streaming twin). The
    oracle is the relational formulation (LAG + MAX), proving the
    Python state machine equals the window algebra exactly.

    Scale: the shuffle is the engine's own hash partition on the
    PARTITION BY key; Python sees each partition once, sequentially —
    state is O(1) per partition, and the ordered-iteration contract is
    what SQL cannot express for genuinely path-dependent logic
    (sessionization with lookahead, pattern matching)."""
    ev = load_table(spark, sf_dir, "events")
    spark.udtf.register("type_gap_profile", _TypeGapProfile)
    ev.select(
        "event_type",
        F.to_unix_timestamp("ts").cast("bigint").alias("ts_s"),
        "event_id",
    ).createOrReplaceTempView("_udtf_gap_input")
    return spark.sql(
        """
        SELECT t.event_type, t.n, t.max_gap_s
        FROM type_gap_profile(
          TABLE(_udtf_gap_input)
          PARTITION BY event_type
          ORDER BY (ts_s, event_id)
        ) t
        """
    )


# --------------------------------------------------------------------------
# udf_arrow_optimized — the Spark 4 per-row-API / Arrow-transport tier
# --------------------------------------------------------------------------


@udf(DoubleType(), useArrow=True)
def _clip_arrow(v: float) -> float:
    """Same row-at-a-time signature as _clip_py, but Arrow-serialized."""
    if v is None:
        return None
    return 0.0 if v < 0 else (100.0 if v > 100 else float(v))


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT event_id, LEAST(GREATEST(value, 0), 100) AS clipped
    FROM events
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): the
    row-at-a-time programming model of `udf_python_scalar` with the
    Arrow batch TRANSPORT of `udf_pandas_scalar` — the middle tier that
    rescues per-row-API code from pickle serialization without the
    rewrite to Series-in/Series-out. Completes the three-step UDF
    ladder the engine documents: pickle rows -> Arrow rows -> Arrow
    vectorized; at 100 TB only the last belongs in a hot path, and this
    tier is the cheap mechanical upgrade for the first."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _clip_arrow("value").alias("clipped"))


# --------------------------------------------------------------------------
# api_pandas_on_spark — the pandas-API-on-Spark surface
# --------------------------------------------------------------------------


@query(
    "api_pandas_on_spark",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY event_type
    """,
)
def api_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (``pyspark.pandas``): the same grouped
    aggregate written as idiomatic pandas (`df.groupby(...).agg(...)`)
    against a DISTRIBUTED frame — the migration surface for pandas
    codebases. The hash certifies the ps plan compiles to the identical
    relational result (counts + exact cent sums), and the round-trip
    ``to_spark()`` hands the lazy plan back to the engine without
    collecting.

    Scale note: ps defaults to computing an index; ``attach_distributed
    -sequence`` style defaults can add a global zipWithIndex pass, so
    this operator derives everything from columns (no index reliance) —
    the discipline a 100 TB pandas-API user needs on day one."""
    import pyspark.pandas as ps

    ev = load_table(spark, sf_dir, "events")
    psdf = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    ).pandas_api()
    agg = (
        psdf.groupby("event_type", as_index=False)
        .agg(n=("vc", "count"), value_cents=("vc", "sum"))
    )
    sdf = agg.to_spark()
    return sdf.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("value_cents").cast("bigint").alias("value_cents"),
    )


# --------------------------------------------------------------------------
# udf_sql_function — SQL-defined scalar function (Spark 4 CREATE FUNCTION)
# --------------------------------------------------------------------------


@query(
    "udf_sql_function",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(
             CASE WHEN value < 0 THEN 0 ELSE value END * 100) AS BIGINT))
             AS BIGINT) AS clamped_cents,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE TEMPORARY FUNCTION
    ... RETURNS ... RETURN <expr>``): the function BODY is a Catalyst
    expression, so unlike every Python UDF tier it inlines into
    whole-stage codegen with zero serialization boundary — the right
    default for shareable scalar logic, with Python UDFs reserved for
    genuinely imperative code. The oracle states the inlined expression
    directly; hash equality certifies the function call IS the inline
    expression (same clamp-to-zero fixed-point semantics)."""
    from mongodb_cdc_spark.io import register_views

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION clamp_pos_cents(v DOUBLE) "
        "RETURNS BIGINT "
        "RETURN CAST(FLOOR((CASE WHEN v < 0 THEN 0 ELSE v END) * 100) AS BIGINT)"
    )
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CAST(SUM(clamp_pos_cents(value)) AS BIGINT) AS clamped_cents,
               COUNT(*) AS n
        FROM events GROUP BY event_type
        """
    )
