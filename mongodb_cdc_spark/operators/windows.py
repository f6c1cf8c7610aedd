"""Window-function operators (SURVEY.md §2B "Window functions").

`win_latest_per_key` is the batch soul of the reference: replaying its
insert/update upsert stream (js:157-186) over a key is exactly "keep the
last row per key by (ts, id)" — one row_number window. The rest is the
standard analytic surface.

Scale notes: every window here partitions by a key (user_id, nation), so
the shuffle is keyed and bounded by per-key cardinality; Spark evaluates
row_number/rank/lag streamingly within a partition (no buffering beyond
the frame). The rolling sum uses fixed-point BIGINTs because engines may
compute sliding frames incrementally (add/remove) vs by re-scan — double
addition isn't associative, exact integers are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@query(
    "win_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def win_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: latest event per user_id — the batch semantics of
    the reference's idempotent upsert apply (js:157-199: each key ends at
    its newest fullDocument). event_id DESC tiebreak makes the pick
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
        )
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank of customers by account balance within nation.
    Rank values depend only on the (identical) double values, so ties are
    engine-stable without a tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value) OVER w AS delta_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequential deltas (lag) and lookahead (lead). The delta is
    a single IEEE subtraction of pass-through doubles — bit-identical
    across engines, no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_moving_agg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0
           AS rolling_value
    FROM events
    """,
)
def win_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-row sum per user. Fixed-point BIGINT inside the frame:
    engines are free to compute sliding sums incrementally (current +=
    entering - leaving) or by re-scan, which changes double results —
    integer accumulation is exact either way."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 0)
    )
    scaled = F.floor(F.col("value") * 10000).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(scaled).over(w).cast("double") / 10000.0).alias("rolling_value"),
    )


@query(
    "win_ntile_pctrank",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS bal_quartile,
           PERCENT_RANK() OVER w AS bal_pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) + percent_rank over account balance, custkey tiebreak in
    the ORDER BY (ntile assigns by position, so the total order must be
    deterministic).

    Computed as a TWO-PASS exact global rank, never a single
    unpartitioned WindowExec (which funnels the whole table through one
    task — customer is 15 M rows at sf100, fact-sized at 100 TB-class):

    1. ~equi-depth bucket boundaries on the leading sort key via one
       ``percentile_approx`` aggregate (map-side combinable); each row is
       assigned its bucket map-side by counting boundaries below its
       value. Any consistent value-based bucketing preserves global
       order across buckets, so boundary-sketch nondeterminism cannot
       change the result.
    2. per-bucket counts (<= 64 rows) are collected and turned into
       cumulative offsets, broadcast back; the rank window partitions by
       bucket — N parallel tasks — and the exact global rank is
       offset + local row_number. The total order is unique (custkey
       tiebreak), so rank == row_number and
       percent_rank = (rank-1)/(n-1); ntile(4) is reconstructed from the
       global rank with the standard first-(n mod 4)-buckets-get-
       ceil(n/4) rule, matching both engines' NTILE definition.

    The two tiny collects are bounded by the bucket count, not the data."""
    c = load_table(spark, sf_dir, "customer")
    n_buckets = 32
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_row = c.agg(
        F.percentile_approx("c_acctbal", probs, 10000).alias("b")
    ).collect()[0]
    bounds = sorted(set(bounds_row["b"] or []))
    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket_expr = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("c_acctbal") > b, 1).otherwise(0),
        )
    else:  # degenerate constant column: one bucket
        bucket_expr = F.lit(0)
    bucketed = c.select("c_custkey", "c_acctbal", bucket_expr.alias("_bkt"))
    cnts = {
        row["_bkt"]: row["n"]
        for row in bucketed.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(cnts.values())
    offsets, acc = {}, 0
    for b in sorted(cnts):
        offsets[b] = acc
        acc += cnts[b]
    # cumulative offsets as a LITERAL array indexed by bucket id — pure
    # map-side expression, no join at all (the bucket count bounds the
    # literal's size, not the data)
    max_bkt = max(offsets) if offsets else 0
    off_arr = F.array(
        *[F.lit(offsets.get(i, 0)).cast("bigint") for i in range(max_bkt + 1)]
    )
    wloc = Window.partitionBy("_bkt").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    ranked = bucketed.withColumn(
        "_rn", off_arr.getItem(F.col("_bkt")) + F.row_number().over(wloc)
    )
    quot, rem = divmod(n, 4)
    if quot == 0:  # n < 4: one row per tile
        quartile = F.col("_rn").cast("int")
    else:
        threshold = rem * (quot + 1)
        quartile = (
            F.when(
                F.col("_rn") <= threshold,
                F.floor((F.col("_rn") - 1) / (quot + 1)) + 1,
            )
            .otherwise(rem + F.floor((F.col("_rn") - 1 - threshold) / quot) + 1)
            .cast("int")
        )
    pct = (
        ((F.col("_rn") - 1).cast("double") / float(n - 1))
        if n > 1
        else F.lit(0.0)
    )
    return ranked.select(
        "c_custkey",
        quartile.alias("bal_quartile"),
        pct.alias("bal_pct_rank"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY (epoch_ns(ts) // 1000000000) ASC
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0
           AS hour_sum
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user rolling 1-hour sum. The ordering
    key is epoch SECONDS as an integer in both engines, so frame
    boundaries (and peer-row groups at equal seconds) are identical by
    construction — a RANGE frame over raw timestamps would compare µs vs
    ns precision at the boundary. Fixed-point accumulation as in
    win_moving_agg."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.to_unix_timestamp("ts").cast("bigint"))
        .rangeBetween(-3600, 0)
    )
    scaled = F.floor(F.col("value") * 10000).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(scaled).over(w).cast("double") / 10000.0).alias("hour_sum"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER w AS first_event_id,
           last_value(event_id) OVER w AS last_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame (the
    default frame would make last_value = current row)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event_id"),
        F.last("event_id").over(w).alias("last_event_id"),
    )


_SESSION_GAP_ORACLE = """
WITH secs AS (
  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS sec FROM events
), seq AS (
  SELECT user_id, sec, event_id,
         CASE WHEN sec - LAG(sec)
                   OVER (PARTITION BY user_id ORDER BY sec, event_id)
                   > 1800
              OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM secs
), sess AS (
  SELECT user_id, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM seq
)
SELECT user_id,
       CAST(MAX(sess_idx) AS BIGINT) AS n_sessions,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       MAX(cnt) AS max_session_events
FROM (
  SELECT user_id, sess_idx, COUNT(*) AS cnt
  FROM sess GROUP BY user_id, sess_idx
) GROUP BY user_id
"""


@query("win_session_gap", oracle=_SESSION_GAP_ORACLE)
def win_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions
    at >30-minute gaps (lag + conditional running sum — the classic
    gap-session idiom), then per-user session stats. The batch complement
    of `stream_session_window` (same 30-min gap semantics, computed over
    the closed log instead of a live watermark).

    One shuffle on user_id serves all three windows (lag, running sum)
    and the first aggregate — they share the partitioning, so Catalyst
    plans a single Exchange. Gap math is integer epoch seconds (exact
    cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.to_unix_timestamp("ts").cast("bigint")
    # both windows order by (sec, event_id) — integer seconds, so the
    # ordering (and therefore the session assignment) is bit-identical
    # cross-engine even if two events collide inside one second
    w = Window.partitionBy("user_id").orderBy(
        F.col("sec").asc(), F.col("event_id").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    seq = ev.select("user_id", "event_id", sec.alias("sec")).withColumn(
        "prev", F.lag("sec").over(w)
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev").isNull() | (F.col("sec") - F.col("prev") > 1800), 1
        ).otherwise(0),
    )
    sess = seq.withColumn("sess_idx", F.sum("is_new").over(run))
    per_session = sess.groupBy("user_id", "sess_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_session.groupBy("user_id").agg(
        F.max("sess_idx").alias("n_sessions"),
        F.sum("cnt").alias("n_events"),
        F.max("cnt").alias("max_session_events"),
    )


@query(
    "win_cume_dist_nth",
    oracle="""
    SELECT c_custkey, c_nationkey,
           cume_dist() OVER w AS cd,
           nth_value(c_custkey, 2) OVER (
             w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_richest_key
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value — the two ranked-window functions the rest
    of the window tier doesn't cover. Per nation: each customer's
    cumulative balance-rank fraction and the nation's second-richest
    customer key (explicit full-partition ROWS frame — both engines'
    default nth_value frame stops at CURRENT ROW, which would leave the
    first row NULL). The custkey tiebreak makes the order total, so the
    cume_dist ratio is the same small-integer division (IEEE-exact,
    deterministic) in both engines. One nationkey shuffle serves both
    functions."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_richest_key"),
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           quantile_cont(CAST(FLOOR(value * 100) AS BIGINT), 0.5) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS med5_cents
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median: per user, the median of the last 5 events'
    cent values — the ORDER-STATISTIC window (sum/avg windows are
    mergeable; a median window must rank its frame, the expensive tier
    every monitoring stack wants for robust rolling baselines).

    Determinism: inputs are exact integer cents; both engines implement
    the same type-7 continuous median (even frames average the two
    middle integers — exact in double: x.0 or x.5). The (ts, event_id)
    ordering is total, so frames are identical row sets.

    Scale: ROWS-frame order statistics cost O(frame log frame) per row
    inside one keyed sort — fine at frame=5; for large frames the scale
    answer is a sketch (approx_percentile partials) or a two-heap
    streaming median in applyInPandasWithState, both already present as
    tiers (agg_approx_quantiles, stream_stateful_upsert's API)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, 0)
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.percentile(cents, F.lit(0.5)).over(w).alias("med5_cents"),
    )


def _lag_ignore_nulls_sql(dialect: int) -> str:
    # IGNORE NULLS placement is the one syntax split: Spark puts it
    # after the function parens, DuckDB inside the argument list.
    arg = ("CASE WHEN event_type <> 'error' "
           "THEN CAST(FLOOR(value * 100) AS BIGINT) END")
    lag = (f"LAG({arg}) IGNORE NULLS", f"LAG({arg} IGNORE NULLS)")[dialect]
    return f"""
    SELECT event_id, user_id,
           {lag} OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_good_cents,
           CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT)
             AS is_error
    FROM events
    """


@query("win_lag_ignore_nulls", oracle=_lag_ignore_nulls_sql(1))
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG ... IGNORE NULLS: each event carries the previous VALID
    (non-error) reading per user — the gap-tolerant offset window that a
    plain LAG cannot express without a self-join (plain LAG returns the
    immediately-preceding row even when it is the garbage you are trying
    to skip). Sensor/metric pipelines use exactly this to compute deltas
    across dropouts.

    Determinism: the skipped class is projected to NULL inside the lag
    argument (CASE), values are exact cents, and the (ts, event_id)
    order is total. Scale: one keyed sort, same frame cost as plain LAG
    — IGNORE NULLS is a running-state scan, not a lookback loop."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_lag_ignore_nulls_sql(0))


# --------------------------------------------------------------------------
# win_distinct_count_frame
# --------------------------------------------------------------------------


@query(
    "win_distinct_count_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_10
    FROM events
    """,
)
def win_distinct_count_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a moving frame — the behavioral-breadth
    signal (how many distinct action types in the user's last 10
    events?) that flags bots (breadth 1 forever) and account takeovers
    (sudden breadth spikes). Spark's window aggregates reject DISTINCT,
    so the engine realizes it as size(collect_set()) over the same
    frame — semantically identical, and the oracle runs the native
    DISTINCT window to prove it.

    Scale: one keyed window sort (the shuffle any per-user sequence
    feature needs); the frame is bounded at 10 rows so the per-row set
    state is O(frame), never O(history) — the unbounded variant of this
    is exactly what `ts_cumulative_users` does with a running aggregate
    instead. Whole pass stays JVM-side."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-9, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint")
        .alias("distinct_types_10"),
    )


# --------------------------------------------------------------------------
# win_hampel_outliers — rolling median/MAD despiking (the Hampel filter)
# --------------------------------------------------------------------------
# The robust rolling twin of ts_anomaly_zscore: a point is an outlier
# when it sits more than 3 rolling-MADs from its rolling median — the
# standard sensor-despiking filter, immune to the spike polluting its
# own baseline (a rolling mean/std would absorb it). The MAD depends on
# each row's OWN frame median, so the frame is materialized as an array
# (collect_list over a centered ROWS window) and both order statistics
# are exact lower-median ELEMENT picks on sorted integer cents — no
# interpolation, no floats, bit-identical across engines (Spark arrays
# index 0-based, DuckDB lists 1-based; the rank arithmetic differs by
# exactly that constant).


@query(
    "win_hampel_outliers",
    oracle="""
    WITH fr AS (
      SELECT event_id, user_id, CAST(FLOOR(value * 100) AS BIGINT) AS x_cents,
             list(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS arr
      FROM events
    ),
    m AS (
      SELECT event_id, user_id, x_cents,
             list_sort(arr)[(len(arr) + 1) // 2] AS med_cents, arr
      FROM fr
    )
    SELECT event_id, user_id, x_cents, med_cents,
           list_sort(list_transform(arr, v -> abs(v - med_cents)))
             [(len(arr) + 1) // 2] AS mad_cents,
           (abs(x_cents - med_cents) >
              3 * list_sort(list_transform(arr, v -> abs(v - med_cents)))
                    [(len(arr) + 1) // 2]) AS is_outlier
    FROM m
    """,
)
def win_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despiking over each user's event-value series (docstring
    block above): per event the exact rolling median and rolling MAD of
    the centered 9-row frame, plus the |x - med| > 3*MAD flag
    (~14% fire on this corpus at every SF — measured, non-vacuous).

    Scale: one keyed sort materializes the bounded 9-element frame per
    row; the per-row order statistics are O(frame log frame) on that
    constant-size array — linear overall, the same cost class as
    `win_rolling_median`. For large frames the scale path is the
    two-heap streaming median (`applyInPandasWithState` tier) or
    approx_percentile partials; the exact array form is the contract
    tier."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, 4)
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    fr = ev.select(
        "event_id",
        "user_id",
        cents.alias("x_cents"),
        F.collect_list(cents).over(w).alias("arr"),
    )
    m = fr.withColumn(
        "med_cents",
        F.expr("sort_array(arr)[CAST((size(arr) + 1) div 2 AS INT) - 1]"),
    )
    mad = (
        "sort_array(transform(arr, v -> abs(v - med_cents)))"
        "[CAST((size(arr) + 1) div 2 AS INT) - 1]"
    )
    return m.select(
        "event_id",
        "user_id",
        "x_cents",
        "med_cents",
        F.expr(mad).alias("mad_cents"),
        F.expr(f"(abs(x_cents - med_cents) > 3 * {mad})").alias("is_outlier"),
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS sum_cents_last_hour
    FROM (
      SELECT event_id, user_id, value,
             CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
      FROM events
    ) t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec ASC
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the count and exact cents
    sum of events in the trailing ONE HOUR (value-based frame bounds on
    the epoch-seconds ordering — not a row count, not a tumbling bucket,
    the genuinely different frame semantics SQL RANGE exists for: rows
    with EQUAL timestamps are all peers of the frame regardless of
    physical order, which makes the result deterministic under any
    partitioning without a tiebreak key).

    Scale: one hash partition by user + one sort per partition; the
    range frame evaluates incrementally (two moving pointers) in both
    engines, so cost is the sort, not the frame width; integer
    accumulation keeps the running sum exact under either incremental
    or re-scan evaluation (the `win_moving_agg` discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.to_unix_timestamp("ts").cast("bigint").alias("ts_sec"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_sec").asc())
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
        F.sum("cents").over(w).cast("bigint").alias("sum_cents_last_hour"),
    )
