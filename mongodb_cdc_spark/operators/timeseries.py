"""Time-series resampling operators over the event stream: daily
gap-fill with forward-fill carry (the `LOCF` resample every metrics
pipeline needs) and gaps-and-islands streak detection.

The reference pipeline forwards raw change events with no time-series
layer at all (SURVEY.md §2A "explicitly absent" — js:248 ``watch`` just
tails the oplog); these operators are part of the warehouse surface a
user gains by switching.

Determinism: day bucketing is ``to_date`` on both engines (UTC session),
last-observation-per-day is a ROW_NUMBER with the full (ts DESC,
event_id DESC) tiebreak, carried values pass through UNCHANGED (no
arithmetic on doubles -> bit-identical hashes), and streak arithmetic is
pure integer day-epoch math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query

# --------------------------------------------------------------------------
# ts_gapfill_daily
# --------------------------------------------------------------------------


@query(
    "ts_gapfill_daily",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    last_obs AS (
        SELECT user_id, d, value FROM daily WHERE rn = 1
    ),
    span AS (
        SELECT user_id, MIN(d) AS mn, MAX(d) AS mx
        FROM last_obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM span
    )
    SELECT g.user_id,
           CAST(g.d AS VARCHAR) AS day,
           last_value(o.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CAST(CASE WHEN o.d IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_observed
    FROM grid g
    LEFT JOIN last_obs o ON o.user_id = g.user_id AND o.d = g.d
    """,
)
def ts_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with last-observation-carried-forward: for each
    user, a dense day grid from first to last activity, carrying the
    day's LAST observed `value` across gap days (plus an observed flag).

    Mechanics: (1) last-per-(user, day) via ROW_NUMBER with the full
    (ts, event_id) tiebreak — never `last()` on an unordered aggregate;
    (2) the grid is `sequence(min_day, max_day)` exploded PER KEY — the
    grid never materializes globally and adds no shuffle (it explodes
    out of the span aggregate already partitioned by user); (3) the
    carry is `last(value, ignorenulls) OVER (PARTITION BY user ORDER BY
    day ROWS UNBOUNDED PRECEDING)` — a running window per key, linear
    scan, no self-join. The grid's first row is always observed (it
    starts at the user's min day), so value_filled is never null.

    Scale: every stage is keyed by user_id — one shuffle for the daily
    reduce, grid + carry reuse that partitioning; span explosion is
    bounded by calendar days per key (a retention-window cap bounds it
    for immortal keys). Carried doubles are never touched by arithmetic,
    so the fill is exact."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.to_date("ts").alias("d"), "value", "ts", "event_id"
    )
    w_day = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_obs = (
        daily.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "d", "value")
    )
    grid = (
        last_obs.groupBy("user_id")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx")).alias("d"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_obs, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.col("d").cast("string").alias("day"),
            F.last("value", ignorenulls=True).over(w_fill).alias("value_filled"),
            F.when(F.col("value").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("bigint")
            .alias("is_observed"),
        )
    )


# --------------------------------------------------------------------------
# win_streak_days
# --------------------------------------------------------------------------


@query(
    "win_streak_days",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
        SELECT user_id,
               CAST(d - DATE '2024-01-01' AS BIGINT)
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                 AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS max_streak_days,
           COUNT(*) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks
    GROUP BY user_id
    """,
)
def win_streak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE active
    days, the number of distinct runs, and total active days — the
    classic `date - ROW_NUMBER()` island key, where consecutive days
    share a constant (day_epoch - rank) group.

    Scale: distinct (user, day) first (dedup shuffle bounded by active
    pairs, not events), then one ROW_NUMBER window per user (keyed
    partitioning reused from the dedup), then two keyed aggregates that
    both combine map-side. No joins, all integer arithmetic — the anchor
    date only recenters the epoch and cancels in the subtraction."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        (
            F.datediff("d", F.lit("2024-01-01")).cast("bigint")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("max_streak_days"),
        F.count("*").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )
