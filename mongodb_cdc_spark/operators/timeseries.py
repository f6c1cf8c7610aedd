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
    starts at the user's min day), so value_filled is never null
    unless the source value column itself holds NULLs before the first
    non-null observation (ignorenulls carries across them).

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
        .select("user_id", "d", "value", F.lit(1).alias("obs"))
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
            # join-miss indicator, NOT value IS NULL — an observed day
            # whose value is NULL must still count as observed (matches
            # the oracle's `o.d IS NULL` test)
            F.when(F.col("obs").isNull(), F.lit(0))
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


# --------------------------------------------------------------------------
# ts_rolling_wau
# --------------------------------------------------------------------------


@query(
    "ts_rolling_wau",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    span AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM days),
    contrib AS (
        SELECT user_id,
               CAST(UNNEST(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS wd
        FROM days
    )
    SELECT CAST(c.wd AS VARCHAR) AS day,
           COUNT(DISTINCT c.user_id) AS wau,
           CAST((SELECT COUNT(DISTINCT x.user_id) FROM days x WHERE x.d = c.wd)
                AS BIGINT) AS dau
    FROM contrib c
    WHERE c.wd <= (SELECT mx FROM span)
    GROUP BY c.wd
    """,
)
def ts_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) and daily actives (DAU) per
    calendar day — the trailing-window COUNT DISTINCT that naive SQL
    writes as a self-join per day and that does NOT distribute as a
    window function (distinct aggregates are unsupported over frames).

    The scalable formulation inverts the window: each active (user, day)
    pair CONTRIBUTES to the 7 days it stays inside the trailing window
    (`explode(sequence(d, d+6))`), and WAU(day) is then a plain
    count-distinct per day. Shuffle volume is active-pairs x 7 — bounded
    by users x days, never by raw events (the dedup to active pairs
    happens first, one keyed shuffle). DAU rides the same contribution
    rows (offset = 0). At 100 TB the same shape yields any trailing
    window; for windows > ~30 days switch the contribution explode to
    interval endpoints + sweep (diff-of-prefix-sums over HLL sketches).
    Output clipped to observed days (no partial future windows)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    mx = days.agg(F.max("d").alias("mx"))
    contrib = days.select(
        "user_id",
        F.explode(F.sequence("d", F.date_add("d", 6))).alias("wd"),
        F.col("d").alias("src_d"),
    )
    wau = (
        contrib.crossJoin(F.broadcast(mx))
        .filter(F.col("wd") <= F.col("mx"))
        .groupBy("wd")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.countDistinct(
                F.when(F.col("src_d") == F.col("wd"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("dau"),
        )
    )
    return wau.select(F.col("wd").cast("string").alias("day"), "wau", "dau")


# --------------------------------------------------------------------------
# ts_anomaly_zscore
# --------------------------------------------------------------------------


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS s1,
               CAST(SUM(cnt * cnt) AS BIGINT) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT daily.event_type, CAST(d AS VARCHAR) AS day,
           CAST(cnt AS BIGINT) AS cnt, n_days, s1
    FROM daily JOIN stats ON daily.event_type = stats.event_type
    WHERE (cnt * n_days - s1) * (cnt * n_days - s1)
          > 4 * (n_days * s2 - s1 * s1)
    ORDER BY daily.event_type, day
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume anomaly flags: days where a type's count sits
    more than 2 standard deviations from that type's mean daily count.
    The z-score test runs ENTIRELY in integer arithmetic — |x - s1/n| >
    2*sqrt((n*s2 - s1^2)/n^2) is cross-multiplied into (x*n - s1)^2 >
    4*(n*s2 - s1^2), exact BIGINT on both engines (float means/sqrt are
    partial-aggregation-order-dependent and would flake the boundary).

    Scale: daily counts are one map-combinable aggregate over the fact;
    the per-type moment table is dimension-sized (types x 3 numbers) and
    broadcasts back onto daily counts — no window over the fact, no
    second fact shuffle. The same moments support any sigma threshold
    without recomputation. Overflow bound: n*s2 needs cnt^2*days <
    2^63 — holds to ~3e8 events/type/day over 10 years."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("cnt"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("cnt").cast("bigint").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("s2"),
    )
    dev = F.col("cnt") * F.col("n_days") - F.col("s1")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(
            dev * dev
            > 4 * (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1"))
        )
        .select(
            "event_type",
            F.col("d").cast("string").alias("day"),
            F.col("cnt").cast("bigint").alias("cnt"),
            "n_days",
            "s1",
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# win_pattern_triples
# --------------------------------------------------------------------------


@query(
    "win_pattern_triples",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               (epoch_ns(ts) // 1000000000) AS sec,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3,
               LEAD(epoch_ns(ts) // 1000000000, 2) OVER w AS sec3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_patterns,
           CAST(MIN(sec) AS BIGINT) AS first_match_sec
    FROM seq
    WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
      AND sec3 - sec <= 172800
    GROUP BY user_id
    """,
)
def win_pattern_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection (the MATCH_RECOGNIZE tier): count
    CONTIGUOUS view -> click -> purchase runs per user completing within
    48 hours (sized to the stream's ~11 h inter-event cadence) — every occurrence, not just the first (that first-touch
    variant is `agg_funnel_steps`; this is the strict-adjacency pattern
    engine built from LEAD chains).

    Mechanics: one window per user orders events once ((ts, event_id)
    total order) and LEAD projects the next two steps onto each row, so
    pattern evaluation is a stateless row predicate after a single sort
    — a k-step pattern costs k-1 LEADs on the SAME window, never extra
    shuffles or self-joins (the self-join formulation ships the fact k
    times). Time bound compares integer epoch seconds.

    Scale: one keyed shuffle + per-key sort; state is the k-row
    lookahead, O(1) per row. The streaming twin maps to
    applyInPandasWithState with a k-deep event buffer per key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.to_unix_timestamp("ts").cast("bigint")
    seq = ev.select(
        "user_id",
        "event_type",
        sec.alias("sec"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead(sec, 2).over(w).alias("sec3"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("e2") == "click")
            & (F.col("e3") == "purchase")
            & (F.col("sec3") - F.col("sec") <= 172800)
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_patterns"),
            F.min("sec").cast("bigint").alias("first_match_sec"),
        )
    )


# --------------------------------------------------------------------------
# ts_cumulative_users
# --------------------------------------------------------------------------


@query(
    "ts_cumulative_users",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
        GROUP BY user_id
    ),
    daily_new AS (
        SELECT d0 AS d, COUNT(*) AS new_users FROM firsts GROUP BY d0
    )
    SELECT CAST(d AS VARCHAR) AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily_new
    """,
)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User growth curve: per day, newly-seen users (first activity) and
    the running total of distinct users ever seen — the cumulative
    distinct count that would be O(n^2) as a naive per-day COUNT
    DISTINCT self-join, reduced to first-touch + prefix sum.

    Scale: first-touch is one user-keyed min-aggregate over the fact;
    daily_new collapses it to calendar-day cardinality (say 3650 rows
    for a decade). ONLY that tiny relation enters the running-total
    window, so the unpartitioned window frame — normally a scale smell —
    is bounded by days, not data (same justification as
    `maintenance_table_stats`). The first-touch table is the
    incrementally-maintainable dimension shared with
    `agg_retention_cohort`."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily_new = firsts.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("new_users")
    )
    w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        F.col("d").cast("string").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# --------------------------------------------------------------------------
# ts_wow_growth
# --------------------------------------------------------------------------


@query(
    "ts_wow_growth",
    oracle="""
    WITH weekly AS (
        SELECT CAST((epoch_ns(ts) // 1000000000) // 604800 AS BIGINT)
                 AS week_no,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM events
        GROUP BY 1
    )
    SELECT week_no, CAST(n_events AS BIGINT) AS n_events, value_cents,
           LAG(value_cents) OVER (ORDER BY week_no) AS prev_cents,
           CASE WHEN LAG(value_cents) OVER (ORDER BY week_no) > 0
                THEN ((value_cents - LAG(value_cents) OVER (ORDER BY week_no))
                      * 10000) // (LAG(value_cents) OVER (ORDER BY week_no))
                ELSE NULL END AS wow_growth_bp
    FROM weekly
    """,
)
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly event volume and cents-exact value
    totals with the WoW delta in integer basis points — the KPI-trend
    query. Weeks are epoch-second div 604800 (calendar-agnostic,
    identical in both engines, no week-start locale hazards); growth is
    integer cross-multiplication (delta x 10000 integer-div previous),
    never a float ratio. Negative deltas are safe: DuckDB's integer `//`
    TRUNCATES toward zero exactly like Spark's `div` (measured: week-4's
    -1743.59 bp lands at -1743 on both engines) — it is float `//` that
    floors in DuckDB; the CASE guards prev > 0.

    Scale: one map-combinable aggregate over the fact; the window runs
    over the weeks-sized relation only (bounded like
    `ts_cumulative_users`)."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.groupBy(
            F.expr("CAST(to_unix_timestamp(ts) AS BIGINT) div 604800")
            .cast("bigint")
            .alias("week_no")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
    )
    w = Window.orderBy("week_no")
    return (
        weekly.withColumn("prev_cents", F.lag("value_cents").over(w))
        .select(
            "week_no",
            F.col("n_events").cast("bigint").alias("n_events"),
            "value_cents",
            "prev_cents",
            F.expr(
                "CASE WHEN prev_cents > 0 THEN "
                "((value_cents - prev_cents) * 10000) div prev_cents "
                "ELSE CAST(NULL AS BIGINT) END"
            ).alias("wow_growth_bp"),
        )
    )


# --------------------------------------------------------------------------
# ts_downsample_m4
# --------------------------------------------------------------------------

_M4_BUCKETS = 16

_M4_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST((epoch_ns(ts) // 1000000000) // 86400 AS BIGINT) AS d,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
lims AS (
  SELECT event_type, MIN(d) AS dmin, MAX(d) AS dmax
  FROM daily GROUP BY 1
),
bucketed AS (
  SELECT daily.event_type, d, cents,
         ((d - dmin) * {_M4_BUCKETS}) // (dmax - dmin + 1) AS bkt
  FROM daily JOIN lims USING (event_type)
),
ranked AS (
  SELECT event_type, bkt, d, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                            ORDER BY d ASC) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                            ORDER BY d DESC) AS rn_last,
         ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                            ORDER BY cents ASC, d ASC) AS rn_min,
         ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                            ORDER BY cents DESC, d ASC) AS rn_max
  FROM bucketed
)
SELECT event_type, CAST(bkt AS BIGINT) AS bkt, kind, d, cents
FROM (
  SELECT event_type, bkt, 'first' AS kind, d, cents FROM ranked WHERE rn_first = 1
  UNION ALL
  SELECT event_type, bkt, 'last', d, cents FROM ranked WHERE rn_last = 1
  UNION ALL
  SELECT event_type, bkt, 'ymin', d, cents FROM ranked WHERE rn_min = 1
  UNION ALL
  SELECT event_type, bkt, 'ymax', d, cents FROM ranked WHERE rn_max = 1
)
"""


@query("ts_downsample_m4", oracle=_M4_ORACLE)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization-grade downsampling (Jugel et al., VLDB 2014):
    per series (event_type) split the time axis into 16 equal-width
    buckets and keep exactly the first, last, min-y and max-y point of
    each bucket — the four points that make a line-rendering of the
    downsample pixel-identical to the full series at bucket-per-pixel
    resolution. Integer discipline end-to-end: day index and bucket are
    integer divisions, y is cents, min/max points are selected by
    total orders with day tiebreaks (ROW_NUMBER-equivalent struct
    min/max), so both engines pick the identical points.

    Scale: one groupBy(type, day) pre-aggregate collapses the fact to
    series-length rows; bucket limits are a tiny per-series aggregate
    joined back (broadcast); the four extremes reduce per (type, bucket)
    in ONE hash aggregate over struct-ordered min/maxes — no windows
    over the fact, no sort of the raw series. M4 is the standard answer
    to "plot 100 TB of telemetry": the downsample is exact for
    rendering, and each pixel bucket is an independent aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST((to_unix_timestamp(ts)) div 86400 AS BIGINT)").alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    lims = daily.groupBy("event_type").agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    b = daily.join(F.broadcast(lims), "event_type").select(
        "event_type",
        "d",
        "cents",
        F.expr(f"((d - dmin) * {_M4_BUCKETS}) div (dmax - dmin + 1)").alias("bkt"),
    )
    # the four extreme points of each bucket in ONE aggregate: struct
    # min/max encode the same total orders as the oracle's ROW_NUMBERs
    agg = b.groupBy("event_type", "bkt").agg(
        F.min(F.struct(F.col("d"), F.col("cents"))).alias("p_first"),
        F.max(F.struct(F.col("d"), F.col("cents"))).alias("p_last"),
        F.min(F.struct(F.col("cents"), F.col("d"))).alias("p_ymin"),
        F.max(F.struct(F.col("cents"), (-F.col("d")).alias("negd"))).alias(
            "p_ymax"
        ),
    )
    kinds = F.array(
        F.struct(
            F.lit("first").alias("kind"),
            F.col("p_first.d").alias("d"),
            F.col("p_first.cents").alias("cents"),
        ),
        F.struct(
            F.lit("last").alias("kind"),
            F.col("p_last.d").alias("d"),
            F.col("p_last.cents").alias("cents"),
        ),
        F.struct(
            F.lit("ymin").alias("kind"),
            F.col("p_ymin.d").alias("d"),
            F.col("p_ymin.cents").alias("cents"),
        ),
        F.struct(
            F.lit("ymax").alias("kind"),
            (-F.col("p_ymax.negd")).alias("d"),
            F.col("p_ymax.cents").alias("cents"),
        ),
    )
    return agg.select(
        "event_type", F.col("bkt").cast("bigint").alias("bkt"),
        F.explode(kinds).alias("p")
    ).select(
        "event_type",
        "bkt",
        F.col("p.kind").alias("kind"),
        F.col("p.d").alias("d"),
        F.col("p.cents").alias("cents"),
    )


# --------------------------------------------------------------------------
# ts_changepoint_cusum — one-sided CUSUM level-shift detection per type
# --------------------------------------------------------------------------
# Page's CUSUM over each event type's DAILY-MEAN series: the standard
# upward level-shift detector a metrics pipeline runs on KPI series.
# The textbook recursion C_t = max(0, C_{t-1} + (x_t - target - k)) is
# NOT a prefix sum — but it has the exact closed form
#     C_t = S_t - min(0, min_{i<=t} S_i),   S_t = prefix-sum(x_i - target - k)
# so the whole detector is two prefix windows (cumsum + running min)
# over the daily aggregate: no recursion, no UDF, no iterative loop.
#
# Integer discipline: daily means are e2 fixed-point integer divisions;
# target and slack derive from exact integer moments of the daily-mean
# series (std via FLOOR(SQRT(double-of-exact-int)) — sqrt is correctly
# rounded, so the BIGINT matches cross-engine). Alarm threshold is the
# classic h = 4*sigma, slack k = sigma/2.
#
# Scale: the raw fact collapses to (type, day) rows in one map-side-
# combinable aggregate; every window after that runs on the bounded
# daily series (partitions = event types, rows = days — thousands, not
# billions). Per-type moments ride a broadcast join. This is the
# windows.py two-tier discipline: unbounded-input work is keyed
# aggregation; ordered-window work happens only on the collapsed series.

_CUSUM_STATS = (
    "COUNT(*) AS nd, SUM(x) AS sx, SUM(x * x) AS sxx"
)


@query(
    "ts_changepoint_cusum",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type, {_CUSUM_STATS} FROM daily GROUP BY event_type
    ),
    params AS (
      SELECT event_type,
             CAST(sx // nd AS BIGINT) AS tgt,
             CAST(FLOOR(SQRT(CAST(
               (nd * sxx - sx * sx) // (nd * nd) AS DOUBLE))) AS BIGINT)
               AS sigma
      FROM stats
    ),
    series AS (
      SELECT d.event_type, d.d, d.x, p.sigma,
             CAST(SUM(d.x - p.tgt - p.sigma // 2) OVER (
               PARTITION BY d.event_type ORDER BY d.d
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
      FROM daily d JOIN params p ON d.event_type = p.event_type
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, x AS daily_mean_e2,
           CAST(s - LEAST(0, MIN(s) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum_e2,
           (s - LEAST(0, MIN(s) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING)) > 4 * sigma) AS alarm
    FROM series
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type one-sided CUSUM over the daily-mean series (docstring
    block above): daily mean in e2 fixed point, the CUSUM statistic via
    the prefix-sum/running-min closed form, and the h = 4-sigma alarm
    flag. Day is emitted as its ISO string (the gapfill/streak tier's
    date-output convention)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))"
                " div COUNT(*) AS BIGINT)"
            ).alias("x")
        )
    )
    params = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("x").alias("sx"),
            F.expr("SUM(x * x)").alias("sxx"),
        )
        .select(
            "event_type",
            F.expr("CAST(sx div nd AS BIGINT)").alias("tgt"),
            F.expr(
                "CAST(FLOOR(SQRT(CAST((nd * sxx - sx * sx)"
                " div (nd * nd) AS DOUBLE))) AS BIGINT)"
            ).alias("sigma"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    series = (
        daily.join(F.broadcast(params), "event_type")
        .withColumn(
            "s",
            F.sum(
                F.col("x") - F.col("tgt") - F.expr("sigma div 2")
            ).over(w).cast("bigint"),
        )
        .withColumn("m", F.least(F.lit(0), F.min("s").over(w)))
    )
    return series.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        F.col("x").alias("daily_mean_e2"),
        F.expr("CAST(s - m AS BIGINT)").alias("cusum_e2"),
        F.expr("(s - m) > 4 * sigma").alias("alarm"),
    )


# --------------------------------------------------------------------------
# ts_seasonal_index
# --------------------------------------------------------------------------


@query(
    "ts_seasonal_index",
    oracle="""
    WITH base AS (
        SELECT event_type,
               ((epoch_ns(ts) // 1000000000) // 86400 + 4) % 7 AS dow,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    per_dow AS (
        SELECT event_type, dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(cents) AS s
        FROM base GROUP BY 1, 2
    ),
    overall AS (
        SELECT event_type,
               SUM(n) AS n_all, SUM(s) AS s_all
        FROM per_dow GROUP BY 1
    )
    SELECT p.event_type, CAST(p.dow AS BIGINT) AS dow, p.n,
           CAST(p.s * 100 // p.n AS BIGINT) AS dow_avg_e4,
           CAST(((p.s * 100 // p.n) * 10000)
                // (o.s_all * 100 // o.n_all) AS BIGINT)
             AS seasonal_index_bp
    FROM per_dow p JOIN overall o USING (event_type)
    """,
)
def ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per metric: for each (event_type, dow)
    cell, the average value relative to the event_type's overall average
    in basis points — the multiplicative seasonal profile behind every
    'is Monday always like this?' capacity/forecast adjustment (the
    seasonal-naive baseline of classical decomposition).

    Determinism: day-of-week is pure integer epoch math
    ((days_since_epoch + 4) % 7, Monday = 0) — never an engine-local
    DAYOFWEEK whose weekday numbering and session timezone differ across
    engines; values are exact cents; the index is one positive-integer
    division, identical on both sides.

    Scale: a 7-cell-per-type aggregate — fully map-side combinable,
    shuffle carries types x 7 x partitions rows regardless of event
    volume; the overall totals reuse the per-dow partials (no second
    scan). The index is a ratio of FIXED-POINT AVERAGES (e4 units),
    not of raw sums: averages are scale-free magnitudes, so the bp
    product never grows with row count — the first draft multiplied
    SUM(cents) * total_rows and overflowed BIGINT exactly where the
    100x rehearsal said it would (2e21 at 10 M events); ratios of
    bounded intermediates are the 100 TB-safe form."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.expr(
            "((CAST(to_unix_timestamp(ts) AS BIGINT) DIV 86400) + 4) % 7"
        ).alias("dow"),
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
    )
    per_dow = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    overall = per_dow.groupBy("event_type").agg(
        F.sum("n").alias("n_all"), F.sum("s").alias("s_all")
    )
    return per_dow.join(F.broadcast(overall), "event_type").select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "n",
        F.expr("CAST(s * 100 div n AS BIGINT)").alias("dow_avg_e4"),
        F.expr(
            "CAST(((s * 100 div n) * 10000)"
            " div (s_all * 100 div n_all) AS BIGINT)"
        ).alias("seasonal_index_bp"),
    )


# --------------------------------------------------------------------------
# ts_ewma_halflife
# --------------------------------------------------------------------------


@query(
    "ts_ewma_halflife",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents,
               list(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW
               ) AS arr
        FROM events
    )
    SELECT user_id, event_id, cents,
           CAST(
             list_sum(list_transform(arr, (x, i) -> x * (1 << (i - 1))))
             // ((1 << len(arr)) - 1)
           AS BIGINT) AS ewma_cents
    FROM seq
    """,
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (decay 1/2 per step) of each
    user's value stream, integer-exact: over the trailing 16-row frame,
    element j (oldest first, 0-based) carries weight 2^j, so
    ewma = SUM(cents_j << j) / (2^n - 1) — the alpha = 0.5 EWMA truncated
    at 16 taps (the dropped tail's total weight is < 2^-16 of the
    current sample, below cents resolution). Power-of-two weights turn
    the classic float-recursive EWMA into exact BIGINT shift-adds that
    hash identically across engines — the same smoothing every
    latency/QPS dashboard runs, restart-safe at any partitioning.

    Scale: one keyed window sort per user (the same shuffle any per-key
    smoothing needs); the frame is a bounded 16-element running buffer,
    so window state is O(1) per row and the whole pass is a single
    streaming frame scan — no self-join fan-out, no unbounded frame.
    Max frame sum < 16 * 2^15 * max_cents, far inside BIGINT."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-15, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        )
        .withColumn("arr", F.collect_list("cents").over(w))
        .select(
            "user_id",
            "event_id",
            "cents",
            F.expr(
                "CAST(aggregate(zip_with(arr, sequence(0, size(arr) - 1),"
                " (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                " div (shiftleft(CAST(1 AS BIGINT), size(arr)) - 1)"
                " AS BIGINT)"
            ).alias("ewma_cents"),
        )
    )


# --------------------------------------------------------------------------
# ts_interpolate_linear — interior-gap linear interpolation (vs LOCF)
# --------------------------------------------------------------------------
# `ts_gapfill_daily` carries the LAST observation across gaps (step
# function); this is the other resample every metrics warehouse ships —
# straight-line interpolation between the surrounding observations.
# Exactness: observations land as e2 fixed-point cents, the interpolated
# value is prev + round_half_up((next-prev)*(d-prev_d)/(next_d-prev_d))
# in pure sign-mirrored integer arithmetic — no float ever enters, so
# the fill is bit-identical across engines (LOCF could pass doubles
# through untouched; interpolation cannot, hence the fixed point).

_ILIN_DIV = (
    "CASE WHEN {num} >= 0 THEN (2 * ({num}) + {den}) {div} (2 * ({den})) "
    "ELSE -((2 * (-({num})) + {den}) {div} (2 * ({den}))) END"
)


def _ilin_interp(div: str, datediff: str) -> str:
    num = f"(next_v - prev_v) * ({datediff.format(a='d', b='prev_d')})"
    den = datediff.format(a="next_d", b="prev_d")
    half = _ILIN_DIV.format(num=num, den=den, div=div)
    return (
        f"CASE WHEN is_observed = 1 THEN obs_v "
        f"ELSE prev_v + ({half}) END"
    )


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(FLOOR(value * 100) AS BIGINT) AS v,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    last_obs AS (
        SELECT user_id, d, v FROM daily WHERE rn = 1
    ),
    span AS (
        SELECT user_id, MIN(d) AS mn, MAX(d) AS mx
        FROM last_obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
                 AS d
        FROM span
    ),
    fr AS (
      SELECT g.user_id, g.d,
             o.v AS obs_v,
             CAST(CASE WHEN o.d IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_observed,
             last_value(o.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(o.d IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
             first_value(o.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(o.d IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM grid g
      LEFT JOIN last_obs o ON o.user_id = g.user_id AND o.d = g.d
    )
    SELECT user_id, CAST(d AS VARCHAR) AS day, is_observed,
           CAST({_ilin_interp('//', "date_diff('day', {b}, {a})")}
                AS BIGINT) AS value_cents
    FROM fr
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with straight-line interpolation across interior
    gaps (docstring block above): per user, the dense day grid carries
    the observed e2 value on observed days and the exact-integer linear
    interpolation between the two surrounding observations otherwise.
    Grid edges are always observed (span runs min..max observation), so
    prev/next never dangle.

    Scale: identical shape to `ts_gapfill_daily` — one keyed daily
    reduce, per-key span explosion (bounded by calendar days), and
    running windows over the user partition (two frames: backward carry
    of (prev_v, prev_d), forward carry of (next_v, next_d) — linear
    scans, no self-join). The interpolation itself is a codegen
    projection."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        "ts",
        "event_id",
    )
    w_day = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_obs = (
        daily.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "d", "v")
    )
    grid = (
        last_obs.groupBy("user_id")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx")).alias("d"),
        )
    )
    wb = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        0, Window.unboundedFollowing
    )
    fr = grid.join(
        last_obs.withColumnRenamed("v", "obs_v").withColumn(
            "is_obs", F.lit(1)
        ),
        ["user_id", "d"],
        "left",
    )
    fr = fr.select(
        "user_id",
        "d",
        "obs_v",
        F.coalesce("is_obs", F.lit(0)).cast("bigint").alias("is_observed"),
        F.last("obs_v", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(
            F.when(F.col("is_obs") == 1, F.col("d")), ignorenulls=True
        )
        .over(wb)
        .alias("prev_d"),
        F.first("obs_v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(
            F.when(F.col("is_obs") == 1, F.col("d")), ignorenulls=True
        )
        .over(wf)
        .alias("next_d"),
    )
    interp = _ilin_interp("div", "datediff({a}, {b})")
    return fr.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        "is_observed",
        F.expr(f"CAST({interp} AS BIGINT)").alias("value_cents"),
    )


# --------------------------------------------------------------------------
# ts_autocorrelation — lag-k ACF over the daily revenue series
# --------------------------------------------------------------------------
# The seasonality diagnostic `ts_seasonal_index` assumes and `ts_ewma`
# smooths over: Pearson correlation between the daily series and its
# lag-k shift, at k = 1 (momentum) and k = 7 (weekly cycle). The daily
# reduce collapses the fact first (days-bounded table), pairs come from
# a LAG window over that small frame, and the correlation runs in the
# agg_corr_regression dialect: exact e2 fixed-point sums in wide
# integers, floats only in the final normalization — bit-identical on
# both engines.

_ACF_LAGS = (1, 7)


def _acf_corr(cast: str) -> str:
    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    num = f"CAST({c('n')} * {c('sxy')} - {c('sx')} * {c('sy')} AS DOUBLE)"
    dx = f"CAST({c('n')} * {c('sxx')} - {c('sx')} * {c('sx')} AS DOUBLE)"
    dy = f"CAST({c('n')} * {c('syy')} - {c('sy')} * {c('sy')} AS DOUBLE)"
    return f"({num} / SQRT({dx} * {dy}))"


def _acf_round4(expr: str) -> str:
    return (
        f"CASE WHEN ({expr}) >= 0 "
        f"THEN CAST(CAST(FLOOR(({expr}) * 10000 + 0.5) AS BIGINT) AS DOUBLE)"
        f" / 10000.0 "
        f"ELSE -(CAST(CAST(FLOOR(-(({expr})) * 10000 + 0.5) AS BIGINT)"
        f" AS BIGINT) / 10000.0) END"
    )


def _acf_oracle() -> str:
    arms = []
    for k in _ACF_LAGS:
        arms.append(f"""
    SELECT CAST({k} AS BIGINT) AS lag, CAST(cnt AS BIGINT) AS n_pairs,
           {_acf_round4(_acf_corr('HUGEINT'))} AS acf
    FROM (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             COUNT(*) AS cnt
      FROM (
        SELECT y, LAG(y, {k}) OVER (ORDER BY d ASC) AS x FROM daily
      ) WHERE x IS NOT NULL
    ) t""")
    union = "\n    UNION ALL\n".join(arms)
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    )
    {union}
    ORDER BY lag ASC
    """


@query("ts_autocorrelation", oracle=_acf_oracle())
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily revenue series
    (docstring block above): per lag the pair count and the 4-decimal
    Pearson ACF.

    Scale: ONE map-combinable daily aggregate collapses the fact to a
    days-bounded frame; the lag windows, moment sums, and normalization
    all run on that frame (the documented calendar-scale exception —
    the window partition is the whole daily series by definition). The
    moment vector per lag merges associatively, so the ACF refreshes
    incrementally per ingest day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = Window.orderBy(F.col("d").asc())
    arms = []
    for k in _ACF_LAGS:
        pairs = daily.select(
            "y", F.lag("y", k).over(w).alias("x")
        ).filter(F.col("x").isNotNull())
        m = pairs.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("COUNT(*)").cast("decimal(38,0)").alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("x")
            ).alias("sxx"),
            F.sum(
                F.col("y").cast("decimal(38,0)") * F.col("y")
            ).alias("syy"),
            F.sum(
                F.col("x").cast("decimal(38,0)") * F.col("y")
            ).alias("sxy"),
        )
        arms.append(
            m.select(
                F.lit(k).cast("bigint").alias("lag"),
                F.col("cnt").cast("bigint").alias("n_pairs"),
                F.expr(
                    _acf_round4(_acf_corr("DECIMAL(38,0)"))
                ).alias("acf"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("lag")


# --------------------------------------------------------------------------
# ts_theil_sen_trend — robust median-of-pairwise-slopes trend, exact
# --------------------------------------------------------------------------
# The Theil–Sen estimator (median of all pairwise slopes) is the robust
# alternative to OLS trend: a 29% outlier fraction cannot move it, which
# is why monitoring pipelines prefer it for noisy daily series. Exactness
# trick: a pairwise slope (v_j - v_i)/(d_j - d_i) is a rational whose
# floor is computable in pure BIGINT — but Spark `div` truncates toward
# zero while DuckDB `//` floors, so negative slopes would disagree by 1.
# Both engines agree on POSITIVE operands, so each slope is shifted by
# +C cents/day before the division and de-shifted after:
#   (v_diff + C*d_diff) div d_diff - C == floor(v_diff/d_diff)
# exactly, for any sign of v_diff, while both numerator and denominator
# stay positive. C = 1e12 is valid while |daily-total deltas| stay below
# 1e12 cents (3 orders above the 100x replica; a larger corpus widens to
# DECIMAL(38,0), same expression).

_TS_SHIFT = 1_000_000_000_000  # C cents/day


@query(
    "ts_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
        SELECT a.event_type,
               (b.v - a.v + {_TS_SHIFT} * (b.d - a.d)) // (b.d - a.d)
                 AS sshift,
               a.d AS da, b.d AS db
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
        SELECT event_type, sshift,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY sshift ASC, da ASC, db ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM pairs
    )
    SELECT event_type,
           CAST((cnt + 1) // 2 AS BIGINT) AS median_rank,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST(sshift - {_TS_SHIFT} AS BIGINT) AS slope_cents_per_day
    FROM ranked WHERE rn = (cnt + 1) // 2
    ORDER BY event_type
    """,
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Theil–Sen trend of the daily revenue series
    (docstring block above): the exact floored median pairwise slope in
    cents/day, with the pair count and median rank (lower median —
    deterministic for even counts).

    Scale: the fact collapses to the DAILY table first (one
    map-combinable aggregate, types x days rows), so the pair self-join
    is bounded by days^2 per type — a few thousand rows regardless of
    corpus size, the aggregate-before-join discipline. The pair stage
    never touches raw events; Spark plans the daily build as one
    shuffle and broadcasts the tiny daily frame for the self-join."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("v")
    ).select(
        "event_type",
        F.datediff("day", F.lit("2024-01-01")).cast("bigint").alias("d"),
        F.col("v").cast("bigint").alias("v"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.expr(
            f"(b.v - a.v + {_TS_SHIFT} * (b.d - a.d)) div (b.d - a.d)"
        ).alias("sshift"),
        F.col("a.d").alias("da"),
        F.col("b.d").alias("db"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.asc("sshift"), F.asc("da"), F.asc("db")
    )
    wc = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "sshift",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        ranked.filter(F.expr("rn = (cnt + 1) div 2"))
        .select(
            "event_type",
            F.expr("CAST((cnt + 1) div 2 AS BIGINT)").alias("median_rank"),
            F.col("cnt").cast("bigint").alias("n_pairs"),
            (F.col("sshift") - F.lit(_TS_SHIFT))
            .cast("bigint")
            .alias("slope_cents_per_day"),
        )
        .orderBy("event_type")
    )
