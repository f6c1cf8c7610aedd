"""Statistical-profile operators: histograms, exact-integer regression /
correlation, retention cohorts, table-stats collection, and the CDC
op-ratio guard.

The reference's analytics stop at per-batch insert/update/error counters
(js:155, js:166-184) and a health threshold (js:557 — lag > 300 s =>
unhealthy). This module generalizes both: the counters become grouped
statistical profiles (histogram / moments / regression), and the health
threshold becomes a data-driven anomaly guard over the same change feed
(`cdc_op_ratio_guard`). Everything follows the registry's exact-integer
discipline: per-row fixed-point ints, exact BIGINT/DECIMAL(38,0) sums,
explicit positive-only integer rounding — bit-identical on both engines.

Scale notes per operator are in the docstrings; the common theme is that
every aggregate here is map-side-combinable (partial_sum/partial_count
before one shuffle) and output cardinality is bounded by group-key
cardinality (bins, cohorts, days, columns), never input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import sum2, sum2_sql
from mongodb_cdc_spark.registry import query

# --------------------------------------------------------------------------
# agg_histogram_bins
# --------------------------------------------------------------------------

_BIN_W = 5000  # l_extendedprice bin width; ~20 bins over the TPC-H range


@query(
    "agg_histogram_bins",
    oracle=f"""
    SELECT CAST(FLOOR(l_extendedprice / {_BIN_W}) AS BIGINT) AS bin,
           CAST(FLOOR(l_extendedprice / {_BIN_W}) AS BIGINT) * {_BIN_W} AS bin_lo,
           COUNT(*) AS n,
           {sum2_sql("l_extendedprice", "sum_price")[1]}
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``l_extendedprice`` (the engine's
    equi-width profile primitive, feeding skew diagnostics and bin-packed
    sampling). The bin id is ``FLOOR(x / w)`` — one IEEE division plus an
    exact floor, bit-identical across engines, so the whole histogram is
    an exact oracle, not a sketch.

    Scale: a single hash aggregate on a derived integer key with map-side
    partial aggregation — the shuffle carries (bins x partitions) rows
    regardless of input size; output is bounded by the value range, not
    row count. This is the profile pass you run before choosing join
    strategies at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.expr(f"CAST(FLOOR(l_extendedprice / {_BIN_W}) AS BIGINT)")
    return (
        li.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), sum2("l_extendedprice", "sum_price"))
        .select(
            "bin",
            (F.col("bin") * _BIN_W).alias("bin_lo"),
            "n",
            "sum_price",
        )
    )


# --------------------------------------------------------------------------
# agg_corr_regression
# --------------------------------------------------------------------------

# Per-row fixed-point ints (scale 100): one IEEE multiply + exact floor.
_XI = "CAST(FLOOR(l_quantity * 100) AS BIGINT)"
_YI = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"

# Exact sums in DECIMAL(38,0): sum(yi*yi) overflows BIGINT near sf1
# (yi ~ 1e7, yi^2 ~ 1e14, 6M rows ~ 6e20 > 2^63), so the accumulator is
# 38-digit decimal on BOTH engines (DuckDB uses HUGEINT-backed decimals).
_SUMS = {
    "n": "COUNT(*)",
    "sx": f"SUM(CAST({_XI} AS DECIMAL(38,0)))",
    "sy": f"SUM(CAST({_YI} AS DECIMAL(38,0)))",
    "sxy": f"SUM(CAST({_XI} * {_YI} AS DECIMAL(38,0)))",
    "sxx": f"SUM(CAST({_XI} * {_XI} AS DECIMAL(38,0)))",
    "syy": f"SUM(CAST({_YI} * {_YI} AS DECIMAL(38,0)))",
}

# Moment combinations, still exact integers (values < 1e26 << 1e38). The
# arithmetic type is dialect-split: Spark multiplies in DECIMAL(38,0)
# (capped-precision product, exact while the value fits 38 digits);
# DuckDB would ERROR on a 38x38-width decimal product, so its side casts
# to HUGEINT (exact int128) first. Same integers either way.


def _moments(cast: str) -> tuple[str, str, str]:
    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    num = f"({c('n')} * {c('sxy')} - {c('sx')} * {c('sy')})"
    denx = f"({c('n')} * {c('sxx')} - {c('sx')} * {c('sx')})"
    deny = f"({c('n')} * {c('syy')} - {c('sy')} * {c('sy')})"
    return num, denx, deny


# slope = cov/var in original units (the x100 scales cancel); corr is
# dimensionless. Division happens in DOUBLE on exactly-computed integer
# moments: int->double conversion is IEEE round-to-nearest in both
# engines, and the final values are floor-rounded to 4 decimals with the
# positive-only pattern (corr in [-1,1] scaled via sign-mirrored floor).


def _slope_corr(cast: str) -> tuple[str, str]:
    num, denx, deny = _moments(cast)
    slope = f"CAST({num} AS DOUBLE) / CAST({denx} AS DOUBLE)"
    corr = (
        f"CAST({num} AS DOUBLE) / "
        f"SQRT(CAST({denx} AS DOUBLE) * CAST({deny} AS DOUBLE))"
    )
    return slope, corr


_SLOPE, _CORR = _slope_corr("DECIMAL(38,0)")
_SLOPE_D, _CORR_D = _slope_corr("HUGEINT")


def _round4(expr: str) -> str:
    """Sign-mirrored half-up rounding to 4 decimals, exact-integer form."""
    return (
        f"CASE WHEN ({expr}) >= 0 "
        f"THEN CAST(CAST(FLOOR(({expr}) * 10000 + 0.5) AS BIGINT) AS DOUBLE) / 10000.0 "
        f"ELSE -(CAST(CAST(FLOOR(-(({expr})) * 10000 + 0.5) AS BIGINT) AS DOUBLE) / 10000.0) END"
    )


_CORR_INNER = ", ".join(f"{v} AS {k}" for k, v in _SUMS.items())


@query(
    "agg_corr_regression",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag, {_CORR_INNER}
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {_round4(_SLOPE_D)} AS slope_price_per_qty,
           {_round4(_CORR_D)} AS corr_qty_price
    FROM m
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped linear regression + Pearson correlation of
    (l_quantity, l_extendedprice) per return flag — the `regr_slope` /
    `corr` surface, but deterministic: builtin corr sums doubles in
    partial-aggregation order (run-to-run nondeterministic at scale), so
    this derives all five moments as exact fixed-point DECIMAL(38,0)
    sums and only enters floating point for the final two divisions on
    already-exact integers.

    Scale: one map-side-combinable aggregate (five sums + count), one
    shuffle carrying 6 numbers per (flag, partition); moments merge
    associatively, so the same shape works as a streaming/incremental
    profile. The DECIMAL(38,0) accumulator holds to ~sf10000."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        *[F.expr(v).alias(k) for k, v in _SUMS.items()]
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr(_round4(_SLOPE)).alias("slope_price_per_qty"),
        F.expr(_round4(_CORR)).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# agg_retention_cohort
# --------------------------------------------------------------------------


@query(
    "agg_retention_cohort",
    oracle="""
    WITH days AS (
      SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    coh AS (
      SELECT user_id, MIN(d) AS cohort_d FROM days GROUP BY user_id
    )
    SELECT CAST(c.cohort_d AS VARCHAR) AS cohort_day,
           CAST(x.d - c.cohort_d AS BIGINT) AS offset_days,
           COUNT(DISTINCT x.user_id) AS active_users
    FROM days x JOIN coh c ON x.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, then
    distinct active users per (cohort, day-offset) — the standard
    engagement triangle over the event stream.

    Scale: the first-touch table is a keyed aggregate on user_id (one
    shuffle); the activity join is keyed on the same user_id, so with the
    aggregate's partitioning reused there is no extra exchange on the big
    side; the final count-distinct dedups on (cohort, offset, user) —
    bounded by active (user, day) pairs, not events. At 100 TB the
    first-touch table is the incrementally-maintained dimension every
    retention query shares (it never changes for old users)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d"))
    coh = days.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        days.join(coh, "user_id")
        .groupBy(
            F.col("cohort_d").cast("string").alias("cohort_day"),
            F.datediff("d", "cohort_d").cast("bigint").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --------------------------------------------------------------------------
# maintenance_table_stats
# --------------------------------------------------------------------------

_STATS_COLS = (
    # (name, ndv_expr, null_expr, int_min, int_max) — min/max only where an
    # exact cross-engine integer form exists (BIGINT keys; epoch-floored
    # timestamps). Double/string min-max are format-unstable across
    # engines and stay out of the hashed surface.
    ("o_orderkey", "o_orderkey", "o_orderkey", True),
    ("o_custkey", "o_custkey", "o_custkey", True),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus", False),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority", False),
)


def _stats_select_sql(epoch: str) -> str:
    rows = []
    for name, ndv, nul, is_int in _STATS_COLS:
        mn = f"CAST(MIN({name}) AS BIGINT)" if is_int else "CAST(NULL AS BIGINT)"
        mx = f"CAST(MAX({name}) AS BIGINT)" if is_int else "CAST(NULL AS BIGINT)"
        rows.append(
            f"SELECT '{name}' AS col_name, COUNT(DISTINCT {ndv}) AS ndv, "
            f"COUNT(*) - COUNT({nul}) AS n_null, {mn} AS min_i, {mx} AS max_i "
            f"FROM orders"
        )
    rows.append(
        "SELECT 'o_orderdate' AS col_name, COUNT(DISTINCT o_orderdate) AS ndv, "
        "COUNT(*) - COUNT(o_orderdate) AS n_null, "
        f"MIN({epoch}) AS min_i, MAX({epoch}) AS max_i FROM orders"
    )
    return " UNION ALL ".join(rows)


@query(
    "maintenance_table_stats",
    oracle=_stats_select_sql("(epoch_ns(o_orderdate) // 1000000000)"),
)
def maintenance_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for `orders`: per-column exact NDV,
    null count, and integer min/max (epoch seconds for the timestamp) —
    the inputs a cost-based optimizer and a data-layout service (z-order,
    compaction) both read.

    Scale: each column's stats are one map-side-combinable aggregate over
    a single-column projection (column pruning means each branch reads
    only its own parquet column; min/max often answer from footer stats).
    Exact NDV is the oracle-checkable tier here; the 100 TB default is
    `approx_count_distinct` partials maintained incrementally per
    ingested file — same merge shape as the HLL operator
    (`agg_hll_partial_merge`)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_stats_v")
    sql = _stats_select_sql(
        "CAST(to_unix_timestamp(o_orderdate) AS BIGINT)"
    ).replace("FROM orders", "FROM orders_stats_v")
    return spark.sql(sql)


# --------------------------------------------------------------------------
# cdc_op_ratio_guard
# --------------------------------------------------------------------------

_GUARD_PPM = 150_000  # flag any day whose error share exceeds 15%


@query(
    "cdc_op_ratio_guard",
    oracle=f"""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_error,
           CAST((SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1000000)
             // COUNT(*) AS BIGINT) AS error_ppm,
           (SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1000000)
             // COUNT(*) > {_GUARD_PPM} AS breached
    FROM events
    GROUP BY 1
    """,
)
def cdc_op_ratio_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality circuit breaker over the change feed: per-day event
    totals, error counts, and integer-ppm error share, flagged when the
    share breaches a threshold — the batch form of the reference's health
    verdict (js:557 lag > 300 s => unhealthy; R12's error counters feed
    it). A replication pipeline at 100 TB gates downstream MERGEs on
    exactly this signal before applying a suspicious batch.

    Scale: one conditional aggregate per day bucket, map-side combined;
    the ppm math is integer cross-multiply (no division until the final
    bounded output). The streaming twin attaches the same expressions to
    `df.observe()` on the live feed."""
    ev = load_table(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        ev.groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.cast("bigint").alias("n_error"),
        )
        .select(
            "day",
            "n_events",
            "n_error",
            F.expr("(n_error * 1000000) div n_events").alias("error_ppm"),
            (
                F.expr("(n_error * 1000000) div n_events") > _GUARD_PPM
            ).alias("breached"),
        )
    )


# --------------------------------------------------------------------------
# agg_segment_overlap
# --------------------------------------------------------------------------


@query(
    "agg_segment_overlap",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS seg_a, b.event_type AS seg_b, COUNT(*) AS n_users
    FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_type <= b.event_type
    GROUP BY 1, 2
    """,
)
def agg_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: distinct users in every (segment, segment)
    pair, where a segment is "users who did event type X" — the upper
    triangle (including the diagonal = segment sizes) of the co-occurrence
    matrix every campaign/cohort tool draws.

    Scale: the input is first reduced to DISTINCT (user, type) pairs —
    bounded by users x |types|, not events; the self-join is keyed on
    user_id with per-user fanout <= |types|^2 (here 25), so the shuffle
    carries the pair table twice and the output is |types|^2 rows total.
    At 100 TB the same shape holds for thousands of segments by bounding
    per-user segment lists (collect_set + size cap) before the pairing."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select("user_id", "event_type").distinct()
    a = p.select("user_id", F.col("event_type").alias("seg_a"))
    b = p.select("user_id", F.col("event_type").alias("seg_b"))
    return (
        a.join(b, ["user_id"])
        .filter(F.col("seg_a") <= F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --------------------------------------------------------------------------
# agg_percentile_cont
# --------------------------------------------------------------------------

_PCT_IN = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"


@query(
    "agg_percentile_cont",
    oracle=f"""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont({_PCT_IN}, [0.25, 0.5, 0.75]) AS p
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           p[1] AS p25_cents, p[2] AS p50_cents, p[3] AS p75_cents
    FROM q
    """,
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of the price distribution per return
    flag. Exactness without rounding: the input is fixed-pointed to
    integer cents first, and the quartile fractions (.25/.5/.75) are
    exact binary fractions — linear interpolation between two integers at
    those fractions is a handful of exact IEEE ops, identical in both
    engines (verified: bit-equal at sf0.01), so the interpolated DOUBLE
    itself is hashable. Both engines implement the same type-7
    (R default / NIST) quantile definition.

    Scale: exact percentiles sort within each group — the honest
    contract when the answer must be exact (reconciliation thresholds,
    SLA cutoffs). The streaming/100 TB default for *monitoring* remains
    `agg_approx_quantiles` (KLL-style mergeable sketch, no sort); this
    operator is its exact companion, and the two bound each other in
    tests/test_properties.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"percentile({_PCT_IN}, array(0.25D, 0.5D, 0.75D))"
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.element_at("p", 1).alias("p25_cents"),
            F.element_at("p", 2).alias("p50_cents"),
            F.element_at("p", 3).alias("p75_cents"),
        )
    )


# --------------------------------------------------------------------------
# ext_winsorize
# --------------------------------------------------------------------------

_WINS_Q = "[0.0625, 0.9375]"  # exact binary fractions: 1/16, 15/16


@query(
    "ext_winsorize",
    oracle=f"""
    WITH th AS (
      SELECT l_returnflag,
             quantile_cont({_PCT_IN}, {_WINS_Q}) AS p
      FROM lineitem GROUP BY l_returnflag
    ),
    b AS (
      SELECT l_returnflag,
             CAST(FLOOR(p[1]) AS BIGINT) AS lo_cents,
             CAST(FLOOR(p[2]) AS BIGINT) AS hi_cents
      FROM th
    )
    SELECT li.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM({_PCT_IN}) AS BIGINT) AS raw_sum_cents,
           CAST(SUM(LEAST(GREATEST({_PCT_IN}, lo_cents), hi_cents))
                AS BIGINT) AS winsorized_sum_cents,
           CAST(SUM(CASE WHEN {_PCT_IN} < lo_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN {_PCT_IN} > hi_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           lo_cents, hi_cents
    FROM lineitem li JOIN b ON li.l_returnflag = b.l_returnflag
    GROUP BY li.l_returnflag, lo_cents, hi_cents
    """,
)
def ext_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) price aggregates per return flag:
    values below the 1/16 quantile or above the 15/16 quantile are
    clamped to those bounds before summing — the robust-statistics
    companion to the raw sums, reporting both plus clamp counts.

    Determinism of the bounds: the quantile fractions are EXACT binary
    fractions (1/16, 15/16), so the type-7 interpolation position
    q*(n-1) is one exact IEEE multiply on both engines and the
    interpolated value is bit-identical (same argument as
    `agg_percentile_cont`, which pins .25/.5/.75); FLOOR then moves the
    clamp bounds into exact integer cents. 5%/95% winsorizing would put
    a non-representable 0.05 into the position arithmetic — the dyadic
    neighbors 6.25%/93.75% buy bit-exactness for free.

    Scale: one sort-bounded exact-quantile aggregate per group (the
    honest exact contract, same as agg_percentile_cont; swap in
    approx_percentile partials for monitoring-grade clamps), then the
    flag-keyed threshold table broadcasts back onto the fact for a
    single map-combinable clamped aggregate — two fact passes total, no
    window, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    th = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"percentile({_PCT_IN}, array(0.0625D, 0.9375D))"
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.floor(F.element_at("p", 1)).cast("bigint").alias("lo_cents"),
            F.floor(F.element_at("p", 2)).cast("bigint").alias("hi_cents"),
        )
    )
    cents = F.expr(_PCT_IN)
    clamped = F.least(F.greatest(cents, F.col("lo_cents")), F.col("hi_cents"))
    return (
        li.join(F.broadcast(th), "l_returnflag")
        .groupBy("l_returnflag", "lo_cents", "hi_cents")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).cast("bigint").alias("raw_sum_cents"),
            F.sum(clamped).cast("bigint").alias("winsorized_sum_cents"),
            F.sum(F.when(cents < F.col("lo_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_low"),
            F.sum(F.when(cents > F.col("hi_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_high"),
        )
        .select(
            "l_returnflag", "n", "raw_sum_cents", "winsorized_sum_cents",
            "n_clamped_low", "n_clamped_high", "lo_cents", "hi_cents",
        )
    )


# --------------------------------------------------------------------------
# win_ratio_to_report
# --------------------------------------------------------------------------


@query(
    "win_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT r_name, n_name,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
             AS region_cents,
           (rev_cents * 10000)
             // CAST(SUM(rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
             AS share_bp
    FROM nat
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    revenue in integer basis points — the percent-of-total window every
    BI layer ships (`SUM() OVER (PARTITION BY group)` as denominator).

    Scale: the fact collapses to the (region, nation) aggregate FIRST —
    one keyed map-combinable shuffle — and the window runs over that
    25-row dimension-bounded relation, never the fact (the anti-pattern
    is windowing the raw rows to avoid the pre-aggregate). Share is an
    integer cross-multiplication with truncating division on positive
    operands; cents sums are exact BIGINTs on both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("region_cents"),
        F.expr(
            "(rev_cents * 10000) div CAST(SUM(rev_cents) "
            "OVER (PARTITION BY r_name) AS BIGINT)"
        ).alias("share_bp"),
    )


# --------------------------------------------------------------------------
# agg_markov_transitions
# --------------------------------------------------------------------------


@query(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    t AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           (n * 10000) // CAST(SUM(n) OVER (PARTITION BY from_type)
                               AS BIGINT) AS p_bp
    FROM t
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov chain: the event-type transition matrix with
    row-normalized probabilities in integer basis points — P(next |
    current) estimated from every within-user consecutive pair, the
    input to journey simulation, removal-effect attribution, and churn
    path analysis.

    Scale: one keyed LEAD (same sort every sessionization op shares),
    one map-combinable (from, to) count — the matrix is |types|² rows,
    so normalization windows run over a dimension-sized relation.
    Transition counts are exact; probabilities are integer
    cross-multiplication, never float division of float sums."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "(n * 10000) div CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)"
        ).alias("p_bp"),
    )


# --------------------------------------------------------------------------
# agg_gini_concentration
# --------------------------------------------------------------------------


@query(
    "agg_gini_concentration",
    oracle="""
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n ASC, source ASC) AS i,
             CAST((SELECT COUNT(*) FROM src) AS BIGINT) AS k,
             CAST((SELECT SUM(n) FROM src) AS BIGINT) AS total
      FROM src
    )
    SELECT k AS n_sources, total AS n_docs,
           CAST(SUM((2 * i - k - 1) * n) AS BIGINT) * 10000
             / (k * total) AS gini_bp_num_div_applied,
           (CAST(SUM((2 * i - k - 1) * n) AS BIGINT) * 10000)
             // (k * total) AS gini_bp
    FROM ranked
    GROUP BY k, total
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration Gini index in integer basis points — the
    corpus-governance number that says whether a dataset is dominated by
    a few sources (Gini→1) or balanced (→0), from the standard
    rank-weighted form G = Σ(2i−k−1)·nᵢ / (k·Σn) over sources sorted
    ascending. Everything integer: counts exact, the rank total-ordered
    by (count, source), and the final ratio a truncating division —
    except one deliberately-DOUBLE echo column proving the integer and
    float forms agree to hashing (the numerator/denominator are exact
    integers, so the IEEE division is identical in both engines).

    Scale: the per-source count is one map-combinable aggregate; the
    rank window runs over the SOURCES relation (dimension-sized). The
    same shape scores language or domain balance by swapping the key."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").asc(), F.col("source").asc())
    ranked = src.select(
        "n",
        F.row_number().over(w).cast("bigint").alias("i"),
    ).crossJoin(
        src.agg(
            F.count("*").cast("bigint").alias("k"),
            F.sum("n").cast("bigint").alias("total"),
        )
    )
    return ranked.groupBy("k", "total").agg(
        F.col("k").alias("n_sources"),
        F.col("total").alias("n_docs"),
        (
            F.sum((2 * F.col("i") - F.col("k") - 1) * F.col("n")).cast("bigint")
            * 10000
            / (F.col("k") * F.col("total"))
        ).alias("gini_bp_num_div_applied"),
        F.expr(
            "(CAST(SUM((2 * i - k - 1) * n) AS BIGINT) * 10000) "
            "div (k * total)"
        ).alias("gini_bp"),
    ).select(
        "n_sources", "n_docs", "gini_bp_num_div_applied", "gini_bp"
    )


# --------------------------------------------------------------------------
# agg_funnel_time_to_convert
# --------------------------------------------------------------------------


@query(
    "agg_funnel_time_to_convert",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(epoch_ns(ts) // 1000000000) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(epoch_ns(ts) // 1000000000) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE event_type = 'click' AND (epoch_ns(ts) // 1000000000) > t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(epoch_ns(ts) // 1000000000) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE event_type = 'purchase' AND (epoch_ns(ts) // 1000000000) > t2
      GROUP BY e.user_id
    ),
    conv AS (
      SELECT s1.user_id, t1, t2, t3
      FROM s1 JOIN s2 ON s1.user_id = s2.user_id
              JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           quantile_cont(t2 - t1, 0.5) AS med_view_to_click_s,
           quantile_cont(t3 - t2, 0.5) AS med_click_to_purchase_s,
           quantile_cont(t3 - t1, 0.5) AS med_total_s
    FROM conv
    """,
)
def agg_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel velocity: the exact median seconds between funnel steps
    (first view -> first later click -> first later purchase) across
    fully-converting users — the time-to-convert companion of
    `agg_funnel_steps`' conversion COUNTS (how many convert vs how fast
    they move are different product questions).

    Determinism: step times are integer epoch seconds via chained
    min-aggregates (the same decorrelated shape as the funnel), and the
    medians are type-7 continuous quantiles over exact integers —
    identical both engines (even counts average two ints: .0/.5
    exact). Scale: three user-keyed min-aggregates sharing one
    partitioning, then ONE exact median over the converted-users
    relation (population-bounded, not event-bounded)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("sec") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("sec") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    conv = s1.join(s2, "user_id").join(s3, "user_id")
    return conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.expr("percentile(t2 - t1, 0.5D)").alias("med_view_to_click_s"),
        F.expr("percentile(t3 - t2, 0.5D)").alias("med_click_to_purchase_s"),
        F.expr("percentile(t3 - t1, 0.5D)").alias("med_total_s"),
    )


# --------------------------------------------------------------------------
# stat_ab_ttest — Welch two-sample t-test per event-type arm vs control
# --------------------------------------------------------------------------
# Experimentation analytics: each event_type is an experiment arm whose
# per-event `value` is compared against the 'view' control arm with a
# Welch (unequal-variance) two-sample t statistic. Built on the
# agg_corr_regression discipline: per-row fixed-point ints (scale 100),
# exact DECIMAL(38,0)/HUGEINT sums, floating point entered ONLY for the
# final divisions/sqrt on already-exact integers — identical expression
# trees in both engines, so the t statistic is bit-deterministic (builtin
# stddev/avg would sum doubles in partial-agg order and differ run to
# run at scale).

_AB_CONTROL = "view"
_AB_XI = "CAST(FLOOR(value * 100) AS BIGINT)"
_AB_SUMS = {
    "n": "COUNT(*)",
    "s": f"SUM(CAST({_AB_XI} AS DECIMAL(38,0)))",
    "ss": f"SUM(CAST({_AB_XI} * {_AB_XI} AS DECIMAL(38,0)))",
}


def _welch_t(cast: str, a: tuple[str, str, str], b: tuple[str, str, str]) -> str:
    """Welch t on exact integer moments; `cast` is the wide integer type
    (Spark DECIMAL(38,0) / DuckDB HUGEINT — same integers either way)."""

    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    def mean(n: str, s: str) -> str:
        return f"(CAST({c(s)} AS DOUBLE) / CAST({n} AS DOUBLE))"

    def var(n: str, s: str, ss: str) -> str:  # sample variance, x10000 units
        return (
            f"(CAST({c(n)} * {c(ss)} - {c(s)} * {c(s)} AS DOUBLE)"
            f" / CAST({c(n)} * ({c(n)} - 1) AS DOUBLE))"
        )

    (na, sa, ssa), (nb, sb, ssb) = a, b
    return (
        f"(({mean(na, sa)}) - ({mean(nb, sb)})) / "
        f"SQRT({var(na, sa, ssa)} / CAST({na} AS DOUBLE)"
        f" + {var(nb, sb, ssb)} / CAST({nb} AS DOUBLE))"
    )


_AB_T = _welch_t("DECIMAL(38,0)", ("n", "s", "ss"), ("cn", "cs", "css"))
_AB_T_D = _welch_t("HUGEINT", ("a.n", "a.s", "a.ss"), ("c.n", "c.s", "c.ss"))
_AB_MEAN = "(CAST(CAST(s AS DECIMAL(38,0)) AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0"
_AB_MEAN_D = "(CAST(CAST(a.s AS HUGEINT) AS DOUBLE) / CAST(a.n AS DOUBLE)) / 100.0"
_AB_INNER = ", ".join(f"{v} AS {k}" for k, v in _AB_SUMS.items())


@query(
    "stat_ab_ttest",
    oracle=f"""
    WITH m AS (
      SELECT event_type, {_AB_INNER}
      FROM events GROUP BY event_type
    )
    SELECT a.event_type, a.n,
           {_round4(_AB_MEAN_D)} AS mean_value,
           {_round4(_AB_T_D)} AS t_vs_control,
           (ABS({_round4(_AB_T_D)}) > 1.96) AS significant_95
    FROM m a, (SELECT * FROM m WHERE event_type = '{_AB_CONTROL}') c
    WHERE a.event_type <> '{_AB_CONTROL}'
    """,
)
def stat_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test of every event-type arm against the
    'view' control arm (docstring block above): per-arm n, mean
    value, the t statistic (4-decimal sign-mirrored rounding), and the
    |t| > 1.96 two-sided 95% flag.

    Scale: one map-side-combinable aggregate over events (3 numbers +
    count per arm, exactly the corr_regression shuffle shape); the
    control row rides a broadcast single-row frame. Arms x 4 output
    rows, input-size-independent after the first aggregate. Moments
    merge associatively — the same shape serves a sequential-test /
    always-valid monitoring loop over the change feed."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        *[F.expr(v).alias(k) for k, v in _AB_SUMS.items()]
    )
    ctrl = (
        m.filter(F.col("event_type") == _AB_CONTROL)
        .select(
            F.col("n").alias("cn"),
            F.col("s").alias("cs"),
            F.col("ss").alias("css"),
        )
    )
    return (
        m.filter(F.col("event_type") != _AB_CONTROL)
        .crossJoin(F.broadcast(ctrl))
        .select(
            "event_type",
            "n",
            F.expr(_round4(_AB_MEAN)).alias("mean_value"),
            F.expr(_round4(_AB_T)).alias("t_vs_control"),
            F.expr(f"(ABS({_round4(_AB_T)}) > 1.96)").alias("significant_95"),
        )
    )


# --------------------------------------------------------------------------
# stat_benford_digits — Benford first-digit audit over prices
# --------------------------------------------------------------------------
# Financial-forensics staple: the first significant digit of organic
# amounts follows Benford's law; a digit histogram that deviates flags
# fabricated or truncated data. The first digit is taken from the
# DECIMAL STRING of the exact e2 fixed-point price (no log10 floats —
# log10 isn't guaranteed correctly rounded, string heads are exact), and
# the expected shares are hard literals (log10(1+1/d) pre-scaled to e6),
# identical bytes in both engines. The chi-square contribution runs in
# wide-integer arithmetic (DECIMAL(38,0) / HUGEINT — the corr_regression
# dialect split), exact to ~1e12 rows per digit.

_BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_E6.items())
    + " END"
)


def _benford_chi2(cast: str, div: str) -> str:
    """chi2 contribution in e6 units: 1e6 * (obs - exp)^2 / exp, with
    diff = obs*1e6 - n*p_e6 squared in the wide integer type."""

    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    diff = f"({c('n_obs')} * 1000000 - {c('nt')} * {c('pe6')})"
    return (
        f"CAST({diff} * {diff} {div} ({c('nt')} * {c('pe6')} * 1000000)"
        f" AS BIGINT)"
    )


@query(
    "stat_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n_obs
      FROM lineitem WHERE l_extendedprice > 0
      GROUP BY 1
    ),
    t AS (
      SELECT digit, n_obs, CAST(SUM(n_obs) OVER () AS BIGINT) AS nt,
             CAST({_BENFORD_CASE} AS BIGINT) AS pe6
      FROM digits
    )
    SELECT digit, n_obs,
           CAST(n_obs * 1000000 // nt AS BIGINT) AS share_e6,
           pe6 AS benford_e6,
           {_benford_chi2('HUGEINT', '//')} AS chi2_contrib_e6
    FROM t
    """,
)
def stat_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit histogram over ``l_extendedprice`` (docstring
    block above): per digit the observed count, observed share (e6),
    Benford expectation (e6), and the exact-integer chi-square
    contribution ``1e6*(obs-exp)^2/exp``.

    Scale: one map-side-combinable aggregate to <= 9 rows; everything
    after is arithmetic on the 9-row frame (the window total never sees
    the fact table). The digit expression is a scan-stage projection in
    codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    digits = (
        li.filter(F.col("l_extendedprice") > 0)
        .select(
            F.expr(
                "CAST(substring(CAST(CAST(FLOOR(l_extendedprice * 100)"
                " AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = digits.select(
        "digit",
        "n_obs",
        F.expr("CAST(SUM(n_obs) OVER () AS BIGINT)").alias("nt"),
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("pe6"),
    )
    return t.select(
        "digit",
        "n_obs",
        F.expr("CAST(n_obs * 1000000 div nt AS BIGINT)").alias("share_e6"),
        F.col("pe6").alias("benford_e6"),
        F.expr(_benford_chi2("DECIMAL(38,0)", "div")).alias("chi2_contrib_e6"),
    )


# --------------------------------------------------------------------------
# stat_ks_drift — binned two-sample Kolmogorov–Smirnov drift per arm
# --------------------------------------------------------------------------
# The distribution-shift companion to `stat_ab_ttest`: a mean can hold
# steady while the shape drifts, so production monitors pair the t-test
# with a KS/PSI-style distribution check. This is the binned two-sample
# KS statistic (what drift monitors actually compute — fixed-width bins,
# not per-row order statistics): for each arm vs the 'view' control,
# D = max over bins |ECDF_arm - ECDF_ctrl|. The comparison is
# cross-multiplied into pure integers — |n_ctrl*cum_arm - n_arm*cum_ctrl|
# — so D is exact in both engines (no float ECDFs), and the 95% flag
# uses the classic c(0.05)=1.358 critical value with sqrt on exact
# integers. BIGINT products hold to ~3e9 rows/arm; beyond that the
# accumulators upgrade to DECIMAL(38,0)/HUGEINT (corr_regression
# discipline).
#
# Scale: one map-combinable aggregate collapses the fact table to
# (arm, bin) counts (~bins x arms rows); the grid completion, cumsums,
# and argmax all run on that bounded frame. The windows never see the
# fact table.

_KS_BIN_W = 5  # value bin width (~100 bins over the fixture range)
_KS_CRIT_E6 = 1358000  # c(alpha=0.05) * 1e6


@query(
    "stat_ks_drift",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(FLOOR(value / {_KS_BIN_W}) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    arms AS (SELECT DISTINCT event_type FROM b WHERE event_type <> 'view'),
    bins AS (SELECT DISTINCT bin FROM b),
    n AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM b GROUP BY 1),
    grid AS (
      SELECT a.event_type, bi.bin,
             COALESCE(x.c, 0) AS ca, COALESCE(q.c, 0) AS cq
      FROM arms a CROSS JOIN bins bi
      LEFT JOIN b x ON x.event_type = a.event_type AND x.bin = bi.bin
      LEFT JOIN b q ON q.event_type = 'view' AND q.bin = bi.bin
    ),
    cum AS (
      SELECT event_type, bin,
             CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY bin)
               AS BIGINT) AS cuma,
             CAST(SUM(cq) OVER (PARTITION BY event_type ORDER BY bin)
               AS BIGINT) AS cumq
      FROM grid
    ),
    diffs AS (
      SELECT c.event_type, c.bin,
             ABS(nq.n * c.cuma - na.n * c.cumq) AS d,
             na.n AS na, nq.n AS nq
      FROM cum c
      JOIN n na ON na.event_type = c.event_type
      JOIN n nq ON nq.event_type = 'view'
    ),
    mx AS (SELECT event_type, na, nq, MAX(d) AS dmax FROM diffs GROUP BY 1, 2, 3)
    SELECT m.event_type, m.na AS n,
           CAST(m.dmax * 1000000 // (m.na * m.nq) AS BIGINT) AS ks_e6,
           CAST(MIN(CASE WHEN d.d = m.dmax THEN d.bin END) AS BIGINT)
             AS drift_bin,
           (CAST(m.dmax * 1000000 // (m.na * m.nq) AS BIGINT) >
            CAST(FLOOR({_KS_CRIT_E6} * SQRT(CAST(m.na + m.nq AS DOUBLE)
              / CAST(m.na * m.nq AS DOUBLE))) AS BIGINT)) AS drifted_95
    FROM mx m JOIN diffs d ON d.event_type = m.event_type
    GROUP BY m.event_type, m.na, m.nq, m.dmax
    """,
)
def stat_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS drift of each event-type arm vs the 'view'
    control (docstring block above): exact-integer D in e6 units, the
    smallest bin attaining it, and the 1.358*sqrt((na+nq)/(na*nq))
    95% flag.

    Plan: the only fact-table pass is the (arm, bin) count aggregate;
    the bin grid, both ECDF cumsums, and the argmax run on the bounded
    binned frame (arms x bins rows) with broadcast-sized joins."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.expr(f"CAST(FLOOR(value / {_KS_BIN_W}) AS BIGINT)").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # five consumers of one tiny frame
    )
    arms = b.select("event_type").filter(F.col("event_type") != "view").distinct()
    bins = b.select("bin").distinct()
    n = b.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n"))
    ctrl_c = b.filter(F.col("event_type") == "view").select("bin", F.col("c").alias("cq"))
    arm_c = b.select(F.col("event_type"), "bin", F.col("c").alias("ca"))
    grid = (
        arms.crossJoin(bins)
        .join(arm_c, ["event_type", "bin"], "left")
        .join(F.broadcast(ctrl_c), ["bin"], "left")
        .fillna(0, subset=["ca", "cq"])
    )
    wcum = Window.partitionBy("event_type").orderBy("bin")
    n_ctrl = n.filter(F.col("event_type") == "view").select(
        F.col("n").alias("nq")
    )
    cum = (
        grid.withColumn("cuma", F.sum("ca").over(wcum).cast("bigint"))
        .withColumn("cumq", F.sum("cq").over(wcum).cast("bigint"))
        .join(n, "event_type")
        .crossJoin(F.broadcast(n_ctrl))
        .select(
            "event_type",
            "bin",
            F.expr("ABS(nq * cuma - n * cumq)").alias("d"),
            F.col("n").alias("na"),
            "nq",
        )
    )
    warm = Window.partitionBy("event_type")
    ks = (
        cum.withColumn("dmax", F.max("d").over(warm))
        .groupBy("event_type", "na", "nq", "dmax")
        .agg(
            F.min(F.when(F.col("d") == F.col("dmax"), F.col("bin")))
            .cast("bigint")
            .alias("drift_bin")
        )
    )
    ks_e6 = "CAST(dmax * 1000000 div (na * nq) AS BIGINT)"
    crit = (
        f"CAST(FLOOR({_KS_CRIT_E6} * SQRT(CAST(na + nq AS DOUBLE)"
        f" / CAST(na * nq AS DOUBLE))) AS BIGINT)"
    )
    return ks.select(
        "event_type",
        F.col("na").alias("n"),
        F.expr(ks_e6).alias("ks_e6"),
        "drift_bin",
        F.expr(f"({ks_e6} > {crit})").alias("drifted_95"),
    )


# --------------------------------------------------------------------------
# agg_basket_lift
# --------------------------------------------------------------------------


@query(
    "agg_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    capped AS (
      SELECT okey, pkey FROM (
        SELECT okey, pkey,
               ROW_NUMBER() OVER (PARTITION BY okey ORDER BY pkey) AS rn
        FROM items
      ) WHERE rn <= 32
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets
            FROM capped),
    freq AS (
      SELECT pkey, CAST(COUNT(*) AS BIGINT) AS c FROM capped GROUP BY 1
    ),
    pairs AS (
      SELECT a.pkey AS p1, b.pkey AS p2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM capped a JOIN capped b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
    )
    SELECT p1, p2, c12,
           f1.c AS c1, f2.c AS c2,
           CAST((c12 * t.n_baskets * 10000) // (f1.c * f2.c) AS BIGINT)
             AS lift_bp
    FROM pairs
    JOIN freq f1 ON p1 = f1.pkey
    JOIN freq f2 ON p2 = f2.pkey
    CROSS JOIN tot t
    WHERE c12 >= 2
    ORDER BY lift_bp DESC, p1 ASC, p2 ASC
    LIMIT 100
    """,
)
def agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top co-purchased part pairs ranked by
    lift — P(a,b) / (P(a)P(b)) in basis points over order baskets — the
    association-rule mining primitive behind recommenders and assortment
    planning (a lift far above 10000 bp means the pair co-occurs well
    beyond independence).

    Scale discipline: ONE fact shuffle. Each basket is assembled as a
    sorted-distinct part array in a single map-combinable collect_set
    aggregate on orderkey, capped at its 32 smallest partkeys (the
    identical cap the oracle's ROW_NUMBER <= 32 takes, since the array
    is sorted ascending) — the quadratic-blowup guard every production
    basket miner carries. Pairs are then generated MAP-SIDE by an array
    comprehension over each capped basket (i < j positions of a sorted
    array <=> pkey1 < pkey2) — no DISTINCT pass, no per-order window
    sort, no self-join: the oracle's three fact-keyed shuffles collapse
    into one. The pair aggregate map-side combines, part frequencies
    and the basket total reuse the same capped arrays (dim-sized
    inputs, broadcast back), min-support (c12 >= 2) prunes the long
    tail before ranking, and top-100 is a TakeOrdered, not a global
    sort.

    Determinism: counts and one positive-integer division; total order
    on (lift_bp DESC, p1, p2)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.collect_set("l_partkey").alias("pset"))
        .select(F.expr("slice(array_sort(pset), 1, 32)").alias("items"))
    )
    tot = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    freq = (
        baskets.select(F.explode("items").alias("pkey"))
        .groupBy("pkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .filter(F.col("c12") >= 2)
    )
    scored = (
        pairs.join(
            F.broadcast(freq.withColumnRenamed("pkey", "p1")
                        .withColumnRenamed("c", "c1")), "p1")
        .join(
            F.broadcast(freq.withColumnRenamed("pkey", "p2")
                        .withColumnRenamed("c", "c2")), "p2")
        .crossJoin(F.broadcast(tot))
        .select(
            "p1", "p2", "c12", "c1", "c2",
            F.expr(
                "CAST((c12 * n_baskets * 10000) div (c1 * c2) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )
    return scored.orderBy(
        F.desc("lift_bp"), F.asc("p1"), F.asc("p2")
    ).limit(100)


# --------------------------------------------------------------------------
# stat_chi_square — two-way independence test over the order mix
# --------------------------------------------------------------------------
# The categorical companion to stat_ab_ttest (means) and stat_ks_drift
# (distributions): is o_orderstatus independent of o_orderpriority?
# Pearson chi-square on the full contingency table, in the Benford
# operator's exact-integer dialect: per-cell contribution
# 1e6*(N*obs - rt*ct)^2 / (N*rt*ct) with the cross-multiplied difference
# squared in DECIMAL(38,0)/HUGEINT — exact while N^2*1e3 fits 38 digits
# (~1e8 fact rows; past that, production runs the same query with the
# difference pre-divided, trading the last e6 digit).

_CHI2_CELL = """
    SELECT o_orderstatus AS st, o_orderpriority AS pr,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM orders GROUP BY 1, 2
"""


def _chi2_contrib(cast: str, div: str) -> str:
    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    diff = f"({c('nt')} * {c('n_obs')} - {c('rt')} * {c('ct')})"
    return (
        f"CAST(({diff} * {diff} * 1000000)"
        f" {div} ({c('nt')} * {c('rt')} * {c('ct')}) AS BIGINT)"
    )


@query(
    "stat_chi_square",
    oracle=f"""
    WITH cells AS ({_CHI2_CELL}),
    t AS (
      SELECT st, pr, n_obs,
             CAST(SUM(n_obs) OVER (PARTITION BY st) AS BIGINT) AS rt,
             CAST(SUM(n_obs) OVER (PARTITION BY pr) AS BIGINT) AS ct,
             CAST(SUM(n_obs) OVER () AS BIGINT) AS nt
      FROM cells
    ),
    dims AS (
      SELECT (COUNT(DISTINCT st) - 1) * (COUNT(DISTINCT pr) - 1) AS dof
      FROM cells
    )
    SELECT st, pr, n_obs,
           CAST((rt * ct * 100) // nt AS BIGINT) AS expected_e2,
           {_chi2_contrib('HUGEINT', '//')} AS chi2_contrib_e6,
           CAST(SUM({_chi2_contrib('HUGEINT', '//')}) OVER () AS BIGINT)
             AS chi2_total_e6,
           CAST(dof AS BIGINT) AS dof
    FROM t, dims
    """,
)
def stat_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of order status x priority:
    per cell the observed count, expected count (e2), exact-integer
    chi-square contribution (e6), plus the table-wide statistic and
    degrees of freedom on every row (a window over the 15-cell frame).

    Scale: ONE map-side-combinable aggregate collapses the fact to the
    (status x priority) contingency table — bounded by category
    cardinality, never rows — and every margin/window/division after
    runs on that tiny frame. The same shape serves any pair of
    categorical columns; at 100 TB the only fact-sized work is the
    first hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.groupBy(
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderpriority").alias("pr"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    t = cells.select(
        "st",
        "pr",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy("st")).cast("bigint").alias("rt"),
        F.sum("n_obs").over(Window.partitionBy("pr")).cast("bigint").alias("ct"),
        F.sum("n_obs")
        .over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("nt"),
    )
    dims = cells.agg(
        (
            (F.countDistinct("st") - 1) * (F.countDistinct("pr") - 1)
        )
        .cast("bigint")
        .alias("dof")
    )
    contrib = _chi2_contrib("DECIMAL(38,0)", "div")
    t = t.withColumn("chi2_contrib_e6", F.expr(contrib))
    return t.crossJoin(F.broadcast(dims)).select(
        "st",
        "pr",
        "n_obs",
        F.expr("CAST((rt * ct * 100) div nt AS BIGINT)").alias("expected_e2"),
        "chi2_contrib_e6",
        F.sum("chi2_contrib_e6")
        .over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("chi2_total_e6"),
        "dof",
    )


# --------------------------------------------------------------------------
# stat_mann_whitney — rank-sum test, tie-corrected, exact-integer ranks
# --------------------------------------------------------------------------
# The nonparametric twin of stat_ab_ttest: does the 'click' arm's value
# distribution stochastically dominate 'view'? Ranks (the part that is
# usually float-fragile) stay EXACT: average ranks are carried doubled
# (2*avgrank = 2*minrank + ties - 1, always integral), the rank-sum and
# U statistic are exact integers in doubled units, and floats appear
# only in the final z normalization — one division + one exactly-rounded
# SQRT on already-exact integers, identical expression both engines.

_MW_A, _MW_B = "click", "view"
_MW_XI = "CAST(FLOOR(value * 100) AS BIGINT)"


def _mw_z(cast: str) -> str:
    """z = (U - n1*n2/2) / sigma, tie-corrected:
    sigma^2 = (n1*n2/12) * ((n+1) - T/(n*(n-1))), computed as doubles
    from exact wide-integer moments (T = sum(c^3 - c) over tie groups)."""

    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    num = f"(CAST({c('u_x2')} - {c('n1')} * {c('n2')} AS DOUBLE) / 2.0)"
    sig2 = (
        f"((CAST({c('n1')} * {c('n2')} AS DOUBLE) / 12.0)"
        f" * (CAST(n1 + n2 + 1 AS DOUBLE)"
        f" - CAST({c('tie_t')} AS DOUBLE)"
        f" / CAST({c('n1')} * ({c('n1')} + {c('n2')})"
        f" + {c('n2')} * ({c('n1')} + {c('n2')}) - {c('n1')} - {c('n2')}"
        f" AS DOUBLE)))"
    )
    return f"({num} / SQRT({sig2}))"


@query(
    "stat_mann_whitney",
    oracle=f"""
    WITH pool AS (
      SELECT {_MW_XI} AS xi,
             CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END AS ina
      FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
    ),
    vals AS (
      SELECT xi, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(ina) AS BIGINT) AS ca
      FROM pool GROUP BY xi
    ),
    rk AS (
      SELECT xi, c, ca,
             CAST(COALESCE(SUM(c) OVER (ORDER BY xi ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
               AS BIGINT) AS minrank
      FROM vals
    ),
    m AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n1,
             CAST(SUM(c - ca) AS BIGINT) AS n2,
             CAST(SUM(ca * (2 * minrank + c - 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tie_t
      FROM rk
    ),
    u AS (
      SELECT n1, n2, r1_x2, tie_t,
             CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u_x2
      FROM m
    )
    SELECT n1, n2, u_x2,
           CAST(n1 * n2 AS BIGINT) AS mu_x2,
           {_round4(_mw_z('HUGEINT'))} AS z_score,
           (ABS({_round4(_mw_z('HUGEINT'))}) > 1.96) AS significant_95
    FROM u
    """,
)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U ('click' vs 'view' event values, docstring block
    above): group sizes, the U statistic in exact doubled units, its
    null mean, and the tie-corrected z with the |z| > 1.96 flag.

    Scale: the pooled fact collapses FIRST to the distinct-VALUE table
    (one map-combinable aggregate; ~1.8k rows here, bounded by the value
    domain, not row count) — minranks are a running window over that
    type table (the documented vocabulary-bound global-window
    exception), and the final statistics are a 1-row aggregate. The
    classic formulation ranks raw rows with a global N-row window; this
    one never windows the fact."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.filter(F.col("event_type").isin(_MW_A, _MW_B)).select(
        F.expr(_MW_XI).alias("xi"),
        F.when(F.col("event_type") == _MW_A, 1).otherwise(0).alias("ina"),
    )
    vals = pool.groupBy("xi").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("ina").cast("bigint").alias("ca"),
    )
    wr = (
        Window.orderBy(F.col("xi").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = vals.select(
        "xi",
        "c",
        "ca",
        (F.coalesce(F.sum("c").over(wr), F.lit(0)) + 1)
        .cast("bigint")
        .alias("minrank"),
    )
    m = rk.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("n2"),
        F.sum(F.col("ca") * (2 * F.col("minrank") + F.col("c") - 1))
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(
            F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")
        )
        .cast("decimal(38,0)")
        .alias("tie_t"),
    )
    u = m.select(
        "n1",
        "n2",
        "r1_x2",
        "tie_t",
        F.expr("CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT)").alias("u_x2"),
    )
    z = _mw_z("DECIMAL(38,0)")
    return u.select(
        "n1",
        "n2",
        "u_x2",
        F.expr("CAST(n1 * n2 AS BIGINT)").alias("mu_x2"),
        F.expr(_round4(z)).alias("z_score"),
        F.expr(f"(ABS({_round4(z)}) > 1.96)").alias("significant_95"),
    )


# --------------------------------------------------------------------------
# stat_mad_robust — median absolute deviation outlier audit
# --------------------------------------------------------------------------
# The robust-statistics twin of ext_winsorize's quantile clamps: median
# and MAD are breakdown-50% estimators, so a contaminated tail cannot
# drag the center the way it drags mean/stddev. Both medians are the
# DISCRETE lower-median rank pick (`agg_median_disc`'s dialect-identical
# form) on exact e2 cents — a concrete element of the input, no
# interpolation, no floats anywhere in the whole operator.

_MAD_CENTS = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"


@query(
    "stat_mad_robust",
    oracle=f"""
    WITH x AS (
      SELECT l_returnflag AS flag, {_MAD_CENTS} AS cents,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    med AS (
      SELECT flag, cents AS med_cents FROM (
        SELECT flag, cents,
               ROW_NUMBER() OVER (PARTITION BY flag
                 ORDER BY cents ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
               COUNT(*) OVER (PARTITION BY flag) AS n
        FROM x) WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT x.flag, ABS(x.cents - m.med_cents) AS d,
             x.l_orderkey, x.l_linenumber, m.med_cents
      FROM x JOIN med m ON x.flag = m.flag
    ),
    mad AS (
      SELECT flag, med_cents, d AS mad_cents FROM (
        SELECT flag, d, med_cents,
               ROW_NUMBER() OVER (PARTITION BY flag
                 ORDER BY d ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
               COUNT(*) OVER (PARTITION BY flag) AS n
        FROM dev) WHERE rn = (n + 1) // 2
    )
    SELECT d.flag, CAST(COUNT(*) AS BIGINT) AS n,
           m.med_cents, m.mad_cents,
           CAST(MAX(d.d) AS BIGINT) AS max_abs_dev,
           CAST(SUM(CASE WHEN d.d > 3 * m.mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.flag = m.flag
    GROUP BY d.flag, m.med_cents, m.mad_cents
    """,
)
def stat_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag robust center/scale audit (docstring block above):
    exact discrete median, MAD, the max absolute deviation, and the
    |x - med| > 3*MAD outlier count — all pure integer arithmetic,
    bit-identical across engines. On THIS corpus n_outliers is 0 and
    that is the correct reading, not a vacuous slice: TPC-H prices are
    near-uniform, where max_abs_dev ~ 2*MAD by construction (the
    hash-pinned max_abs_dev/mad_cents ratio shows exactly that); the
    3*MAD gate exists for the long-tailed production distributions the
    estimator is built for, and the hash pins the full tail either way.

    Scale: the first cut ranked RAW rows per flag — two 3-partition
    window sorts that measured 11x time for 10x data at the 100x
    rehearsal (one ~200 M-row sort task per flag). This form collapses
    the fact to the distinct-VALUE table first (cents domain-bounded,
    ~1M rows max; the `stat_mann_whitney` move), so both median picks
    are cumulative windows over type tables and the fact is touched by
    exactly two map-combinable aggregates. The lower-median element is
    identical either way — the oracle keeps the row-rank formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr(_MAD_CENTS).alias("cents"),
    )

    def _median_pick(counts: DataFrame, val: str, alias: str) -> DataFrame:
        """Lower-median element from a (flag, value, c) count table via a
        cumulative window over the value-TYPE table (domain-bounded)."""
        wcum = (
            Window.partitionBy("flag")
            .orderBy(F.col(val).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = Window.partitionBy("flag")
        t = counts.select(
            "flag",
            val,
            "c",
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(wn).alias("n"),
        )
        return t.filter(
            (F.col("cum") >= F.expr("(n + 1) div 2"))
            & (F.col("cum") - F.col("c") < F.expr("(n + 1) div 2"))
        ).select("flag", F.col(val).alias(alias))

    # Round 12 (guide §5 / §3.3): the lazy one-plan form re-planned the
    # (flag, cents) count table FOUR times (4 lineitem scans + 4 groupBy
    # exchanges in the before plan — dt appears in the final agg and in
    # mad's branch, and each dt copy re-expands vt + med) with no
    # exchange reuse. The two shared type tables are domain-bounded and
    # narrow; materializing each once collapses the plan to one fact
    # scan + one fact aggregate, then windows/joins over tiny frames.
    # Values are untouched — same aggregates, same median picks.
    vt = (
        x.groupBy("flag", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    med = _median_pick(vt, "cents", "med_cents")
    dt = (
        vt.join(F.broadcast(med), "flag")
        .select(
            "flag",
            F.abs(F.col("cents") - F.col("med_cents")).alias("d"),
            "c",
            "med_cents",
        )
        .groupBy("flag", "med_cents", "d")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    mad = _median_pick(dt, "d", "mad_cents")
    return (
        dt.join(F.broadcast(mad), "flag")
        .groupBy("flag", "med_cents", "mad_cents")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.max("d").cast("bigint").alias("max_abs_dev"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad_cents"), F.col("c"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "flag", "n", "med_cents", "mad_cents", "max_abs_dev",
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# ml_linear_regression_normal — closed-form 2-feature OLS, exact moments
# --------------------------------------------------------------------------
# Multi-feature OLS fitted the 100 TB way: ONE map-combinable aggregate
# collapses the fact to nine exact wide-integer moments (n, sums,
# cross-products), and the normal equations solve by Cramer's rule on
# the driver-free 1-row frame. agg_corr_regression is the single-feature
# special case; this is the general shape every distributed ML library
# (Spark MLlib's normal-equation solver included) runs for small feature
# counts. Floats enter ONLY in the final Cramer divisions on
# already-exact integers — identical expression trees both engines.

_OLS_Y = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"  # cents
_OLS_X1 = "CAST(l_quantity AS BIGINT)"
_OLS_X2 = "CAST(FLOOR(l_discount * 100) AS BIGINT)"  # e2
_OLS_SUMS = {
    "n": "COUNT(*)",
    "s1": f"SUM(CAST({_OLS_X1} AS DECIMAL(38,0)))",
    "s2": f"SUM(CAST({_OLS_X2} AS DECIMAL(38,0)))",
    "sy": f"SUM(CAST({_OLS_Y} AS DECIMAL(38,0)))",
    "s11": f"SUM(CAST({_OLS_X1} * {_OLS_X1} AS DECIMAL(38,0)))",
    "s22": f"SUM(CAST({_OLS_X2} * {_OLS_X2} AS DECIMAL(38,0)))",
    "s12": f"SUM(CAST({_OLS_X1} * {_OLS_X2} AS DECIMAL(38,0)))",
    "s1y": f"SUM(CAST({_OLS_X1} * {_OLS_Y} AS DECIMAL(38,0)))",
    "s2y": f"SUM(CAST({_OLS_X2} * {_OLS_Y} AS DECIMAL(38,0)))",
    "syy": f"SUM(CAST({_OLS_Y} * {_OLS_Y} AS DECIMAL(38,0)))",
}


def _ols_exprs(cast: str) -> dict[str, str]:
    """Centered normal-equation terms as DOUBLEs from exact integers.
    The A/B cross-products can exceed 38 digits at extreme row counts,
    so each exact integer moment is cast to DOUBLE FIRST and Cramer
    runs in float — the final-stage-float discipline (stat_ab_ttest),
    with the expression shape fixed on both engines."""

    def c(x: str) -> str:
        return f"CAST(CAST({x} AS {cast}) AS DOUBLE)"

    n = c("n")
    a11 = f"({n} * {c('s11')} - {c('s1')} * {c('s1')})"
    a12 = f"({n} * {c('s12')} - {c('s1')} * {c('s2')})"
    a22 = f"({n} * {c('s22')} - {c('s2')} * {c('s2')})"
    b1 = f"({n} * {c('s1y')} - {c('s1')} * {c('sy')})"
    b2 = f"({n} * {c('s2y')} - {c('s2')} * {c('sy')})"
    det = f"({a11} * {a22} - {a12} * {a12})"
    beta1 = f"(({b1} * {a22} - {b2} * {a12}) / {det})"
    beta2 = f"(({a11} * {b2} - {a12} * {b1}) / {det})"
    beta0 = (
        f"(({c('sy')} - ({beta1}) * {c('s1')} - ({beta2}) * {c('s2')})"
        f" / {n})"
    )
    sst = f"({n} * {c('syy')} - {c('sy')} * {c('sy')})"
    r2 = f"((({beta1}) * {b1} + ({beta2}) * {b2}) / {sst})"
    return {"beta0": beta0, "beta1": beta1, "beta2": beta2, "r2": r2}


_OLS_INNER = ", ".join(f"{v} AS {k}" for k, v in _OLS_SUMS.items())


def _ols_select(cast: str) -> list[str]:
    e = _ols_exprs(cast)
    return [
        "CAST(n AS BIGINT) AS n",
        f"{_round4(e['beta0'])} AS beta0_cents",
        f"{_round4(e['beta1'])} AS beta1_cents_per_qty",
        f"{_round4(e['beta2'])} AS beta2_cents_per_disc_e2",
        f"{_round4(e['r2'])} AS r_squared",
    ]


@query(
    "ml_linear_regression_normal",
    oracle=f"""
    WITH m AS (SELECT {_OLS_INNER} FROM lineitem)
    SELECT {", ".join(_ols_select('HUGEINT'))} FROM m
    """,
)
def ml_linear_regression_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price ~ quantity + discount) via exact-moment
    normal equations + Cramer (docstring block above): returns n, the
    three coefficients, and R^2, all 4-decimal sign-mirrored rounded.

    Scale: the ONLY fact-sized work is one map-combinable aggregate
    (10 numbers); everything after is arithmetic on a 1-row frame. The
    same moment vector merges associatively across ingest waves — the
    incremental-fit shape. For p features the moment count is O(p^2);
    past a few hundred features production switches to L-BFGS, which is
    the documented boundary of the closed form."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        *[F.expr(v).alias(k) for k, v in _OLS_SUMS.items()]
    )
    return m.selectExpr(*_ols_select("DECIMAL(38,0)"))


# --------------------------------------------------------------------------
# ml_logistic_newton_step — the exact IRLS kernel, closed-form at beta=0
# --------------------------------------------------------------------------
# Logistic regression the way MLlib's IRLS/L-BFGS actually iterates, with
# the FIRST Newton-Raphson step hash-verified exactly: at beta = 0 the
# sigmoid is exactly 1/2 and the Hessian is X'X/4, so the step
# beta_1 = 4 (X'X)^-1 X'(y - 1/2) = 2 (X'X)^-1 X't   with t = 2y-1
# is a closed-form rational of the SAME exact integer moments the OLS
# key aggregates (t in {-1,+1} is an exact BIGINT response; t^2 = 1 so
# its square-moment is n). Later iterations need per-row sigmoid
# weights (transcendental, engine-divergent), so the hash-gated
# contract covers the exact first step while full convergence — and
# that this step IS iteration 1 of the float loop — is property-tested
# (tests/test_statistics_ops.py). The iteration loop is bounded and
# driver-paced exactly like `_BPE_ROUNDS`: one moment aggregate per
# round, never a per-row collect.

_LOGIT_T = "CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS BIGINT)"
_LOGIT_SUMS = {
    **{
        k: v.replace(_OLS_Y, _LOGIT_T)
        for k, v in _OLS_SUMS.items()
        if k not in ("syy",)
    },
    "syy": "COUNT(*)",  # t^2 = 1 exactly
}
_LOGIT_INNER = ", ".join(f"{v} AS {k}" for k, v in _LOGIT_SUMS.items())


def _logit_select(cast: str) -> list[str]:
    e = _ols_exprs(cast)
    return [
        "CAST(n AS BIGINT) AS n",
        f"CAST(CAST((n + sy) AS BIGINT) div 2 AS BIGINT) AS n_pos",
        f"{_round4('2 * (' + e['beta0'] + ')')} AS beta0",
        f"{_round4('2 * (' + e['beta1'] + ')')} AS beta1_per_qty",
        f"{_round4('2 * (' + e['beta2'] + ')')} AS beta2_per_disc_e2",
    ]


@query(
    "ml_logistic_newton_step",
    oracle=f"""
    WITH m AS (SELECT {_LOGIT_INNER} FROM lineitem)
    SELECT {", ".join(s.replace(" div ", " // ") for s in _logit_select("HUGEINT"))}
    FROM m
    """,
)
def ml_logistic_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First Newton/IRLS step of logistic regression
    P(l_returnflag = 'R') ~ quantity + discount, exact (docstring block
    above): n, the positive-class count, and the three step
    coefficients, 4-decimal sign-mirrored rounded.

    Scale: identical to `ml_linear_regression_normal` — ONE
    map-combinable aggregate collapses the fact to nine exact
    wide-integer moments; the 1-row Cramer solve never touches data.
    Each further IRLS round at 100 TB is one more weighted-moment
    aggregate (weights w_i = p_i (1 - p_i) from the previous beta,
    computed map-side), so the full fit is `max_iter` fact passes with
    no shuffle growth — the distributed-GLM shape, with this key as
    its regression-gated first round."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(*[F.expr(v).alias(k) for k, v in _LOGIT_SUMS.items()])
    return m.selectExpr(*_logit_select("DECIMAL(38,0)"))


# --------------------------------------------------------------------------
# agg_simpson_diversity — exact-integer concentration/diversity index
# --------------------------------------------------------------------------
# The diversity twin of agg_gini_concentration: Simpson's index
# sum(p_i^2) — the probability two random docs share a source — per
# language, in pure integer arithmetic (sum of squared counts
# cross-multiplied against n^2, e6-scaled by integer division). The
# corpus-mix health metric every data card quotes (effective source
# count = 1e6 / simpson_e6 in the same units).


@query(
    "agg_simpson_diversity",
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    )
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(CAST(n AS HUGEINT) * n) * 1000000
                // (CAST(SUM(CAST(n AS HUGEINT)) AS HUGEINT)
                    * SUM(CAST(n AS HUGEINT))) AS BIGINT) AS simpson_e6
    FROM c GROUP BY lang
    """,
)
def agg_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Simpson concentration of documents over sources
    (docstring block above): doc count, source count, and the e6-scaled
    index — 1e6/simpson_e6 is the effective-source-count a dataset card
    reports next to `ext_temperature_mix`'s rebalancing.

    Scale: one map-combinable (lang, source) aggregate (category-
    bounded), then a lang-keyed reduce over that tiny frame; the
    squared-count arithmetic runs in wide integers so the division is
    exact at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return c.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.expr(
            "CAST(SUM(CAST(n AS DECIMAL(38,0)) * n) * 1000000"
            " div (CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            "      * SUM(CAST(n AS DECIMAL(38,0)))) AS BIGINT)"
        ).alias("simpson_e6"),
    )


# --------------------------------------------------------------------------
# stat_bootstrap_ci — deterministic distributed Poisson bootstrap
# --------------------------------------------------------------------------
# Error bars the 100 TB way: the classic resample-with-replacement
# bootstrap needs n draws per replicate from a shared index space —
# un-distributable — so large-scale systems use the POISSON bootstrap
# (each row enters replicate r with multiplicity ~ Poisson(1); the
# replicate total size concentrates at n). Determinism: the multiplicity
# is a pure function of (event_id, r) via an md5-derived uniform, with
# the Poisson(1) CDF quantized to exact /2^32 thresholds — both engines
# compute the identical integer, so the whole CI is hash-exact. The
# replicate means are exact e2-scaled integer ratios; the 95% CI is the
# (5th, 196th) order statistic of the R=200 replicate means (empirical
# percentile-disc, the convention stated in the output column names).
# Measured negative result (10x replica): slicing one md5 digest into
# four 32-bit uniforms (R/4 digests per row) ran SLOWER (18.4 s vs
# 15.3 s) — the cost is the R-fold row expansion through the partial
# aggregate, not the hash, so the simpler one-digest-per-replicate
# text stays. Cost is linear in R by construction; R is the dial.

_BOOT_R = 200
# +C shift making every replicate-mean division nonnegative-over-positive
# (see the `means` CTE comment): valid while |mean value| < 1e7 currency
# units (C in e2 units).
_BOOT_SHIFT = 1_000_000_000
# cumulative Poisson(1) thresholds, floor(CDF(k) * 2^32), k = 0..6
_BOOT_THRESH = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
)


def _bootstrap_sql(dialect: str, nparts: int | None = None) -> str:
    """One SQL text per dialect (the `_ivf_multiprobe_sql` discipline):
    only the uniform-hash call, the replicate generator, and the integer
    division spell differ.

    ``nparts`` (spark only): explicit REPARTITION width for the
    pre-expansion exchange. Size-based AQE coalescing sees ~5 MB of
    input and collapses the shuffle to ONE task — but the work AFTER
    the exchange is R x the bytes (the expansion), so parallelism must
    be row-driven here: an explicit count (the session's
    shuffle-partitions knob) disables coalescing for exactly this
    exchange. Measured: the whole expansion ran single-task without it
    (2.0 s warm / 15.7 s cold in-suite at sf0.1)."""
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        reps = (
            "SELECT CAST(r0 AS BIGINT) AS r"
            " FROM (SELECT explode(sequence(1, %d)) AS r0)" % _BOOT_R
        )
        u = (
            "CAST(conv(substring(md5(CAST(event_id AS STRING) || ':boot:'"
            " || CAST(reps.r AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        )
    else:
        reps = (
            "SELECT CAST(range AS BIGINT) AS r FROM range(1, %d)"
            % (_BOOT_R + 1)
        )
        u = (
            "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)"
            " || ':boot:' || CAST(reps.r AS VARCHAR)), 1, 8)) AS BIGINT)"
        )
    mult = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
    )
    hint = f"/*+ REPARTITION({nparts}) */ " if nparts else ""
    # Rank convention is the (R+1)-quantile (Hyndman-Fan type-1 upper
    # bound): lo = R*0.025 = 5, hi = R*0.975 + 1 = 196 over R=200
    # replicates — NOT percentile_disc (which would put hi at
    # ceil(0.975*200) = 195). Both engines compute the same ranks from
    # the same expression, so the choice is a convention, not a
    # parity risk.
    lo_rk = _BOOT_R * 25 // 1000  # 5
    hi_rk = _BOOT_R * 975 // 1000 + 1  # 196
    return f"""
    WITH reps AS ({reps}),
    ex AS (
      SELECT e.event_type,
             CAST(FLOOR(e.value * 100) AS BIGINT) AS cents,
             reps.r,
             {u} AS u
      -- the REPARTITION hint spreads the R-fold expansion across the
      -- cluster BEFORE the md5 work (a small single-file input would
      -- otherwise run the whole expansion in one task); DuckDB reads
      -- it as a comment and parallelizes by morsel on its own.
      FROM (SELECT {hint} * FROM events) e CROSS JOIN reps
    ),
    weighted AS (
      SELECT event_type, cents, r,
             CASE {mult} ELSE 7 END AS mult
      FROM ex
    ),
    m AS (
      SELECT event_type, r,
             CAST(SUM(mult * cents) AS BIGINT) AS s,
             CAST(SUM(mult) AS BIGINT) AS w
      FROM weighted GROUP BY event_type, r
    ),
    means AS (
      -- +C*w shift before the division, de-shifted after: Spark `div`
      -- truncates toward zero, DuckDB `//` floors — they agree only on
      -- nonnegative numerators, and s = SUM(mult*cents) goes negative
      -- the moment events.value does. Same trick (and same C bound:
      -- valid while |mean_e2| < C; a larger corpus widens to
      -- DECIMAL(38,0)) as ts_theil_sen_trend.
      SELECT event_type,
             (s * 100 + {_BOOT_SHIFT} * w) {div} w - {_BOOT_SHIFT} AS mean_e2,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY (s * 100 + {_BOOT_SHIFT} * w) {div} w ASC, r ASC) AS rk
      FROM m
    ),
    ci AS (
      SELECT event_type,
             CAST(MAX(CASE WHEN rk = {lo_rk} THEN mean_e2 END) AS BIGINT)
               AS ci_lo_e2,
             CAST(MAX(CASE WHEN rk = {hi_rk} THEN mean_e2 END) AS BIGINT)
               AS ci_hi_e2
      FROM means GROUP BY event_type
    ),
    pt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST((SUM(CAST(FLOOR(value * 100) AS BIGINT)) * 100
                   + {_BOOT_SHIFT} * COUNT(*))
                  {div} COUNT(*) - {_BOOT_SHIFT} AS BIGINT) AS point_mean_e2
      FROM events GROUP BY event_type
    )
    SELECT pt.event_type, pt.n_rows, pt.point_mean_e2,
           ci.ci_lo_e2, ci.ci_hi_e2
    FROM pt JOIN ci ON pt.event_type = ci.event_type
    ORDER BY pt.event_type
    """


@query("stat_bootstrap_ci", oracle=_bootstrap_sql("duck"))
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 95% bootstrap CI for the mean value (docstring
    block above): point estimate plus the (2.5%, 97.5%) order-statistic
    bounds — the (R+1)-quantile ranks 5/196 over R=200 deterministic
    Poisson replicates — all e2-scaled exact integers.

    Scale: the only fact-sized work is one map-side expansion (x R
    against a broadcast 200-row frame — BroadcastNestedLoopJoin, no
    shuffle) feeding a map-combinable (type, r) aggregate: the shuffle
    carries types x 200 partial rows regardless of corpus size, and the
    order statistics run over those 200-row groups. R is the cost dial:
    work is R expansion rows per input row (the md5 itself measured
    non-dominant — see the negative result above), embarrassingly
    parallel; production
    sweeps R per required CI resolution. The replicate means merge
    associatively across ingest waves (sum/weight pairs), so the CI is
    incrementally maintainable like the moment-based keys."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    # some Spark distributions report the non-numeric "auto" here (AQE
    # auto-partitioning) — fall back rather than crash at plan time.
    raw = spark.conf.get("spark.sql.shuffle.partitions", "32")
    nparts = int(raw) if str(raw).isdigit() else 32
    return spark.sql(_bootstrap_sql("spark", nparts=nparts))


# --------------------------------------------------------------------------
# ml_nb_text_classify — exact-integer multinomial Naive Bayes (the
# classifier-filter stage of a pretraining pipeline: fastText-style
# language/quality gating, reduced to a hashable cross-engine contract)
# --------------------------------------------------------------------------
# Train on the base corpus slice (doc_id <= 90th-percentile cut, the
# shared refresh convention), classify the held-out wave, emit the
# confusion matrix. Every quantity is an exact integer:
#
# * Laplace-smoothed token likelihoods enter as HALF-BIT surprisals via
#   the BM25 IDF ladder trick — for integers A >= B >= 1,
#   floor(2*log2(A/B)) == floor(log2((A*A) // (B*B))) exactly (integer
#   quotient and true ratio share every power-of-two bracket), read off
#   a CASE ladder over 2^k literals. A = total_lang + V, B = c + 1.
# * the class prior contributes floor(2*log2(N_docs/docs_lang)) once.
# * prediction = argmin of (prior_hb + sum tf * token_hb), ties to the
#   lexicographically smaller lang — a total order both engines share.
#
# The quantized scores are a DETERMINISTIC classifier (documented: this
# is quantized NB, not float NB — the discipline that makes it oracle-
# checkable; half-bit resolution loses ~nothing at text scale).
# Bounds: (total+V)^2 stays under 2^63 out to ~3e9 tokens per class;
# a larger corpus widens the two squares to DECIMAL(38,0), same text.

_NB_LADDER_CAP_HB = 60


def _log2_hb(a: str, b: str, div: str) -> str:
    """floor(2*log2(a/b)) for integer SQL expressions a >= b >= 1."""
    ladder = " ".join(
        f"WHEN (({a}) * ({a})) {div} (({b}) * ({b})) < {1 << k} THEN {k - 1}"
        for k in range(1, _NB_LADDER_CAP_HB + 1)
    )
    return f"(CASE {ladder} ELSE {_NB_LADDER_CAP_HB} END)"


def _nb_sql(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        tok = "explode(filter(split(text, ' '), t -> t <> ''))"
    else:
        tok = "unnest(list_filter(string_split(text, ' '), t -> t <> ''))"
    mat = "MATERIALIZED " if dialect == "duck" else ""
    tok_hb = _log2_hb("tot.total + vocab.v", "COALESCE(cnt.c, 0) + 1", div)
    prior_hb = _log2_hb("n.n_docs", "cls.ndocs", div)
    return f"""
    WITH cut AS {mat}(
      SELECT (MAX(doc_id) * 9) {div} 10 AS c FROM documents
    ),
    train AS {mat}(
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id <= (SELECT c FROM cut)
    ),
    test AS {mat}(
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id > (SELECT c FROM cut)
    ),
    tr_tok AS {mat}(
      SELECT lang, {tok} AS token FROM train
    ),
    cls AS {mat}(
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS ndocs FROM train GROUP BY lang
    ),
    n AS {mat}(
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM train
    ),
    tot AS {mat}(
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS total FROM tr_tok GROUP BY lang
    ),
    vocab AS {mat}(
      SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tr_tok
    ),
    cnt AS {mat}(
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tr_tok GROUP BY lang, token
    ),
    te_tf AS {mat}(
      SELECT doc_id, lang AS actual, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, lang, {tok} AS token FROM test) t
      GROUP BY doc_id, lang, token
    ),
    scored AS {mat}(
      SELECT t.doc_id, t.actual, cls.lang AS cand,
             CAST(SUM(t.tf * {tok_hb}) AS BIGINT)
               + CAST(MIN({prior_hb}) AS BIGINT) AS score_hb
      FROM te_tf t
      CROSS JOIN cls
      JOIN tot ON tot.lang = cls.lang
      CROSS JOIN vocab
      CROSS JOIN n
      LEFT JOIN cnt ON cnt.lang = cls.lang AND cnt.token = t.token
      GROUP BY t.doc_id, t.actual, cls.lang
    ),
    pred AS {mat}(
      SELECT doc_id, actual, cand AS predicted FROM (
        SELECT doc_id, actual, cand,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score_hb ASC, cand ASC) AS rn
        FROM scored
      ) t WHERE rn = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """


@query("ml_nb_text_classify", oracle=_nb_sql("duck"))
def ml_nb_text_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial-NB text classifier, trained on the base corpus slice
    and evaluated on the held-out wave (tier block above): the confusion
    matrix of exact-integer quantized NB, hash-checked cross-engine —
    one drifted count, smoothing term, or tie anywhere in train OR
    inference breaks the hash. The operator is the classifier-filter
    stage every pretraining pipeline runs (language gating, quality
    gating by a labeled seed set); its per-doc argmin is the gate
    decision.

    Measured honestly: on this synthetic corpus the text is only weakly
    lang-correlated, so the majority-class prior dominates and most
    wave docs predict 'en' (sf0.01 confusion: 22/50 correct, all but
    one prediction 'en') — the row certifies the MECHANISM (counts,
    smoothing, ladder, argmin) bit-exactly, not corpus accuracy; a
    real deployment trains on genuinely separable classes.

    Scale: training is two map-combinable aggregates over train tokens
    ((lang, token) counts + per-lang totals); inference joins test-doc
    tf rows against the count table per candidate class — shuffle keyed
    (lang, token), the model rows broadcastable when vocab x classes is
    dim-sized (here it is); the argmin window partitions by doc. The
    |classes| blow-up is the honest NB inference cost; classes are 5
    here and bounded in any gating deployment."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_nb_sql("spark"))


# --------------------------------------------------------------------------
# stat_permutation_test — deterministic randomization test (the
# nonparametric sibling of stat_ab_ttest / stat_bootstrap_ci)
# --------------------------------------------------------------------------
# Fisher-style significance without distributional assumptions: the
# 'purchase' arm vs the 'view' control, statistic = difference of mean
# cents, null distribution from R=100 label RE-RANDOMIZATIONS (Bernoulli
# split per row — the standard Monte Carlo randomization-test form, NOT
# exact permutations; documented honestly). Determinism discipline:
#
# * each (row, r) gets its split bit from the SAME md5-derived uniform
#   both engines compute (the stat_bootstrap_ci spelling);
# * "|T_r| >= |T_obs|" is decided by CROSS-MULTIPLICATION in DECIMAL(38,0)
#   / HUGEINT — |s1*n2 - s2*n1| * (m1*m2) vs |t1*m2 - t2*m1| * (n1*n2) —
#   so no division ever happens and the verdict is an exact integer
#   comparison (bounds: ~3e30 at the 100x replica, inside 38 digits);
# * an empty side in a re-randomization (impossible at these n, but
#   stated) counts as extreme — the conservative CASE both engines share.

_PERM_R = 100
_PERM_TREAT = "purchase"


def _perm_sql(dialect: str, nparts: int = 0) -> str:
    xi = "CAST(FLOOR(value * 100) AS BIGINT)"
    if dialect == "spark":
        reps = (
            "SELECT CAST(r0 AS BIGINT) AS r"
            " FROM (SELECT explode(sequence(1, %d)) AS r0)" % _PERM_R
        )
        u = (
            "CAST(conv(substring(md5(CAST(event_id AS STRING) || ':perm:'"
            " || CAST(reps.r AS STRING)), 1, 8), 16, 10) AS BIGINT)"
        )
        wide = "DECIMAL(38,0)"
    else:
        reps = (
            "SELECT CAST(range AS BIGINT) AS r FROM range(1, %d)"
            % (_PERM_R + 1)
        )
        u = (
            "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)"
            " || ':perm:' || CAST(reps.r AS VARCHAR)), 1, 8)) AS BIGINT)"
        )
        wide = "HUGEINT"
    hint = f"/*+ REPARTITION({nparts}) */ " if nparts else ""
    mat = "MATERIALIZED " if dialect == "duck" else ""
    return f"""
    WITH base AS {mat}(
      SELECT event_id, {xi} AS cents,
             CASE WHEN event_type = '{_PERM_TREAT}' THEN 1 ELSE 0 END AS treat
      FROM events
      WHERE event_type IN ('{_PERM_TREAT}', '{_AB_CONTROL}')
    ),
    obs AS {mat}(
      SELECT CAST(SUM(CASE WHEN treat = 1 THEN cents ELSE 0 END) AS {wide}) AS t1,
             CAST(SUM(treat) AS {wide}) AS m1,
             CAST(SUM(CASE WHEN treat = 0 THEN cents ELSE 0 END) AS {wide}) AS t2,
             CAST(SUM(1 - treat) AS {wide}) AS m2
      FROM base
    ),
    reps AS ({reps}),
    perm AS {mat}(
      SELECT reps.r,
             CAST(SUM(CASE WHEN u % 2 = 1 THEN cents ELSE 0 END) AS {wide}) AS s1,
             CAST(SUM(u % 2) AS {wide}) AS n1,
             CAST(SUM(CASE WHEN u % 2 = 0 THEN cents ELSE 0 END) AS {wide}) AS s2,
             CAST(SUM(1 - u % 2) AS {wide}) AS n2
      FROM (SELECT {hint} event_id, cents FROM base) b
      CROSS JOIN reps
      CROSS JOIN LATERAL (SELECT {u} AS u) h
      GROUP BY reps.r
    ),
    verdicts AS {mat}(
      SELECT CASE WHEN n1 * n2 = 0 THEN 1
                  WHEN ABS(s1 * n2 - s2 * n1) * (o.m1 * o.m2)
                       >= ABS(o.t1 * o.m2 - o.t2 * o.m1) * (n1 * n2)
                  THEN 1 ELSE 0 END AS extreme
      FROM perm CROSS JOIN obs o
    )
    SELECT CAST(o.m1 AS BIGINT) AS n_treat,
           CAST(o.m2 AS BIGINT) AS n_ctrl,
           CAST({_PERM_R} AS BIGINT) AS n_permutations,
           (SELECT CAST(SUM(extreme) AS BIGINT) FROM verdicts) AS n_extreme,
           (SELECT CAST(SUM(extreme) * 10000 AS BIGINT) FROM verdicts)
             {"div" if dialect == "spark" else "//"} {_PERM_R} AS p_bp
    FROM obs o
    """


@query("stat_permutation_test", oracle=_perm_sql("duck"))
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test of the purchase-vs-view mean difference (tier
    block above): arm sizes, R=100, the count of re-randomizations at
    least as extreme as the observed statistic, and the Monte Carlo
    p-value in basis points — all exact integers, hash-checked.

    Scale: the only fact-sized work is the R-fold expansion feeding one
    map-combinable per-r aggregate (the stat_bootstrap_ci cost shape —
    R is the declared certification dial, and the pre-expansion
    REPARTITION sidesteps the measured AQE single-task coalesce);
    verdicts compare R rows against one observed row. The cross-
    multiplied comparison keeps the whole test division-free."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    raw = spark.conf.get("spark.sql.shuffle.partitions", "32")
    nparts = int(raw) if str(raw).isdigit() else 32
    return spark.sql(_perm_sql("spark", nparts=nparts))
