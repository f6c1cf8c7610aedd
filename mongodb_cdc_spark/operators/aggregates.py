"""Aggregation operators (SURVEY.md §2B "Aggregations").

The reference's only aggregations are per-batch insert/update/error
counters (js:155, js:166-184 ``stats``/``totalStats``) — generalized here
to the full hash-aggregate surface an analytics engine needs. All double
aggregates follow the fixed-point determinism discipline (`_util.sum2` /
`avg2`: exact BIGINT accumulation, explicit integer rounding).

Scale notes: every groupBy below is a hash aggregate with map-side partial
aggregation (Spark plans partial_sum/partial_count before the shuffle), so
the shuffle carries one row per (partition, group), not per input row.
Group-key cardinality here is tiny-to-moderate (flags, statuses, custkeys),
so no skew handling is needed; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import avg2, avg2_sql, sum2, sum2_sql
from mongodb_cdc_spark.registry import query

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sum2_sql('l_quantity', 'sum_qty')[1]},
       {sum2_sql('l_extendedprice', 'sum_base_price')[1]},
       {sum2_sql(_DISC_PRICE, 'sum_disc_price')[1]},
       {sum2_sql(_CHARGE, 'sum_charge')[1]},
       {avg2_sql('l_quantity', 'avg_qty')[1]},
       {avg2_sql('l_extendedprice', 'avg_price')[1]},
       {avg2_sql('l_discount', 'avg_disc')[1]},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_hash_groupby", oracle=_Q1_ORACLE)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary — the engine's flagship query
    (`__spark_entry__.entry`). Filter pushes to the parquet scan; the
    2-key hash aggregate partial-aggregates map-side before one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum2("l_quantity", "sum_qty"),
            sum2("l_extendedprice", "sum_base_price"),
            sum2(_DISC_PRICE, "sum_disc_price"),
            sum2(_CHARGE, "sum_charge"),
            avg2("l_quantity", "avg_qty"),
            avg2("l_extendedprice", "avg_price"),
            avg2("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type. Spark expands COUNT DISTINCT into a
    two-phase aggregate (dedup on (event_type, user_id), then count) —
    scales with distinct-pair cardinality, not input rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type. At 100 TB this
    is THE way to count distincts: fixed-size sketch per group, no dedup
    shuffle.

    Sketch estimates differ across engines, so the oracle is
    self-validating (the pattern used by the streaming ops): Spark
    computes BOTH the exact distinct count (which the oracle re-derives
    exactly) and the HLL estimate, and emits `within_tol` = estimate
    within 5% of exact (rsd=0.02, so 5% is > 2 sigma); the oracle states
    TRUE. The estimate itself is deterministic within Spark, so the check
    is stable run to run."""
    ev = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("distinct_users"),
        (
            (F.abs(approx - exact) / exact.cast("double")) <= F.lit(0.05)
        ).alias("within_tol"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region -> nation -> grand total of customer
    counts. The dims are broadcast (see joins.py scale notes); the rollup
    is one Expand + hash aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sum2_sql('o_totalprice', 'sum_price')[1]}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (status, priority) with counts and deterministic
    price sums."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum2("o_totalprice", "sum_price"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sum2_sql('l_quantity', 'sum_qty')[1]}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (Catalyst plans the same
    Expand as rollup)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               {sum2_sql('l_quantity', 'sum_qty')[0]}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {sum2_sql('o_totalprice', 'total_spent')[1]}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation group filter (HAVING ≅ .agg().filter())."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum2("o_totalprice", "total_spent"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@query(
    "agg_cdc_batch_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_cdc_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-batch stats counters (js:155/166-184: inserts,
    updates, errors tallied per processed batch) as a relational aggregate
    over the event log. Streaming twin: ``df.observe`` in
    streaming/monitor.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_argmax_struct",
    oracle="""
    SELECT o_orderstatus, top_orderkey, top_totalprice
    FROM (
      SELECT o_orderstatus,
             o_orderkey AS top_orderkey,
             o_totalprice AS top_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def agg_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max via struct ordering: the single most expensive order per
    status in ONE aggregate pass — ``max(struct(price, key))`` compares
    lexicographically, so the key doubles as the deterministic tiebreak.
    At scale this beats the window formulation (the oracle): a map-side-
    combinable aggregate instead of a full per-group sort."""
    o = load_table(spark, sf_dir, "orders")
    top = F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
    return o.groupBy("o_orderstatus").agg(
        top.getField("o_orderkey").alias("top_orderkey"),
        top.getField("o_totalprice").alias("top_totalprice"),
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           TRUE AS monotone,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch) of extended price
    per return flag — with approx_count_distinct, the sketch pair that
    replaces exact order statistics at 100 TB (bounded-memory mergeable
    summaries; no global sort).

    Sketch outputs are engine-specific (and array-typed, which the
    driver's hasher cannot hash), so the emitted row is self-validating:
    Spark computes the sketch AND the exact percentiles in one aggregate
    pass, and emits `monotone` (q25 <= q50 <= q75 <= q95) and
    `within_tol` (each approx quantile within 5% of the exact one;
    accuracy=10000 gives ~1e-4 rank error, far inside that); the oracle
    states TRUE alongside the exactly-checkable group count."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.95]
    approx = F.percentile_approx("l_extendedprice", qs, 10000)
    exact = F.percentile("l_extendedprice", F.array(*[F.lit(q) for q in qs]))
    # Spark SQL [] subscripts are 0-based (DuckDB's are 1-based; both
    # arrays stay Spark-side here so 0-based is correct).
    monotone = F.expr("aq[0] <= aq[1] AND aq[1] <= aq[2] AND aq[2] <= aq[3]")
    within = F.expr(
        " AND ".join(
            f"abs(aq[{i}] - eq[{i}]) <= 0.05 * abs(eq[{i}])" for i in range(4)
        )
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            approx.alias("aq"),
            exact.alias("eq"),
        )
        .select("l_returnflag", "n", monotone.alias("monotone"), within.alias("within_tol"))
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array collection: distinct values per group, SORTED — collect_set
    order is nondeterministic in any engine, so the deterministic form is
    sort_array(collect_set(..)). The sorted array is emitted joined to a
    CSV string: array cells reach the driver as numpy arrays and crash
    its hasher (`unhashable type` in CORRECTNESS_r01), so both engines
    emit the string form."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations")
    )


# Shared template for the moments op: q = FLOOR(value * 100) is one IEEE
# multiply + exact floor per row (bit-identical cross-engine); every
# aggregate is then an exact BIGINT sum, and the derived moments are the
# SAME double expression tree over those exact integers in both engines.
_MOM_DERIVE = """
       CAST(n AS BIGINT) AS n,
       (CAST(s1 AS DOUBLE) / (100.0 * n)) AS mean_value,
       ((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          / (10000.0 * n * n)) AS var_value,
       CASE WHEN (n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) = 0
              OR (n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)) = 0
            THEN 0.0
            ELSE (n * CAST(svh AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sh AS DOUBLE))
                 / (sqrt(n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    * sqrt(n * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)))
       END AS corr_value_hour
"""

_MOMENTS_ORACLE = f"""
WITH q AS (
  SELECT event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS qv,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(qv) AS s1, SUM(qv * qv) AS s2,
         SUM(h) AS sh, SUM(h * h) AS shh, SUM(qv * h) AS svh
  FROM q GROUP BY event_type
)
SELECT event_type, {_MOM_DERIVE}
FROM s
"""


@query("agg_stats_moments", oracle=_MOMENTS_ORACLE)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical profile per event_type: count, mean, population
    variance, and the value-vs-hour-of-day Pearson correlation — the
    data-quality / drift numbers a pipeline monitors per batch.

    Determinism: built-in corr()/var_pop() accumulate doubles in
    partial-aggregation order (nondeterministic across partitionings and
    engines), so every moment here is DERIVED from exact fixed-point
    BIGINT sums (q = FLOOR(value*100), exact per-row) via one shared
    double expression tree — correctly-rounded IEEE ops over identical
    operands, hence hash-exact cross-engine.

    Scale: one map-side-combinable hash aggregate; the shuffle carries 7
    BIGINTs per (partition, event_type). Overflow bound: SUM(qv*qv) <=
    rows_per_group * 3.2e9 — safe under BIGINT to ~2.9e9 rows per group;
    beyond that swap the accumulators to DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("qv"),
        F.hour("ts").cast("bigint").alias("h"),
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s1"),
        F.sum(F.col("qv") * F.col("qv")).alias("s2"),
        F.sum("h").alias("sh"),
        F.sum(F.col("h") * F.col("h")).alias("shh"),
        F.sum(F.col("qv") * F.col("h")).alias("svh"),
    )
    return s.selectExpr("event_type", *_MOM_DERIVE.split(",\n"))


_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, (epoch_ns(ts) // 1000000000) AS sec FROM events
), s1 AS (
  SELECT user_id, MIN(sec) AS t1 FROM ev WHERE event_type = 'view'
  GROUP BY user_id
), s2 AS (
  SELECT ev.user_id, MIN(sec) AS t2
  FROM ev JOIN s1 ON ev.user_id = s1.user_id
  WHERE event_type = 'click' AND sec > t1
  GROUP BY ev.user_id
), s3 AS (
  SELECT ev.user_id, MIN(sec) AS t3
  FROM ev JOIN s2 ON ev.user_id = s2.user_id
  WHERE event_type = 'purchase' AND sec > t2
  GROUP BY ev.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_click_after_view,
       (SELECT COUNT(*) FROM s3) AS n_purchase_after_click,
       ((SELECT COUNT(*) FROM s2) * 10000) // (SELECT COUNT(*) FROM s1)
         AS step2_bp,
       ((SELECT COUNT(*) FROM s3) * 10000) // (SELECT COUNT(*) FROM s1)
         AS step3_bp
"""


@query("agg_funnel_steps", oracle=_FUNNEL_ORACLE)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per user,
    the first view, the first click strictly AFTER that view, the first
    purchase strictly after that click; reported as per-step user counts
    and integer-basis-point conversion (exact integer division — no
    float ratio to disagree on). Timestamps compare as integer epoch
    seconds.

    The ordering dependency (step N's window starts at step N-1's time)
    is three min-aggregates chained by equi-joins — ALL keyed on
    user_id, so one shuffle partitioning serves every stage; the joined
    sides after stage 1 are one row per qualifying user. The
    alternative single-pass form (sort each user's events through a
    session window) shuffles every event row instead of per-user
    minima."""
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
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )
    return counts.select(
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        F.expr("(n_click_after_view * 10000) DIV n_view").alias("step2_bp"),
        F.expr("(n_purchase_after_click * 10000) DIV n_view").alias("step3_bp"),
    )


_MODE_ORACLE = """
WITH h AS (
  SELECT event_type,
         ((epoch_ns(ts) // 1000000000) // 3600) % 24 AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hr AS modal_hour, n AS n_at_mode
FROM (SELECT event_type, hr, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, hr ASC) AS rk
      FROM h)
WHERE rk = 1
"""


@query("agg_mode_disc", oracle=_MODE_ORACLE)
def agg_mode_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent hour-of-day per event_type
    (count DESC, hour ASC tiebreak — engines have no common builtin
    mode() tiebreak contract, so the rank spells it out). Hour is pure
    integer arithmetic on epoch seconds, immune to session-timezone and
    timestamp-precision differences.

    Scale: count-per-(type, hour) partial-aggregates map-side to at most
    |types| x 24 rows; the rank window runs over that aggregate, never
    the event rows."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    h = (
        ev.select(
            "event_type",
            F.expr(
                "(CAST(to_unix_timestamp(ts) AS BIGINT) DIV 3600) % 24"
            ).alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("hr").asc())
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("hr").alias("modal_hour"), F.col("n").alias("n_at_mode"))
    )


# Count-Min sketch geometry: 4 hash rows x 32 counters. Width is chosen
# SMALL relative to the 150-user key space at test SF so hash collisions
# actually occur and the estimate/error machinery is exercised — not just
# trivially exact. md5-derived slot hashing is identical in both engines,
# so every counter (and thus every estimate) is the same BIGINT on both
# sides: the sketch is exact-oracle checkable, collisions and all.
_CMS_D = 4
_CMS_W = 32
_CMS_PROBES = 10


def _cms_slot_sql(key_expr: str, j: int, dialect: str) -> str:
    """Depth-``j`` counter slot for ``key_expr`` (md5-prefix hash mod W),
    written identically for Spark and DuckDB."""
    salted = (
        f"CAST({key_expr} AS STRING) || ':cms:{j}'"
        if dialect == "spark"
        else f"CAST({key_expr} AS VARCHAR) || ':cms:{j}'"
    )
    if dialect == "spark":
        return f"CAST(conv(substring(md5({salted}), 1, 8), 16, 10) AS BIGINT) % {_CMS_W}"
    return f"CAST(('0x' || substring(md5({salted}), 1, 8)) AS BIGINT) % {_CMS_W}"


@query(
    "agg_countmin_sketch",
    oracle=f"""
    WITH depths AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d),
    counters AS (
      SELECT d, slot, COUNT(*) AS c
      FROM (
        SELECT d.d AS d,
               CASE d.d {' '.join(f"WHEN {j} THEN {_cms_slot_sql('user_id', j, 'duck')}" for j in range(_CMS_D))} END AS slot
        FROM events, depths d
      )
      GROUP BY d, slot
    ),
    probes AS (
      SELECT user_id, COUNT(*) AS exact_cnt
      FROM events WHERE user_id < {_CMS_PROBES} GROUP BY user_id
    ),
    probe_slots AS (
      SELECT p.user_id, p.exact_cnt, d.d AS d,
             CASE d.d {' '.join(f"WHEN {j} THEN {_cms_slot_sql('p.user_id', j, 'duck')}" for j in range(_CMS_D))} END AS slot
      FROM probes p, depths d
    ),
    n AS (SELECT COUNT(*) AS total FROM events)
    SELECT user_id,
           CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c) AS BIGINT) AS cms_est,
           MIN(c) >= exact_cnt AS never_underestimates,
           MIN(c) - exact_cnt <= 2 * (SELECT total FROM n) // {_CMS_W} AS within_error_bound
    FROM probe_slots JOIN counters USING (d, slot)
    GROUP BY user_id, exact_cnt
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries, exact-oracle checkable: build a
    4x32 counter matrix over the event stream's user ids (each row
    explodes into 4 (depth, slot) pairs; slot = md5-prefix hash, identical
    across engines), then estimate 10 probe keys' frequencies as the
    min counter across depths. Emits the estimate next to the exact count
    plus the two sketch guarantees as checked booleans: CMS never
    underestimates, and the (deterministic, collision-driven) overestimate
    stays within 2N/W.

    This is the mergeable-sketch tier the reference's counters (js:166-184
    per-batch stats) can't reach: at 100 TB the counter matrix is a FIXED
    4x32 integers regardless of input size — partial aggregation per
    partition IS the sketch merge (counters add), the shuffle carries at
    most D*W rows per input partition, and pre-aggregated per-hour/per-day
    sketches combine by elementwise sum. The probe join broadcasts the
    128-counter table."""
    ev = load_table(spark, sf_dir, "events")

    def slots(key: str) -> F.Column:
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("d"),
                        F.expr(_cms_slot_sql(key, j, "spark")).alias("slot"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        )

    counters = (
        ev.select(slots("user_id").alias("p"))
        .select("p.d", "p.slot")
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = ev.count()
    probes = (
        ev.filter(F.col("user_id") < _CMS_PROBES)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    probe_slots = probes.select(
        "user_id", "exact_cnt", slots("user_id").alias("p")
    ).select("user_id", "exact_cnt", "p.d", "p.slot")
    return (
        probe_slots.join(F.broadcast(counters), ["d", "slot"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "user_id",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
            (F.col("cms_est") - F.col("exact_cnt") <= F.lit(2 * total // _CMS_W)).alias(
                "within_error_bound"
            ),
        )
    )


@query(
    "agg_hll_partial_merge",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_day_sketches,
           TRUE AS merge_matches_oneshot,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    """,
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL mergeability, driver-proven (Spark >= 3.5
    ``hll_sketch_agg`` / ``hll_union_agg``): build one sketch per
    (event_type, day), union the per-day sketches per event_type, and
    check the merged estimate (a) lands within 5% of the one-shot
    whole-column sketch and (b) within 5% of the exact distinct count.
    (a) is deliberately a TOLERANCE, not equality: HLL registers
    max-combine associatively, but DataSketches keeps small sketches in
    an exact sparse mode while a union promotes to dense HLL — so a
    one-shot sketch of 1.5k users reads 1494 while the union of its
    daily parts reads 1488 (measured at sf0.1; equal at sf0.01 where
    both stay sparse). The bound is 5%: lgK=12's RSE is ~1.6%, so a
    1-3% sparse-vs-dense divergence sits INSIDE the sketch's own
    contract and a tighter check would recreate the fragile-equality
    mistake. Bounded-error equivalence IS the mergeability
    contract sketches actually offer. Both checks travel as booleans
    next to exact BIGINTs the oracle can state.

    This is THE pre-aggregation pattern for distinct counting at 100 TB:
    daily (or per-shard) sketches are a few KB each, stored once, and any
    date-range distinct-count query merges sketches instead of rescanning
    raw events — `agg_approx_count_distinct` answers one query, this
    answers all of them. The per-day sketch build shuffles sketch bytes
    (KB per group), never user ids."""
    ev = load_table(spark, sf_dir, "events")
    lgk = F.lit(12)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", lgk).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "merged_est"
        ),
        F.count(F.lit(1)).alias("n_day_sketches"),
    )
    oneshot = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", lgk)).alias(
            "oneshot_est"
        ),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.join(oneshot, "event_type").select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        F.col("n_day_sketches").cast("bigint").alias("n_day_sketches"),
        (
            F.abs(F.col("merged_est") - F.col("oneshot_est"))
            <= F.col("oneshot_est") * F.lit(0.05)
        ).alias("merge_matches_oneshot"),
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("within_tol"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           CAST(COUNT(DISTINCT user_id // 64) AS BIGINT) AS n_buckets
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via two-level bitmap aggregation — the
    mergeable-exact-distinct pattern (roaring-bitmap shape) that replaces
    COUNT(DISTINCT) rescans at 100 TB: level 1 groups (key, user_id div
    64) and ORs each user into a 64-bit word (`bit_or(1 << user_id % 64)`
    — map-side combinable, idempotent under replay); level 2 sums
    `bit_count(word)` per key. Both passes are plain partial-aggregable
    shuffles of BIGINTs: state per key is #buckets words, not #users
    rows, and per-day word tables can be stored and OR-merged across any
    date range without re-reading events — the same
    store-partials-merge-any-range contract as the HLL tier
    (`agg_hll_partial_merge`) but EXACT. The oracle computes true
    COUNT(DISTINCT) — any dropped or double-set bit breaks the hash."""
    e = load_table(spark, sf_dir, "events")
    words = e.groupBy(
        "event_type", F.expr("user_id div 64").alias("bucket")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))"
        ).alias("word")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


@query(
    "agg_bitmap_range_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_week
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      AND CAST(ts AS DATE) < DATE '2024-01-15'
    GROUP BY event_type
    """,
)
def agg_bitmap_range_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational payoff of `agg_bitmap_distinct`: build the
    PER-DAY level-1 word table (day, key, bucket, word) — the shape a
    100 TB pipeline would persist daily — then answer "exact distinct
    users for Jan 8-14" by OR-merging just that week's words, never
    re-reading the events. OR is idempotent and associative, so the
    merge is correct for any date range, any re-run, any partial
    overlap — the mergeable-summaries contract with an EXACT answer.
    The oracle recomputes true COUNT(DISTINCT) from the raw rows for
    the same window; equality proves the daily-sketch path loses
    nothing."""
    e = load_table(spark, sf_dir, "events")
    daily_words = e.withColumn("d", F.to_date("ts")).groupBy(
        "d", "event_type", F.expr("user_id div 64").alias("bucket")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))"
        ).alias("word")
    )
    week = daily_words.filter(
        (F.col("d") >= F.lit("2024-01-08")) & (F.col("d") < F.lit("2024-01-15"))
    )
    merged = week.groupBy("event_type", "bucket").agg(
        F.expr("bit_or(word)").alias("word")
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("n_users_week")
    )


@query(
    "agg_bitmap_audience_ops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_purchasers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_clickers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a WHERE user_id IN (SELECT user_id FROM b))
             AS n_both,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b))
             AS n_either,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a WHERE user_id NOT IN (SELECT user_id FROM b))
             AS n_purchase_only
    """,
)
def agg_bitmap_audience_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience set algebra on bitmaps: |A|, |B|, |A∩B|, |A∪B|,
    |A\\B| for two behavioral audiences (purchasers vs clickers) computed
    as bitwise AND/OR/AND-NOT over the per-bucket 64-bit word tables —
    never a user-level join. This is why a 100 TB platform stores
    audience bitmaps: once each audience is (bucket, word) rows, every
    boolean combination of ANY number of audiences costs one
    bucket-keyed join of vocabulary-sized word tables (64 users per
    row), and the words are the same mergeable partials
    `agg_bitmap_range_merge` stores per day. The oracle recomputes all
    five cardinalities from raw DISTINCT sets — a single wrong bit in
    any word breaks the hash."""
    e = load_table(spark, sf_dir, "events")

    def words(event_type: str, prefix: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .groupBy(F.expr("user_id div 64").alias("bucket"))
            .agg(
                F.expr(
                    "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))"
                ).alias(f"{prefix}_word")
            )
        )

    joined = (
        words("purchase", "a")
        .join(words("click", "b"), "bucket", "full_outer")
        .select(
            F.coalesce("a_word", F.lit(0)).alias("a"),
            F.coalesce("b_word", F.lit(0)).alias("b"),
        )
    )
    return joined.agg(
        F.sum(F.bit_count("a")).cast("bigint").alias("n_purchasers"),
        F.sum(F.bit_count("b")).cast("bigint").alias("n_clickers"),
        F.sum(F.bit_count(F.expr("a & b"))).cast("bigint").alias("n_both"),
        F.sum(F.bit_count(F.expr("a | b"))).cast("bigint").alias("n_either"),
        F.sum(F.bit_count(F.expr("a & ~b"))).cast("bigint").alias("n_purchase_only"),
    )


# --------------------------------------------------------------------------
# agg_filtered_distinct
# --------------------------------------------------------------------------

def _filtered_distinct_sql(strtype: str) -> str:
    return f"""
SELECT CAST(CAST(ts AS DATE) AS {strtype}) AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
         AS purchasers,
       COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'error')
         AS error_users,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
FROM events
GROUP BY CAST(ts AS DATE)
"""


@query("agg_filtered_distinct", oracle=_filtered_distinct_sql("VARCHAR"))
def agg_filtered_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (ANSI SQL:2003): several differently-
    predicated COUNT DISTINCTs and a plain filtered count computed in
    ONE grouped aggregate over one scan — the surface that replaces the
    join-of-five-subqueries formulation of per-day KPI panels.

    Plan behavior under test: multiple DISTINCT aggregates with
    different FILTER predicates force Catalyst's Expand-based rewrite
    (one input row fans to one row per distinct-group), which is the
    documented cost of mixed distincts — still one pass over the fact
    and map-side partial dedup, versus N full scans for the subquery
    form. All counts are exact BIGINTs; day bucketing is CAST(ts AS
    DATE) on both engines (UTC sessions)."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_filtered_distinct_sql("STRING"))


# --------------------------------------------------------------------------
# agg_string_agg
# --------------------------------------------------------------------------


@query(
    "agg_string_agg",
    oracle="""
    SELECT n_name,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
             AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG surface): the
    distinct market segments per nation joined into one '|'-separated,
    lexically-ordered string. Determinism is the whole game for this
    operator: `collect_list` order is partial-aggregation order
    (run-to-run nondeterministic), so the list is DISTINCT'd and
    SORTED inside the aggregate expression before joining —
    `array_join(array_sort(collect_set(x)), '|')` — making the string a
    pure function of the set.

    Scale: group state is the distinct-segment set (bounded, 5 here) —
    safe only because the aggregated domain is enum-like; for unbounded
    domains cap with slice() and record truncation, or the string
    becomes the memory bound."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), "|"
            ).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


# --------------------------------------------------------------------------
# agg_skyline_pareto — 2-D Pareto front (skyline query) over orders
# --------------------------------------------------------------------------
# The skyline operator from the classic Börzsönyi/Kossmann line of work:
# the non-dominated set under (EARLIEST o_orderdate, HIGHEST
# o_totalprice) — "which record-setting orders were not beaten by any
# earlier-or-same-day order". Dominance collapses distributively: the
# front of a union is the front of the per-part fronts, and in 2-D the
# whole computation reduces to a per-date max (one keyed aggregate over
# the fact table) followed by a running max over the CALENDAR-BOUNDED
# daily frame — a date is on the front iff its max price strictly beats
# every earlier date's. Same-day same-price ties survive together
# (mutual non-strict dominance), same-day lower prices are dominated.
#
# Scale: the fact table is touched by ONE map-side-combinable aggregate
# (dates x partitions rows through the shuffle); the ordered window runs
# on ~|dates| rows (calendar-bounded, thousands), and the front joins
# back to orders as a broadcast semi-filter. Prices compare in e2
# fixed-point BIGINT, so dominance is exact in both engines.

_SKY_P = "CAST(FLOOR(o_totalprice * 100) AS BIGINT)"


@query(
    "agg_skyline_pareto",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d, MAX({_SKY_P}) AS pmax
      FROM orders GROUP BY 1
    ),
    run AS (
      SELECT d, pmax,
             MAX(pmax) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      FROM daily
    ),
    front AS (SELECT d, pmax FROM run WHERE prev IS NULL OR pmax > prev)
    SELECT CAST(CAST(f.d AS DATE) AS VARCHAR) AS day,
           f.pmax AS price_e2,
           COUNT(*) AS n_orders,
           MIN(o.o_orderkey) AS min_orderkey
    FROM front f JOIN orders o
      ON o.o_orderdate = f.d AND {_SKY_P} = f.pmax
    GROUP BY f.d, f.pmax
    """,
)
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front over orders (docstring block above): per front
    date the record price (e2 fixed point), how many orders share it,
    and the smallest such orderkey."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    pe2 = F.expr(_SKY_P)
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max(pe2).alias("pmax")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    front = (
        daily.withColumn("prev", F.max("pmax").over(w))
        .filter(F.col("prev").isNull() | (F.col("pmax") > F.col("prev")))
        .select("d", "pmax")
    )
    return (
        o.join(
            F.broadcast(front),
            (o.o_orderdate == front.d) & (pe2 == front.pmax),
        )
        .groupBy("d", "pmax")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("min_orderkey"),
        )
        .select(
            F.col("d").cast("date").cast("string").alias("day"),
            F.col("pmax").alias("price_e2"),
            "n_orders",
            "min_orderkey",
        )
    )


# --------------------------------------------------------------------------
# agg_quantile_partial_merge — mergeable EXACT quantiles from per-day
# histogram partials (the quantile twin of `agg_hll_partial_merge` /
# `agg_bitmap_distinct`'s store-partials-merge-any-range contract)
# --------------------------------------------------------------------------
# Spark exposes no partial-mergeable quantile sketch at the SQL level
# (approx_percentile state is opaque), but the e2-quantized value domain
# makes the EXACT mergeable structure cheap: a per-(key, day) VALUE
# HISTOGRAM (cents -> count). Histograms sum associatively across any
# date range — replay-idempotent per partial, shuffle rows bounded by
# the distinct-value domain, never the event count — and the exact
# quantile reads off the merged histogram's cumulative counts. The
# one-shot `percentile_approx` rides along as a rank-error invariant:
# its epsilon contract (|rank(v) - p*n| <= n/accuracy) is CHECKED, not
# assumed, the `agg_hll_partial_merge` tolerance discipline.

_QPM_ACCURACY = 10_000
_QPM_PCTS = (50, 90, 99)


@query(
    "agg_quantile_partial_merge",
    oracle=f"""
    WITH h AS MATERIALIZED (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    days AS MATERIALIZED (
      SELECT event_type,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_day_partials
      FROM events GROUP BY event_type
    ),
    cum AS MATERIALIZED (
      SELECT event_type, cents,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type,
           (SELECT n_day_partials FROM days d
            WHERE d.event_type = cum.event_type) AS n_day_partials,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           {", ".join(
        f"CAST(MIN(CASE WHEN 100 * cum >= {p} * n THEN cents END) AS BIGINT)"
        f" AS p{p}_cents" for p in _QPM_PCTS)},
           TRUE AS approx_rank_ok
    FROM cum GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_quantile_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 (e2-cents, lower-value-at-ceil(p*n) convention)
    computed by MERGING per-day histogram partials, hash-checked against
    DuckDB's from-scratch cumulative-histogram recomputation — a wrong
    partial, a lost day, or a broken merge shifts a quantile and breaks
    the hash. `approx_rank_ok` certifies the one-shot percentile_approx
    against its own epsilon contract: the returned value's true rank
    interval must lie within n/accuracy + 1 of the target rank (exact
    integer arithmetic over the merged histogram).

    Scale: partial build is one map-combinable (type, day, cents)
    aggregate (shuffle rows ~ distinct values per day-key, not events);
    the merge shuffles histogram rows only; quantile extraction windows
    over the domain-bounded merged histogram — the stat_mad_robust
    collapse-the-fact-first design. Per-day partials persist and any
    date range merges by summation without re-reading events."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    partials = ev.groupBy("event_type", "day", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    merged = partials.groupBy("event_type", "cents").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "cents",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qs = cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        *[
            F.min(
                F.when(100 * F.col("cum") >= p * F.col("n"), F.col("cents"))
            )
            .cast("bigint")
            .alias(f"p{p}_cents")
            for p in _QPM_PCTS
        ],
    )
    days = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("n_day_partials")
    )
    # epsilon certification of the opaque one-shot sketch: rank bounds of
    # the approx value in the exact merged histogram
    approx = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                F.floor(F.col("value") * 100).cast("bigint"),
                [p / 100 for p in _QPM_PCTS],
                _QPM_ACCURACY,
            ).alias("av")
        )
        .select(
            "event_type",
            *[F.col("av")[i].alias(f"a{p}") for i, p in enumerate(_QPM_PCTS)],
        )
    )
    # rank-interval check of each approx value against the exact merged
    # histogram: target rank p*n/100 must fall within n/accuracy + 1 of
    # the value's true rank interval (cum of predecessor, cum of value]
    avals = approx.selectExpr(
        "event_type",
        f"stack({len(_QPM_PCTS)}, "
        + ", ".join(f"{p}, a{p}" for p in _QPM_PCTS)
        + ") AS (p, av)",
    )
    ranks = (
        avals.join(cum, "event_type")
        .groupBy("event_type", "p", "av")
        .agg(
            F.max(F.when(F.col("cents") <= F.col("av"), F.col("cum")))
            .alias("rank_hi"),
            F.max(
                F.when(F.col("cents") < F.col("av"), F.col("cum"))
            ).alias("rank_lo_excl"),
            F.max("n").alias("n"),
        )
        .select(
            "event_type",
            (
                (
                    F.coalesce(F.col("rank_lo_excl"), F.lit(0))
                    <= (F.col("p") * F.col("n") / 100
                        + F.col("n") / _QPM_ACCURACY + 1)
                )
                & (
                    F.coalesce(F.col("rank_hi"), F.lit(0))
                    >= (F.col("p") * F.col("n") / 100
                        - F.col("n") / _QPM_ACCURACY - 1)
                )
            ).alias("ok"),
        )
        .groupBy("event_type")
        .agg((F.sum(F.when(F.col("ok"), 0).otherwise(1)) == 0).alias(
            "approx_rank_ok"
        ))
    )
    return (
        qs.join(days, "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            "n_day_partials",
            "n_rows",
            *[f"p{p}_cents" for p in _QPM_PCTS],
            "approx_rank_ok",
        )
        .orderBy("event_type")
    )


def _event_feed(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Materialize the events table as an n-file parquet feed for the
    streaming partial-ingest path (write_vector_feed discipline: cached,
    a pure function of the input table)."""
    import os as _os

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"eventfeed_{sf_name}_{n_files}")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(path)
    return path


@query(
    "stream_quantile_partials",
    oracle=f"""
    WITH h AS MATERIALIZED (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cum AS MATERIALIZED (
      SELECT event_type, cents,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type,
           CAST(4 AS BIGINT) AS n_partial_batches,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           {", ".join(
        f"CAST(MIN(CASE WHEN 100 * cum >= {p} * n THEN cents END) AS BIGINT)"
        f" AS p{p}_cents" for p in _QPM_PCTS)}
    FROM cum GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_quantile_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING maintenance of the mergeable quantile partials — the
    ingest story of `agg_quantile_partial_merge`, mirroring
    `stream_ivf_ingest`'s contract for the histogram tier: events arrive
    as an unbounded feed (maxFilesPerTrigger=1 -> 4 micro-batches), each
    batch reduces to its own (event_type, cents, cnt) histogram partial
    inside foreachBatch and lands in an idempotent batch=<id> directory
    (overwrite-on-retry = exactly-once by idempotence; the run is
    supervised with a fixed checkpoint). The final read merges ALL
    partials by summation and must reproduce the batch-exact p50/p90/p99
    — SAME quantile convention and hash as the batch twin, proving
    continuous histogram ingest converges to the one-shot build exactly.

    Scale: per-batch state is the batch's distinct-value histogram
    (domain-bounded, KBs); nothing reshuffles prior batches; any date
    range answers quantiles by summing stored partials — the streaming
    completion of the store-partials-merge-any-range contract."""
    from pyspark.sql.window import Window

    from mongodb_cdc_spark.streaming.pipeline import (
        new_scratch_dir,
        run_supervised,
    )

    ev_schema = load_table(spark, sf_dir, "events").schema
    feed = _event_feed(spark, sf_dir)
    target = new_scratch_dir("qpart_target")
    ckpt = new_scratch_dir("qpart_ckpt")

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        (
            bdf.select(
                "event_type",
                F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            )
            .groupBy("event_type", "cents")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("overwrite")
            .parquet(f"{target}/batch={batch_id}")
        )

    def start_query():
        stream = (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        return (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    run_supervised(start_query, max_restarts=2, restart_delay_s=1.0)

    parts = spark.read.parquet(target)
    merged = parts.groupBy("event_type", "cents").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "cents",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    n_batches = parts.select("batch").distinct().count()
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            *[
                F.min(
                    F.when(
                        100 * F.col("cum") >= p * F.col("n"), F.col("cents")
                    )
                )
                .cast("bigint")
                .alias(f"p{p}_cents")
                for p in _QPM_PCTS
            ],
        )
        .select(
            "event_type",
            F.lit(n_batches).cast("bigint").alias("n_partial_batches"),
            "n_rows",
            *[f"p{p}_cents" for p in _QPM_PCTS],
        )
        .orderBy("event_type")
    )
