"""Join operators (SURVEY.md §2B "Joins").

The reference performs joins only implicitly — point lookups against two
collections for reconciliation (js:399-454 ``compareDocuments``: fetch by
``_id`` from source and target, then diff) and an N+1 per-id loop
(js:502-518). Here those become set-based joins; the full-/anti-join pair
is the relational heart of the CDC diff tooling (operators/cdc.py builds
on these).

Scale notes (the 100 TB plan):

* Fact-to-fact equi-joins (orders ⋈ customer at high SF) shuffle both
  sides on the key — Spark picks sort-merge; AQE converts to broadcast
  when a side turns out small, and splits skewed partitions.
* Dimension joins are explicitly ``broadcast()`` — region/nation/customer
  dims stay tiny relative to facts, so the fact side never shuffles.
* The theta/cross joins are constrained to dimension tables (nation,
  region): a Cartesian product over facts would be a plan bug, not an
  operator.
* The as-of join avoids a full event×order blow-up at scale by equi-
  joining on the key first and resolving "latest ≤ ts" with one window
  pass per event — the shuffle is keyed on the join key, and the window
  reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi-join fact ⋈ dimension-ish on custkey; Spark/AQE picks the
    physical strategy (broadcast at test SF, sort-merge at scale)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice", "c_mktsegment"
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim chain with explicit broadcast hints: the customer
    side streams, nation/region ship to every executor — zero shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with/without orders, null-extended on the order side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT o_orderkey, a_price, b_priority
    FROM (SELECT o_orderkey, o_totalprice AS a_price
          FROM orders WHERE o_orderstatus = 'O') a
    FULL OUTER JOIN
         (SELECT o_orderkey, o_orderpriority AS b_priority
          FROM orders WHERE o_totalprice > 150000) b
    USING (o_orderkey)
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference base (grounding for the CDC field-diff,
    js:457-475): two order slices full-outer-joined so rows missing on
    either side null-extend. Spark's USING-style string key coalesces the
    key column exactly like DuckDB's USING."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.col("o_totalprice").alias("a_price")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        "o_orderkey", F.col("o_orderpriority").alias("b_priority")
    )
    return a.join(b, "o_orderkey", "full")


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a semi-join: customers having at least one order. The
    probe side only ships join keys — no payload shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as an anti-join — the reference's "missing-in-target"
    existence check (js:423-431) as one distributed operator. The urgent-
    order predicate keeps the result non-empty at every test SF (an empty
    anti-join would be a vacuous correctness check)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_theta_self",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS regionkey
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def join_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi self-join: unordered nation pairs within a region. The
    equi conjunct (same region) keys the shuffle; the `<` theta conjunct
    is a post-join filter — so this stays a hash/merge join, not a
    Cartesian."""
    n = load_table(spark, sf_dir, "nation")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
        F.col("n1.n_regionkey").alias("regionkey"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — deliberately dimension × dimension only
    (5 × 25); Spark plans BroadcastNestedLoopJoin."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def _asof_carried_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared as-of UNION-SCAN: orders and events interleave as one
    per-user timeline and a running ``last(..., ignorenulls)`` window
    carries the most recent order onto every row. Three load-bearing
    details live HERE and only here (both as-of operators consume this):
    orders sort BEFORE events at equal instants (kind 0 < 1, so
    ``o_orderdate <= ts`` is inclusive), o_orderkey ascends so the
    largest key at a given date wins, and the carried order timestamp is
    taken only from order rows. One shuffle on user_id serves the
    interleave and the window — the naive range-join explodes to
    |events| x avg-orders-per-user rows (~10M at sf0.1, ~4x slower
    measured; catastrophically worse at 100 TB with heavy keys)."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    order_rows = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(0).alias("kind"),  # orders first at equal timestamps (<=)
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    event_rows = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("okey"),
        "event_id",
    )
    timeline = order_rows.unionByName(event_rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").asc(), F.col("okey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return timeline.select(
        "user_id",
        "event_id",
        "kind",
        F.col("t"),
        F.last("okey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last(F.when(F.col("kind") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("asof_t"),
    )


@query(
    "join_asof_latest",
    oracle="""
    SELECT event_id, user_id, asof_orderkey, asof_order_epoch
    FROM (
      SELECT e.event_id, e.user_id,
             o.o_orderkey AS asof_orderkey,
             (epoch_us(o.o_orderdate) // 1000000) AS asof_order_epoch,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark DataFrame asof): each event paired with
    the latest order of that customer with o_orderdate <= ts. See
    :func:`_asof_carried_timeline` for the UNION-SCAN shape and its
    scale argument; this operator keeps only matched events."""
    carried = _asof_carried_timeline(spark, sf_dir)
    return carried.filter(
        (F.col("kind") == 1) & F.col("asof_orderkey").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "asof_orderkey",
        F.to_unix_timestamp("asof_t").cast("bigint").alias("asof_order_epoch"),
    )


_RANGE_BINNED_ORACLE = """
WITH p AS (SELECT event_id, ts FROM events WHERE value > 250)
SELECT p.event_id,
       COUNT(*) AS n_events_1h,
       COUNT(DISTINCT e.user_id) AS n_users_1h
FROM p JOIN events e
  ON (epoch_ns(e.ts) // 1000000000) >= (epoch_ns(p.ts) // 1000000000)
 AND (epoch_ns(e.ts) // 1000000000) <
     (epoch_ns(p.ts) // 1000000000) + 3600
 AND e.event_id <> p.event_id
GROUP BY p.event_id
"""


@query("join_range_binned", oracle=_RANGE_BINNED_ORACLE)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join WITHOUT an equi-key, made scale-safe by binning:
    for each high-value probe event (value > 250), count all events —
    any user — in the hour after it (the anomaly-impact window).

    The naive plan for ``e.sec BETWEEN p.sec AND p.sec + w`` is
    BroadcastNestedLoopJoin / cartesian: O(|probes| x |events|) row
    comparisons, the quadratic trap. The fix is the same banding trick
    the LSH dedups use, applied to time: bin both sides at the window
    width w (bin = sec DIV w), explode each probe to its two candidate
    bins (a w-wide window starting in bin b can only reach rows in b and
    b+1), equi-join on the bin, and refine the exact range inside the
    bin. Every true pair co-occurs in exactly one of the probe's two
    candidate bins, so no dedup pass is needed.

    Scale: the shuffle is keyed on time-bin — burst hours make hot bins,
    which AQE skew-split handles; and because the probe side is a
    filtered sliver, runtime stats usually turn the join into a
    broadcast, removing the event-side shuffle entirely. Comparisons are
    whole-second epochs (integer, exact in both engines — the
    established cross-engine timestamp idiom)."""
    ev = load_table(spark, sf_dir, "events")
    w = 3600
    sec = F.to_unix_timestamp("ts").cast("bigint")
    base = ev.select(
        F.col("event_id"),
        F.col("user_id"),
        sec.alias("sec"),
        F.expr("CAST(to_unix_timestamp(ts) AS BIGINT) DIV 3600").alias("bin"),
    )
    probes = (
        ev.filter(F.col("value") > 250)
        .select(
            F.col("event_id").alias("probe_id"),
            sec.alias("p_sec"),
            F.expr("CAST(to_unix_timestamp(ts) AS BIGINT) DIV 3600").alias(
                "p_bin"
            ),
        )
        .withColumn(
            "bin", F.explode(F.array(F.col("p_bin"), F.col("p_bin") + 1))
        )
    )
    joined = base.join(probes, "bin").filter(
        (F.col("sec") >= F.col("p_sec"))
        & (F.col("sec") < F.col("p_sec") + F.lit(w))
        & (F.col("event_id") != F.col("probe_id"))
    )
    return joined.groupBy(F.col("probe_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_events_1h"),
        F.count_distinct("user_id").alias("n_users_1h"),
    )


_SALTED_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("join_skew_salted", oracle=_SALTED_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically salted equi-join (functions/skew.py
    ``salted_equi_join``), driver-proven equivalent to the plain join:
    the oracle is the UNSALTED join — any row the salting duplicated,
    dropped, or mis-keyed breaks the hash match.

    The mechanism under test is the 100 TB hot-key treatment: the fact
    side's key is sharded into 8 sub-keys via a deterministic hash of the
    row's unique id (never rand() — retried tasks must re-salt
    identically), the dimension side replicated once per shard, so one
    straggler partition becomes 8 even ones. Price sum is fixed-point
    BIGINT (exact in any aggregation order)."""
    from mongodb_cdc_spark.functions.skew import salted_equi_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_equi_join(
        o, c, "o_custkey", "c_custkey", salt_cols="o_orderkey", n_salt=8
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("total_cents"),
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents,
           TRUE AS shuffle_free_join
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join, driver-proven: write orders and
    lineitem bucketed 8 ways on the order key (the one-time ingest
    shuffle), join them with broadcast disabled, and assert from the
    executed plan that the join ran with ZERO Exchange operators — the
    write-once-shuffle-never contract that makes repeated fact-fact joins
    affordable at 100 TB. The plan invariant travels as the
    ``shuffle_free_join`` column so the driver hash-checks it alongside
    the join's actual aggregate (which must equal the plain-scan oracle
    join exactly: any row bucketing duplicated or dropped breaks the
    hash).

    The few-row result is materialized eagerly (same pattern as
    `maintenance_compact`) because the temp bucketed tables are dropped
    before returning."""
    import shutil
    import uuid

    from mongodb_cdc_spark.operators._util import run_parallel

    tag = uuid.uuid4().hex[:12]
    names = {}
    try:
        def bucket_write(name: str, key: str):
            tbl = f"bkt_{name}_{tag}"
            names[name] = tbl
            (
                load_table(spark, sf_dir, name)
                .write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )

        # the two one-time bucketed ingest writes are independent —
        # overlap them (guide §2.6)
        run_parallel(
            lambda: bucket_write("orders", "o_orderkey"),
            lambda: bucket_write("lineitem", "l_orderkey"),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(names["orders"]).join(
                spark.table(names["lineitem"]),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            join_plan = joined._jdf.queryExecution().executedPlan().toString()
            shuffle_free = "Exchange" not in join_plan
            rows = (
                joined.groupBy("o_orderstatus")
                .agg(
                    F.count(F.lit(1)).alias("n_lines"),
                    F.sum(F.expr("CAST(l_quantity * 100 AS BIGINT)"))
                    .cast("bigint")
                    .alias("qty_cents"),
                )
                .collect()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        for tbl in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(
                f"{warehouse.removeprefix('file:')}/{tbl}", ignore_errors=True
            )
    return spark.createDataFrame(
        [(r["o_orderstatus"], r["n_lines"], r["qty_cents"], shuffle_free) for r in rows],
        "o_orderstatus string, n_lines bigint, qty_cents bigint, shuffle_free_join boolean",
    )


@query(
    "join_bloom_pruned",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           TRUE AS bloom_pruned
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter-pruned fact join, driver-proven: lineitem
    joins orders filtered to one priority, with Catalyst's
    InjectRuntimeFilter building a Bloom filter over the selective side's
    join keys and applying ``might_contain`` AT THE FACT SCAN — ~80% of
    lineitem rows die before the shuffle instead of after it. This is the
    100 TB mechanism for "big fact ⋈ selectively-filtered fact" joins
    where neither side broadcasts: the only rows that pay shuffle I/O are
    those that can possibly match.

    The engine's 64 MB broadcast threshold would normally turn this small
    creation side into a broadcast join (which needs no Bloom filter), so
    the operator disables broadcast for the demonstration — at real scale
    the filtered side is out of broadcast range and injection is
    automatic with the engine's default confs. The plan invariant
    (``might_contain`` present in the optimized plan) travels as the
    ``bloom_pruned`` column, hash-checked by the driver next to the join
    aggregate itself, which must exactly equal the plain-join oracle —
    a Bloom false-negative (impossible by construction) or an
    over-aggressive prune would break the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    app_thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    prev_app = spark.conf.get(app_thr)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(app_thr, "0")
    try:
        agg = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"))
                .cast("bigint")
                .alias("price_cents"),
            )
        )
        optimized = agg._jdf.queryExecution().optimizedPlan().toString()
        pruned = "might_contain" in optimized
        rows = agg.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(app_thr, prev_app)
    return spark.createDataFrame(
        [(r["l_returnflag"], r["n_lines"], r["price_cents"], pruned) for r in rows],
        "l_returnflag string, n_lines bigint, price_cents bigint, bloom_pruned boolean",
    )


@query(
    "join_dpp_pruned",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents,
           TRUE AS dpp_pruned
    FROM lineitem
    WHERE EXTRACT(year FROM l_shipdate) = (
            SELECT MIN(EXTRACT(year FROM o_orderdate))
            FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, driver-proven: lineitem is written
    partitioned by ship year (the one-time layout decision), then joined
    to a year value only an AGGREGATE over the dim produces (min urgent
    year) — a value Catalyst cannot constant-fold at plan time, so it
    reuses the dim's broadcast to build a RUNTIME partition filter: the
    fact scan reads one partition directory and never touches the other
    years' files. (With a literal dim predicate on the join key,
    constraint propagation prunes statically — also verified here, but
    that is the easy case; DPP is what survives when the pruning value is
    data.) This is the partition-level complement of
    `join_bloom_pruned`'s row-level prune, and with
    `maintenance_zorder_key` it completes the data-layout story:
    partition for coarse pruning, z-order within partitions for fine
    skipping.

    The plan invariant (``dynamicpruning`` expression present in the
    fact's PartitionFilters) travels as the ``dpp_pruned`` column; the
    aggregate must equal the oracle's plain year-filtered scan exactly,
    so over- or under-pruning breaks the hash. Eager-collect pattern
    (`join_bucketed`): the temp partitioned layout is deleted before
    returning."""
    import shutil
    import uuid

    out = None
    try:
        from mongodb_cdc_spark.sources.changefeed import scratch_root

        out = f"{scratch_root()}/dpp_{uuid.uuid4().hex[:12]}"
        li = load_table(spark, sf_dir, "lineitem")
        li.withColumn("l_year", F.year("l_shipdate")).write.mode(
            "overwrite"
        ).partitionBy("l_year").parquet(out)
        fact = spark.read.parquet(out)
        dim = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .agg(F.min(F.year("o_orderdate")).alias("y"))
        )
        agg = fact.join(dim, fact.l_year == dim.y).agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.expr("CAST(FLOOR(l_quantity * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("qty_cents"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        pruned = "dynamicpruning" in plan.lower()
        rows = agg.collect()
    finally:
        if out:
            shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["n_lines"], r["qty_cents"], pruned) for r in rows],
        "n_lines bigint, qty_cents bigint, dpp_pruned boolean",
    )


# --------------------------------------------------------------------------
# join_asof_tolerance
# --------------------------------------------------------------------------

_ASOF_TOL_S = 7 * 86400  # pandas merge_asof(tolerance=...) semantics


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH latest AS (
      SELECT event_id, asof_orderkey, asof_epoch FROM (
        SELECT e.event_id,
               o.o_orderkey AS asof_orderkey,
               (epoch_us(o.o_orderdate) // 1000000) AS asof_epoch,
               ROW_NUMBER() OVER (
                 PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN (epoch_ns(e.ts) // 1000000000) - l.asof_epoch
                     <= {_ASOF_TOL_S}
                THEN l.asof_orderkey END AS asof_orderkey,
           CASE WHEN (epoch_ns(e.ts) // 1000000000) - l.asof_epoch
                     <= {_ASOF_TOL_S}
                THEN l.asof_epoch END AS asof_order_epoch
    FROM events e LEFT JOIN latest l ON l.event_id = e.event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=7d)``
    semantics): every event keeps the latest order of its customer with
    ``o_orderdate <= ts`` ONLY if that order is at most 7 days old at
    event time; staler matches null out, and every event row survives
    (left semantics). The tolerance is the practically important variant:
    an unbounded as-of joyfully attributes an event to an order from two
    years ago, which is attribution noise in any session/causality
    analysis.

    Shares :func:`_asof_carried_timeline` with `join_asof_latest` (one
    user-keyed shuffle, one running window — never the range-join
    blowup); the tolerance is one integer epoch-difference filter mapped
    over the carried column, so its cost over the unbounded as-of is
    free."""
    carried = _asof_carried_timeline(spark, sf_dir)
    in_tol = (
        F.to_unix_timestamp("t") - F.to_unix_timestamp("asof_t")
    ) <= F.lit(_ASOF_TOL_S)
    return carried.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.when(
            F.col("asof_orderkey").isNotNull() & in_tol, F.col("asof_orderkey")
        ).alias("asof_orderkey"),
        F.when(
            F.col("asof_orderkey").isNotNull() & in_tol,
            F.to_unix_timestamp("asof_t").cast("bigint"),
        ).alias("asof_order_epoch"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT event_id, user_id, nearest_orderkey, delta_s, dir FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey AS nearest_orderkey,
             CAST(ABS((epoch_ns(e.ts) // 1000000000)
               - (epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 1000000))
               AS BIGINT) AS delta_s,
             CASE WHEN (epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 1000000)
                       <= (epoch_ns(e.ts) // 1000000000)
                  THEN 'backward' ELSE 'forward' END AS dir,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY ABS((epoch_ns(e.ts) // 1000000000)
                 - (epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 1000000)) ASC,
                 ((epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 1000000)
                   <= (epoch_ns(e.ts) // 1000000000)) DESC,
                 o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o ON o.o_custkey = e.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join (pandas ``merge_asof(direction='nearest')``):
    each event pairs with its customer's closest order in TIME — past or
    future — by |delta|, ties broken backward-first then largest
    o_orderkey (the `join_asof_latest` keeper rule).

    Scale shape: the `_asof_carried_timeline` UNION-SCAN discipline run
    in BOTH directions — orders and events interleave once on a single
    user_id exchange, an ascending running window carries the latest
    past order and a descending one carries the earliest future order
    (same partitioning: two sorts, ONE shuffle — never the
    events x orders range-join blowup, see _asof_carried_timeline). The
    final pick is a per-row integer comparison of the two carried
    epochs. At equal instants order rows sort before event rows in both
    scans (kind 0 first), making both bounds inclusive; within a tied
    date each carry ends on the max o_orderkey (ascending okey scan
    order), matching the oracle's o_orderkey DESC rank."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    order_rows = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("okey"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    event_rows = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("okey"),
        "event_id",
    )
    timeline = order_rows.unionByName(event_rows).withColumn(
        "es", F.to_unix_timestamp("t").cast("bigint")
    )
    okey_t = F.when(F.col("kind") == 0, F.col("es"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").asc(), F.col("okey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").asc(), F.col("okey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = timeline.select(
        "user_id",
        "event_id",
        "kind",
        "es",
        F.last("okey", ignorenulls=True).over(wb).alias("b_key"),
        F.last(okey_t, ignorenulls=True).over(wb).alias("b_es"),
        F.last("okey", ignorenulls=True).over(wf).alias("f_key"),
        F.last(okey_t, ignorenulls=True).over(wf).alias("f_es"),
    )
    evr = carried.filter(
        (F.col("kind") == 1)
        & (F.col("b_key").isNotNull() | F.col("f_key").isNotNull())
    )
    d_b = F.col("es") - F.col("b_es")  # >= 0 by construction
    d_f = F.col("f_es") - F.col("es")
    pick_b = F.col("f_key").isNull() | (
        F.col("b_key").isNotNull() & (d_b <= d_f)
    )
    return evr.select(
        "event_id",
        "user_id",
        F.when(pick_b, F.col("b_key")).otherwise(F.col("f_key")).alias(
            "nearest_orderkey"
        ),
        F.when(pick_b, d_b).otherwise(d_f).cast("bigint").alias("delta_s"),
        F.when(pick_b, F.lit("backward")).otherwise(F.lit("forward")).alias(
            "dir"
        ),
    )


# --------------------------------------------------------------------------
# join_interval_overlap
# --------------------------------------------------------------------------

_SESS_SQL = """
    marks AS (
      SELECT user_id, event_id,
             (epoch_ns(ts) // 1000000000) AS sec,
             CASE WHEN (epoch_ns(ts) // 1000000000)
                       - LAG(epoch_ns(ts) // 1000000000) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                         ) > 1800
                  OR LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id,
             MIN(sec) AS s_start, MAX(sec) AS s_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM (
        SELECT user_id, sec,
               SUM(is_start) OVER (
                 PARTITION BY user_id ORDER BY sec, event_id
                 ROWS UNBOUNDED PRECEDING
               ) AS sess_no
        FROM marks
      )
      GROUP BY user_id, sess_no
    ),
    incidents AS (
      SELECT event_id AS incident_id,
             (epoch_ns(ts) // 1000000000) AS i_start,
             (epoch_ns(ts) // 1000000000) + 1800 AS i_end
      FROM events
      ORDER BY value DESC, event_id ASC
      LIMIT 50
    )
"""


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH {_SESS_SQL}
    SELECT i.incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users,
           CAST(SUM(s.n_events) AS BIGINT) AS n_events
    FROM incidents i JOIN sess s
      ON s.s_start <= i.i_end AND i.i_start <= s.s_end
    GROUP BY i.incident_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-x-interval overlap join: user sessions (gap > 30 min
    splits, the `win_session_gap` islands) overlapped against incident
    windows (the 30 minutes after each of the top-50 highest-value
    events) — 'which sessions were exposed to each incident?', the
    blast-radius query every on-call postmortem runs.

    Where `join_range_binned` handles POINT-in-window probes at
    unbounded probe cardinality (bin both sides, explode to candidate
    bins), this is the bounded-probe variant: the probe side is top-k
    BY CONSTRUCTION (TakeOrdered, 50 rows), so the engine broadcasts the
    incident intervals and evaluates overlap as a broadcast theta-join —
    zero shuffle on the big side beyond the session build itself, and no
    bin-explosion machinery where a 50-row broadcast is strictly
    cheaper. Variable-length intervals would defeat fixed-width binning
    anyway (a session can span many bins); bounded probes are the
    scale-correct door to interval-interval overlap, and unbounded
    interval pairs hand off to the binned family.

    Determinism: epoch-second integer interval math, total-ordered
    top-50 (value DESC, event_id), exact counts."""
    e = load_table(spark, sf_dir, "events")
    sec = F.to_unix_timestamp("ts").cast("bigint")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = e.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
        F.when(
            F.lag(sec).over(wlag).isNull()
            | ((sec - F.lag(sec).over(wlag)) > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        marks.withColumn("sess_no", F.sum("is_start").over(wrun))
        .groupBy("user_id", "sess_no")
        .agg(
            F.min("sec").alias("s_start"),
            F.max("sec").alias("s_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    incidents = (
        e.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(50)
        .select(
            F.col("event_id").alias("incident_id"),
            sec.alias("i_start"),
            (sec + 1800).alias("i_end"),
        )
    )
    return (
        sess.join(
            F.broadcast(incidents),
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end")),
        )
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
    )
