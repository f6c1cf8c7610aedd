"""CDC-semantic composite operators (SURVEY.md §2B) — batch formulations
of the reference pipeline's runtime behavior, each citing the JS span it
re-expresses. These are where the reference's imperative loops become
set-based distributed plans:

* its per-document reconciliation loop (js:502-518, an N+1 round-trip
  antipattern) becomes one pass of joins + aggregation;
* its upsert replay (js:157-199) becomes a latest-per-key window;
* its health lag check (js:541-605) becomes an aggregate against the
  stream head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import sum2, sum2_sql
from mongodb_cdc_spark.registry import query

# The audit window used by cdc_window_audit / cdc_checkpoint_lag — chosen
# inside the events table's 2024 range at every SF.
_T1 = "2024-01-03 00:00:00"
_T2 = "2024-01-10 00:00:00"


@query(
    "cdc_apply_upsert",
    oracle="""
    SELECT user_id, event_type, value, props,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE event_type IN ('signup', 'click', 'view', 'purchase')
    ) WHERE rn = 1
    """,
)
def cdc_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay an insert/update event log into final table state — the
    whole reference pipeline (R1-R7) as one batch expression: filter the
    op types it keeps (js:159-177 drops deletes; here 'error' events play
    the dropped role), pick the newest event per key (js:171-173 upsert ⇒
    last write wins), project the fullDocument payload."""
    ev = load_table(spark, sf_dir, "events")
    kept = ev.filter(
        F.col("event_type").isin("signup", "click", "view", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "value",
            "props",
            F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
        )
    )


@query(
    "cdc_diff_missing",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND NOT EXISTS (
        SELECT 1 FROM orders t
        WHERE t.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND t.o_orderkey = orders.o_orderkey)
    """,
)
def cdc_diff_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's missing-in-target existence check (js:423-431),
    set-based: source = all orders, target = a stale replica (orders
    before a cutoff); one anti-join finds every document the replica
    lacks — replacing a per-id findOne loop with a single keyed shuffle."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = "1998-01-01 00:00:00"
    source = o.filter(F.col("o_orderdate") >= cutoff)
    target = o.filter(F.col("o_orderdate") < cutoff).select("o_orderkey")
    return source.join(target, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_FIELDWISE_ORACLE = f"""
WITH a AS (
  SELECT o_custkey, {sum2_sql('o_totalprice', 'total')[1]}, COUNT(*) AS n
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY o_custkey
), b AS (
  SELECT o_custkey, {sum2_sql('o_totalprice', 'total')[1]}, COUNT(*) AS n
  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       a.total AS source_total, b.total AS target_total,
       CASE WHEN a.o_custkey IS NULL THEN 'missing-in-source'
            WHEN b.o_custkey IS NULL THEN 'missing-in-target'
            WHEN a.total <> b.total OR a.n <> b.n THEN 'value-mismatch'
            ELSE 'equal' END AS diff_type
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""


@query("cdc_diff_fieldwise", oracle=_FIELDWISE_ORACLE)
def cdc_diff_fieldwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's field-wise diff classifier (js:457-475: union of
    keys -> missing-in-source / missing-in-target / value-mismatch) as a
    relational operator: per-customer aggregates at two cutoffs, full
    outer join on the key, CASE classification. Deliberate divergence
    (SURVEY.md §7.5): equality is typed-value equality, not the JS
    JSON.stringify string comparison."""
    o = load_table(spark, sf_dir, "orders")

    def snapshot(cutoff: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < cutoff)
            .groupBy("o_custkey")
            .agg(sum2("o_totalprice", "total"), F.count(F.lit(1)).alias("n"))
        )

    a = snapshot("1999-01-01 00:00:00").alias("a")
    b = snapshot("2000-01-01 00:00:00").alias("b")
    return a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"), "full").select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("custkey"),
        F.col("a.total").alias("source_total"),
        F.col("b.total").alias("target_total"),
        F.when(F.col("a.o_custkey").isNull(), "missing-in-source")
        .when(F.col("b.o_custkey").isNull(), "missing-in-target")
        .when(
            (F.col("a.total") != F.col("b.total")) | (F.col("a.n") != F.col("b.n")),
            "value-mismatch",
        )
        .otherwise("equal")
        .alias("diff_type"),
    )


@query(
    "cdc_window_audit",
    oracle=f"""
    WITH touched AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts BETWEEN TIMESTAMP '{_T1}' AND TIMESTAMP '{_T2}'
        AND event_type IN ('signup', 'click', 'view', 'purchase')
    )
    SELECT COUNT(*) AS total_documents_compared,
           COUNT(c_custkey) AS documents_found,
           COUNT(*) - COUNT(c_custkey) AS documents_with_differences
    FROM touched LEFT JOIN customer ON user_id = c_custkey
    """,
)
def cdc_window_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's time-window audit (js:478-538): oplog scan in
    [t1, t2] filtered to i/u ops (js:486-496) -> distinct touched ids
    (js:499) -> per-id source/target lookup loop (js:502-518) -> summary
    (js:520-525). The N+1 loop becomes one keyed join of the distinct-id
    set against the `customer` "target"; the summary keeps the reference's
    report shape."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    touched = (
        ev.filter(F.col("ts").between(_T1, _T2))
        .filter(F.col("event_type").isin("signup", "click", "view", "purchase"))
        .select("user_id")
        .distinct()
    )
    joined = touched.join(c, touched.user_id == c.c_custkey, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("total_documents_compared"),
        F.count("c_custkey").alias("documents_found"),
        (F.count(F.lit(1)) - F.count("c_custkey")).alias("documents_with_differences"),
    )


@query(
    "cdc_checkpoint_lag",
    oracle=f"""
    WITH head AS (
      SELECT MAX(ts) AS head_ts FROM events
    )
    SELECT user_id,
           (epoch_ns(MAX(ts)) // 1000000000) AS last_seen_epoch,
           (epoch_ns((SELECT head_ts FROM head)) // 1000000000)
             - (epoch_ns(MAX(ts)) // 1000000000) AS lag_s,
           ((epoch_ns((SELECT head_ts FROM head)) // 1000000000)
             - (epoch_ns(MAX(ts)) // 1000000000) < 300) AS healthy
    FROM events
    GROUP BY user_id
    """,
)
def cdc_checkpoint_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's replication-lag health check (js:541-605): lag =
    now - last checkpoint timestamp, unhealthy past 300 s (js:557). Batch
    formulation: per-key last-seen vs the stream head (global max ts).
    The head is a 1-row aggregate broadcast into a cross join — no
    repeated subquery scans."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.agg(F.to_unix_timestamp(F.max("ts")).cast("bigint").alias("head_epoch"))
    per_user = ev.groupBy("user_id").agg(
        F.to_unix_timestamp(F.max("ts")).cast("bigint").alias("last_seen_epoch")
    )
    return per_user.crossJoin(F.broadcast(head)).select(
        "user_id",
        "last_seen_epoch",
        (F.col("head_epoch") - F.col("last_seen_epoch")).alias("lag_s"),
        ((F.col("head_epoch") - F.col("last_seen_epoch")) < 300).alias("healthy"),
    )


@query(
    "cdc_schema_drift",
    oracle="""
    WITH docs AS (
      SELECT event_type,
             CAST(ts AS DATE) - DATE '1970-01-01' AS epoch_day,
             CASE event_id % 3
               WHEN 0 THEN json_object('amount', value)
               WHEN 1 THEN json_object('amount', value, 'uid', user_id)
               ELSE json_object('amount', value, 'uid', user_id,
                                'kind', event_type)
             END AS doc
      FROM events
    ), fields AS (
      SELECT event_type, epoch_day, unnest(json_keys(doc)) AS field
      FROM docs
    ), totals AS (
      SELECT event_type, COUNT(*) AS total FROM events GROUP BY event_type
    )
    SELECT f.event_type,
           field,
           COUNT(*) AS n_present,
           CAST(COUNT(*) * 1000000 // t.total AS BIGINT) AS coverage_ppm,
           CAST(MIN(epoch_day) AS INT) AS first_seen_day,
           CAST(MAX(epoch_day) AS INT) AS last_seen_day
    FROM fields f JOIN totals t USING (event_type)
    GROUP BY f.event_type, field, t.total
    """,
)
def cdc_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift registry over ragged change documents — the audit a
    schemaless CDC source (the reference's BSON events, js:157-165,
    carry whatever fields the writer sent) needs when the upstream
    document shape evolves: per (collection-ish event_type, field) the
    presence count, coverage fraction, and first/last day the field was
    seen. Three deterministic document versions are synthesized from the
    fixture (v0 {amount}, v1 +uid, v2 +kind — keyed off event_id so both
    engines build byte-identical JSON), and field discovery runs through
    the real JSON-introspection surface (`json_object_keys` /
    `json_keys`), not a hardcoded field list.

    Scale shape: key explosion is map-side (fan-out = fields per doc,
    small constant); the audit aggregate shuffles (event_type, field)
    pairs — schema-registry-sized, not corpus-sized. The per-type totals
    join broadcasts. Coverage is integer ppm; days are epoch-day INTs
    (timestamps never reach the hashed output)."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.expr(
        """
        CASE event_id % 3
          WHEN 0 THEN to_json(struct(value AS amount))
          WHEN 1 THEN to_json(struct(value AS amount, user_id AS uid))
          ELSE to_json(struct(value AS amount, user_id AS uid,
                              event_type AS kind))
        END
        """
    )
    docs = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("epoch_day"),
        doc.alias("doc"),
    )
    fields = docs.select(
        "event_type",
        "epoch_day",
        F.explode(F.json_object_keys("doc")).alias("field"),
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("total"))
    return (
        fields.groupBy("event_type", "field")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.min("epoch_day").alias("first_day"),
            F.max("epoch_day").alias("last_day"),
        )
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "field",
            "n_present",
            F.expr("CAST(n_present * 1000000 DIV total AS BIGINT)").alias(
                "coverage_ppm"
            ),
            F.col("first_day").cast("int").alias("first_seen_day"),
            F.col("last_day").cast("int").alias("last_seen_day"),
        )
    )


@query(
    "cdc_apply_tombstone",
    oracle="""
    SELECT user_id, event_type, value,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_apply_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full delete semantics the reference deliberately lacks (js:159-177
    drops delete events before applying): replay the feed treating
    'error' events as tombstones — a key whose LATEST event is a
    tombstone is absent from final state; a later upsert re-creates it.
    One ordered pass: latest-event-per-key window (same single keyed
    shuffle as `cdc_apply_upsert`), then the tombstone filter on the
    survivor row — never a join against a deletes list, which would
    double-scan the feed and still miss delete-then-reinsert ordering.

    At scale this is the compaction rule a log-structured CDC target
    applies at read/merge time (tombstones retained until compaction
    horizon); the filter costs nothing extra on top of the compaction
    window the upsert path already pays."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            "event_type",
            "value",
            F.expr("CAST(to_unix_timestamp(ts) AS BIGINT)").alias("ts_epoch"),
        )
    )


@query(
    "cdc_scd2_history",
    oracle="""
    WITH ops AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN event_type = 'error' THEN 'delete'
                  WHEN ROW_NUMBER() OVER w = 1 THEN 'insert'
                  ELSE 'update' END AS op,
             LEAD(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS version_no,
           event_type, value,
           (epoch_ns(ts) // 1000000000) AS valid_from_epoch,
           (epoch_ns(next_ts) // 1000000000) AS valid_to_epoch
    FROM ops WHERE op <> 'delete'
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the change feed: every
    insert/update becomes a VERSION with a validity interval
    [valid_from, valid_to); the next operation on the key — including a
    tombstone — closes the previous version; the newest version of a
    live key stays open (NULL valid_to). This is the history table a
    warehouse keeps next to the reference's latest-state collection
    (js:157-199 only materializes the fixpoint; SCD2 is what its users
    reconstruct when they ask "what did this document say on Tuesday").

    One keyed shuffle total: the op classification, the LEAD that closes
    intervals, and the version numbering are three window functions over
    the SAME (user_id)-partitioned sort, which Catalyst plans as a
    single exchange + sort with stacked WindowExecs. Nothing global, no
    self-join of the feed against itself (the naive interval build)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ops = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", "delete")
        .when(F.row_number().over(w) == 1, "insert")
        .otherwise("update")
        .alias("op"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        ops.filter(F.col("op") != "delete")
        .withColumn("version_no", F.row_number().over(w))
        .select(
            "user_id",
            F.col("version_no").cast("bigint"),
            "event_type",
            "value",
            F.to_unix_timestamp("ts").cast("bigint").alias("valid_from_epoch"),
            F.to_unix_timestamp("next_ts").cast("bigint").alias("valid_to_epoch"),
        )
    )


@query(
    "cdc_point_in_time",
    oracle=f"""
    SELECT user_id, event_type, value,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '{_T2}'
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: reconstruct table state AS OF an instant by replaying
    only the ops at-or-before it — latest-event-per-key over the
    truncated feed, tombstone-aware (a key whose last pre-T op is a
    delete is absent at T). Pairs with `cdc_scd2_history`: this is the
    point query the interval table answers with a range predicate, run
    directly against the raw feed.

    The time predicate is a plain pushed-down parquet filter, so the
    window's keyed shuffle only carries pre-T rows — at 100 TB with
    date-partitioned feed storage this prunes whole partitions before
    any shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts") <= F.lit(_T2))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            "event_type",
            "value",
            F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
        )
    )


@query(
    "cdc_idempotency_audit",
    oracle="""
    WITH kept AS (
      SELECT user_id, event_id, ts, event_type, value FROM events
      WHERE event_type IN ('signup', 'click', 'view', 'purchase')
    ),
    replayed AS (
      SELECT * FROM kept UNION ALL SELECT * FROM kept
    ),
    once AS (
      SELECT user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn FROM kept)
      WHERE rn = 1
    ),
    twice AS (
      SELECT user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn FROM replayed)
      WHERE rn = 1
    )
    SELECT (SELECT COUNT(*) FROM once) AS n_keys,
           (SELECT COUNT(*) FROM
              ((SELECT * FROM once EXCEPT SELECT * FROM twice)
               UNION ALL
               (SELECT * FROM twice EXCEPT SELECT * FROM once))) AS n_diff,
           (SELECT COUNT(*) FROM
              ((SELECT * FROM once EXCEPT SELECT * FROM twice)
               UNION ALL
               (SELECT * FROM twice EXCEPT SELECT * FROM once))) = 0
             AS idempotent
    """,
)
def cdc_idempotency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9's replay-safety contract as a driver-checkable query: apply the
    kept event log ONCE and TWICE (bag-doubled input) through the
    latest-per-key upsert semantics and prove the two final states are
    identical — at-least-once delivery + idempotent apply = exactly-once
    effect, the exact claim the reference makes for itself (js:114-115
    "may cause duplication of records on restart" + js:171-173 upsert).
    The streaming harness proves it under a real trigger
    (tests/test_streaming.py replay tests); this operator proves it as a
    hashed cross-engine row so every CORRECTNESS round re-audits the
    contract.

    Determinism note: the replayed log duplicates every (ts, event_id)
    pair, so row_number picks between TRUE TIES — safe here precisely
    because the upsert projects only payload columns, which are equal
    for tied duplicates; value is compared in exact cents. Scale: two
    keyed window passes and two anti-joins, all on the same user_id
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    kept = ev.filter(
        F.col("event_type").isin("signup", "click", "view", "purchase")
    ).select("user_id", "event_id", "ts", "event_type", "value")

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "event_type",
                F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("value_cents"),
            )
        )

    once = latest(kept)
    twice = latest(kept.unionByName(kept))
    sym_diff = once.exceptAll(twice).unionByName(twice.exceptAll(once))
    n_keys = once.count()
    n_diff = sym_diff.count()
    return spark.createDataFrame(
        [(n_keys, n_diff, n_diff == 0)],
        "n_keys bigint, n_diff bigint, idempotent boolean",
    )


@query(
    "cdc_resume_gap_detect",
    oracle="""
    WITH feed AS (
      SELECT event_id FROM events WHERE event_id % 97 <> 13
    ),
    bounds AS (
      SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM feed
    ),
    buckets AS (
      SELECT event_id // 1000 AS bucket, COUNT(*) AS n_present
      FROM feed GROUP BY 1
    )
    SELECT bucket,
           CAST(n_present AS BIGINT) AS n_present,
           CAST(LEAST(hi, bucket * 1000 + 999) - GREATEST(lo, bucket * 1000)
                + 1 - n_present AS BIGINT) AS n_missing
    FROM buckets CROSS JOIN bounds
    WHERE LEAST(hi, bucket * 1000 + 999) - GREATEST(lo, bucket * 1000)
          + 1 - n_present > 0
    """,
)
def cdc_resume_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit: find WHERE the resume-token stream has
    holes. The reference's at-least-once contract (js:114-115) tolerates
    replays but silently losing tokens is the failure mode its health
    check cannot see (js:541-605 only measures lag). The feed here
    deterministically drops every event_id ≡ 13 (mod 97) to stand in
    for lost tokens; detection is PURELY ARITHMETIC — bucket the id
    space into 1000-wide ranges, count per bucket, and compare with the
    bucket's intersection with [min, max]: `expected - present > 0`
    flags every hole, including bucket-edge and whole-bucket gaps. No
    window function, no self-join, no sort: one keyed count shuffle plus
    a broadcast 1-row bounds frame — the gap scan stays linear at any
    token volume, where the lag(token)-based formulation would need a
    GLOBAL ordered window (single-task sort, dead at 100 TB)."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    feed = ev.filter((F.col("event_id") % 97) != 13)
    bounds = feed.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    buckets = feed.groupBy(F.expr("event_id div 1000").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_present")
    )
    j = buckets.crossJoin(F.broadcast(bounds))
    expected = (
        F.least(F.col("hi"), F.col("bucket") * 1000 + 999)
        - F.greatest(F.col("lo"), F.col("bucket") * 1000)
        + 1
    )
    return (
        j.withColumn("n_missing", (expected - F.col("n_present")).cast("bigint"))
        .filter(F.col("n_missing") > 0)
        .select("bucket", F.col("n_present").cast("bigint").alias("n_present"), "n_missing")
    )


@query(
    "cdc_bootstrap_sync",
    oracle="""
    SELECT user_id, event_type,
           CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
           (epoch_ns(ts) // 1000000000) AS ts_epoch
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type <> 'error'
    ) WHERE rn = 1
    """,
)
def cdc_bootstrap_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC bootstrap: initial snapshot + incremental tail. A real
    deployment cannot replay history from t=0 — it takes a SNAPSHOT of
    the source state at cutover time t0, then applies only the change
    stream after t0 (the reference does exactly this when started with
    --start-time against an already-populated target, js:213-216 +
    js:226-232). The classic bug class is the seam: events straddling t0
    double-applied or lost. Here both phases are computed and merged:
    snapshot = latest-per-key at t0 (mid-way through the data),
    tail = events after t0, final = latest-per-key over
    (snapshot ∪ tail) — each phase a keyed window on the SAME user_id
    partitioning, so the merge adds no extra shuffle beyond the union.
    The oracle is the latest-per-key over ALL events: bootstrap + tail
    must be indistinguishable from full-history replay, which is the
    correctness definition of a cutover. Snapshot rows carry a sentinel
    token ordering BELOW any real tail event at the same timestamp, so
    a tail event with ts == t0 wins over the snapshot row it superseded
    (at-least-once across the seam, resolved by idempotent latest-wins
    — never double-applied, never lost)."""
    t0 = "2024-01-15 00:00:00"
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    )

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    snapshot = latest(ev.filter(F.col("ts") <= F.lit(t0))).withColumn(
        # snapshot rows replay as "older than any tail event with the
        # same ts": event_id -1 sorts below every real id
        "event_id",
        F.lit(-1).cast("bigint"),
    )
    tail = ev.filter(F.col("ts") > F.lit(t0))
    final = latest(
        snapshot.select("user_id", "event_id", "ts", "event_type", "value")
        .unionByName(tail.select("user_id", "event_id", "ts", "event_type", "value"))
    )
    return final.select(
        "user_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("value_cents"),
        F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
    )


# --------------------------------------------------------------------------
# cdc_dbhash_buckets
# --------------------------------------------------------------------------

_DBHASH_ROW = (
    "md5(concat_ws('|', CAST(user_id AS STRING), event_type, "
    "CAST(CAST(FLOOR(value * 100) AS BIGINT) AS STRING), "
    "CAST(ts_epoch AS STRING)))"
)


@query(
    "cdc_dbhash_buckets",
    oracle="""
    WITH src AS (
      SELECT user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
             (epoch_ns(ts) // 1000000000) AS ts_epoch
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    tgt AS (
      SELECT user_id, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
             (epoch_ns(ts) // 1000000000) AS ts_epoch
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('signup', 'click', 'view', 'purchase')
      ) WHERE rn = 1
    ),
    sh AS (
      SELECT user_id % 64 AS bucket,
             md5(concat_ws('|', CAST(user_id AS VARCHAR), event_type,
                 CAST(value_cents AS VARCHAR), CAST(ts_epoch AS VARCHAR)))
               AS h
      FROM src
    ),
    th AS (
      SELECT user_id % 64 AS bucket,
             md5(concat_ws('|', CAST(user_id AS VARCHAR), event_type,
                 CAST(value_cents AS VARCHAR), CAST(ts_epoch AS VARCHAR)))
               AS h
      FROM tgt
    ),
    sb AS (
      SELECT bucket, COUNT(*) AS n_src,
             md5(string_agg(h, '' ORDER BY h)) AS src_hash
      FROM sh GROUP BY bucket
    ),
    tb AS (
      SELECT bucket, COUNT(*) AS n_tgt,
             md5(string_agg(h, '' ORDER BY h)) AS tgt_hash
      FROM th GROUP BY bucket
    )
    SELECT sb.bucket, n_src,
           COALESCE(n_tgt, 0) AS n_tgt,
           src_hash, COALESCE(tgt_hash, '') AS tgt_hash,
           CAST(CASE WHEN src_hash = COALESCE(tgt_hash, '')
                THEN 1 ELSE 0 END AS BIGINT) AS is_match
    FROM sb LEFT JOIN tb ON sb.bucket = tb.bucket
    ORDER BY sb.bucket
    """,
)
def cdc_dbhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-partitioned replication verification — the dbHash/collection-
    checksum pattern (the set-based answer to the reference's per-
    document reconciliation loop, js:502-518): source state and replayed
    target state each reduce to ONE digest per hash bucket, and only
    mismatched buckets ever need row-level diffing. Source = latest
    event per user over ALL op types; target = the pipeline's replay,
    which drops 'error' events — so buckets containing a user whose
    latest op was dropped surface as is_match = 0 with their row-count
    delta, and matching buckets prove equality without moving any rows.

    Determinism: the row digest hashes a canonical '|'-joined projection
    (cents-floored value, epoch seconds), and the bucket digest hashes
    the SORTED concatenation of row digests — order-insensitive under
    parallel aggregation on both engines. Scale: rows shuffle once on
    (bucket) carrying 32-byte digests, not payloads; 64 buckets here,
    O(rows/bucket) memory for the sorted concat — at 100 TB raise the
    bucket count (fan the modulus out) or swap the concat for a
    commutative XOR/sum digest, same contract either way."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest_state(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "event_type",
                "value",
                F.to_unix_timestamp("ts").cast("bigint").alias("ts_epoch"),
            )
        )

    def bucket_digest(df: DataFrame, n_col: str, h_col: str) -> DataFrame:
        hashed = df.select(
            (F.col("user_id") % 64).alias("bucket"),
            F.expr(_DBHASH_ROW).alias("h"),
        )
        return hashed.groupBy("bucket").agg(
            F.count("*").alias(n_col),
            F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias(
                h_col
            ),
        )

    sb = bucket_digest(latest_state(ev), "n_src", "src_hash")
    tb = bucket_digest(
        latest_state(
            ev.filter(
                F.col("event_type").isin("signup", "click", "view", "purchase")
            )
        ),
        "n_tgt",
        "tgt_hash",
    )
    return (
        sb.join(tb, "bucket", "left")
        .select(
            "bucket",
            "n_src",
            F.coalesce("n_tgt", F.lit(0)).cast("bigint").alias("n_tgt"),
            "src_hash",
            F.coalesce("tgt_hash", F.lit("")).alias("tgt_hash"),
            F.when(F.col("src_hash") == F.coalesce("tgt_hash", F.lit("")), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_match"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# cdc_snapshot_time_travel
# --------------------------------------------------------------------------


@query(
    "cdc_snapshot_time_travel",
    oracle="""
    WITH cut AS (SELECT MAX(event_id) // 2 AS c FROM events),
    v1 AS (
      SELECT user_id, event_id
      FROM (
        SELECT user_id, event_id, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type <> 'error' AND event_id <= (SELECT c FROM cut)
      ) WHERE rn = 1
    ),
    v2 AS (
      SELECT user_id, event_id
      FROM (
        SELECT user_id, event_id, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type <> 'error'
      ) WHERE rn = 1
    )
    SELECT
      (SELECT COUNT(*) FROM v1) AS n_keys_v1,
      (SELECT COUNT(*) FROM v2) AS n_keys_v2,
      (SELECT COUNT(*) FROM v2 LEFT JOIN v1 USING (user_id)
        WHERE v1.event_id IS NULL) AS n_inserts,
      (SELECT COUNT(*) FROM v2 JOIN v1 USING (user_id)
        WHERE v2.event_id <> v1.event_id) AS n_updates
    """,
)
def cdc_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-format seam, driver-checked end-to-end: the change feed
    is MERGEd into the bundled bucketed target in two halves (cut at
    half the max event id), producing two committed snapshot manifests;
    the result row is then computed FROM the target itself — key counts
    via VERSION-AS-OF reads of both snapshots and insert/update counts
    via the manifest diff (which reads only buckets whose manifest entry
    changed). The oracle recomputes the same four numbers relationally
    from raw events, so the driver hash certifies the whole
    write->snapshot->time-travel->diff path, not just a query.

    Scale: each merge is O(batch + touched buckets) (upsert.py design);
    the diff is O(changed buckets). The snapshot log is the
    Delta/Iceberg commit-log concept on the bundled target — same
    contract, jar-free. Citation: generalizes the reference's replay
    safety + reconciliation (js:114-115, js:457-475) into versioned
    point-in-time auditability."""
    from mongodb_cdc_spark.sources.changefeed import derive_change_log
    from mongodb_cdc_spark.streaming.pipeline import new_scratch_dir
    from mongodb_cdc_spark.streaming.upsert import (
        ParquetUpsertTarget,
        upsert_projection,
    )

    feed = derive_change_log(spark, sf_dir)
    cut = feed.agg(
        F.expr("CAST(MAX(CAST(_id AS BIGINT)) div 2 AS BIGINT)")
    ).first()[0]
    cut_id = f"{cut:012d}"
    import shutil

    target = ParquetUpsertTarget(
        new_scratch_dir("snapshot_tt_target"), keep_versions=8
    )
    try:
        target.merge_batch(
            upsert_projection(feed.filter(F.col("_id") <= cut_id)), 0
        )
        target.merge_batch(
            upsert_projection(feed.filter(F.col("_id") > cut_id)), 1
        )
        v1, v2 = target.snapshots()[0], target.snapshots()[-1]
        n1 = target.read_snapshot(spark, v1).count()
        n2 = target.read_snapshot(spark, v2).count()
        diff = (
            target.snapshot_diff(spark, v1, v2)
            .groupBy("change")
            .agg(F.count("*").alias("n"))
        )
        counts = {r["change"]: r["n"] for r in diff.collect()}
    finally:
        # every number is materialized above (or the op failed), so the
        # scratch target never outlives the call
        shutil.rmtree(target.path, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n1,
                n2,
                int(counts.get("insert", 0)),
                int(counts.get("update", 0)),
            )
        ],
        "n_keys_v1 bigint, n_keys_v2 bigint, n_inserts bigint, n_updates bigint",
    )


# --------------------------------------------------------------------------
# cdc_ivm_aggregate
# --------------------------------------------------------------------------


@query(
    "cdc_ivm_aggregate",
    oracle="""
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE event_type <> 'error'
    GROUP BY user_id, event_type
    """,
)
def cdc_ivm_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-(user, type) COUNT/SUM
    materialized view maintained by DELTA APPLICATION — the feed is
    split in half, each half reduces to partial aggregates, and the
    view is the key-wise merge of partials (full-outer join, null-safe
    adds). The oracle aggregates the raw events directly, so the driver
    hash certifies the IVM identity agg(all) == merge(agg(half1),
    agg(half2)) — the self-maintainability property that lets a 100 TB
    warehouse keep aggregates current by touching only each batch's
    delta (COUNT/SUM are abelian-group aggregates: merge is +, no
    re-read of history; contrast MIN/MAX under deletes, which are NOT
    self-maintainable and need the base table).

    Scale: each delta aggregate is map-combinable and shuffles once on
    the view key; the merge join is keyed identically, so a maintained
    view reuses one partitioning end-to-end — this is what
    foreachBatch + MERGE does to a real materialized view per
    micro-batch (streaming/upsert.py applies the same idea to
    latest-per-key instead of group aggregates)."""
    from mongodb_cdc_spark.sources.changefeed import derive_change_log

    feed = derive_change_log(spark, sf_dir).filter(
        F.col("operationType").isin("insert", "update")
    )
    cut = feed.agg(
        F.expr("CAST(MAX(CAST(_id AS BIGINT)) div 2 AS BIGINT)")
    ).first()[0]
    cut_id = f"{cut:012d}"

    def delta_agg(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col("documentKey._id").alias("user_id"),
                F.col("fullDocument.event_type").alias("event_type"),
                F.expr(
                    "CAST(FLOOR(fullDocument.value * 100) AS BIGINT)"
                ).alias("vc"),
            )
            .groupBy("user_id", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("vc").cast("bigint").alias("value_cents"),
            )
        )

    d1 = delta_agg(feed.filter(F.col("_id") <= cut_id))
    d2 = delta_agg(feed.filter(F.col("_id") > cut_id))
    merged = d1.alias("a").join(
        d2.alias("b"),
        ["user_id", "event_type"],
        "full_outer",
    )
    return merged.select(
        "user_id",
        "event_type",
        (
            F.coalesce(F.col("a.n_events"), F.lit(0))
            + F.coalesce(F.col("b.n_events"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_events"),
        (
            F.coalesce(F.col("a.value_cents"), F.lit(0))
            + F.coalesce(F.col("b.value_cents"), F.lit(0))
        )
        .cast("bigint")
        .alias("value_cents"),
    )


# --------------------------------------------------------------------------
# cdc_ivm_join
# --------------------------------------------------------------------------


@query(
    "cdc_ivm_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def cdc_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the bilinearity
    identity that lets a CDC pipeline keep `lineitem JOIN orders`
    current without re-joining history: with each table split into
    (base, delta) by arrival, join(L, O) decomposes EXACTLY into
    base_L JOIN base_O (the stored view's state)
    UNION delta_L JOIN base_O UNION base_L JOIN delta_O
    UNION delta_L JOIN delta_O (the three delta terms a batch applies).
    The engine materializes the four quadrant joins, reduces each to
    per-priority partial aggregates, and merges the partials; the
    oracle aggregates the flat join — the driver hash certifies the
    decomposition. Arrival splits are seeded row hashes (lineitem by
    (l_orderkey, l_linenumber), orders by o_orderkey) so the quadrants
    cut ACROSS join keys — every joined pair lands in exactly one
    quadrant, all four are non-trivial, and the fixture is
    deterministic.

    Scale: this is the Materialize/differential-dataflow contract on
    Spark terms — per batch only the three delta terms run (delta x
    base, base x delta, delta x delta), each a keyed equi-join whose
    small side is batch-sized (broadcast or bloom-pruned at 100 TB),
    and the view merge is a key-wise abelian add that reuses the view's
    partitioning (`cdc_ivm_aggregate` is the aggregate half of the same
    story). The base x base term here stands in for the stored view
    and is computed once only because a registry query has no
    cross-invocation state; production persists it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(
            "pmod(xxhash64(l_orderkey, l_linenumber, 'ivm-l'), 2)"
        ).alias("arr"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("pmod(xxhash64(o_orderkey, 'ivm-o'), 2)").alias("arr"),
    )

    def quadrant(l_side: DataFrame, o_side: DataFrame) -> DataFrame:
        return (
            l_side.join(
                o_side, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("revenue_cents"),
            )
        )

    l1, dl = li.filter("arr = 0").drop("arr"), li.filter("arr = 1").drop("arr")
    o1, do = o.filter("arr = 0").drop("arr"), o.filter("arr = 1").drop("arr")
    partials = (
        quadrant(l1, o1)        # stored view state
        .unionByName(quadrant(dl, o1))   # delta_L x base_O
        .unionByName(quadrant(l1, do))   # base_L x delta_O
        .unionByName(quadrant(dl, do))   # delta_L x delta_O
    )
    return partials.groupBy("o_orderpriority").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
    )


# --------------------------------------------------------------------------
# cdc_referential_audit — cross-collection consistency after partial sync
# --------------------------------------------------------------------------
# The reference's compare tool diffs ONE collection against its replica
# (js:399-538). A replication pipeline that carries RELATED collections
# (orders + their lineitems) needs the cross-collection check too:
# children whose parent never landed are silent corruption no per-table
# diff can see. Simulated partial replication (orders ≡0 mod 50 dropped,
# the cdc_diff_missing trick) makes every count a non-vacuous,
# data-dependent assertion: the audit must find EXACTLY the orphans the
# injected gap implies.


@query(
    "cdc_referential_audit",
    oracle="""
    WITH repl AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 50 <> 0
    ),
    orph AS (
      SELECT l.l_orderkey FROM lineitem l
      LEFT JOIN repl r ON l.l_orderkey = r.o_orderkey
      WHERE r.o_orderkey IS NULL
    ),
    childless AS (
      SELECT r.o_orderkey FROM repl r
      LEFT JOIN lineitem l ON l.l_orderkey = r.o_orderkey
      WHERE l.l_orderkey IS NULL
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_source_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM repl) AS n_replicated_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orph) AS n_orphan_rows,
      (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM orph)
        AS n_orphan_parents,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM childless)
        AS n_childless_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM repl) * 10000
        // (SELECT COUNT(*) FROM orders) AS coverage_bp
    """,
)
def cdc_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of a partially-replicated target
    (docstring block above): orphaned child rows / distinct missing
    parents via LEFT ANTI join, childless parents via the reverse anti,
    and the parent-coverage ratio in basis points.

    Scale: both directions are single keyed anti-joins (the missing-side
    relation collapses to its key column first, so the shuffle carries
    8-byte keys); all counts are map-combinable. This is the shape you
    schedule after every bootstrap/backfill at 100 TB — it reads the two
    fact tables once each, no window, no driver-side rows beyond the
    1-row summary."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    repl = o.filter(F.pmod(F.col("o_orderkey"), F.lit(50)) != 0).select(
        "o_orderkey"
    )
    orph = li.select("l_orderkey").join(
        repl, li.l_orderkey == repl.o_orderkey, "left_anti"
    )
    childless = repl.join(
        li.select("l_orderkey").distinct(),
        repl.o_orderkey == F.col("l_orderkey"),
        "left_anti",
    )
    n_src = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_source_orders"))
    n_repl = repl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicated_orders")
    )
    n_li = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitem"))
    n_orph = orph.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orphan_rows"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orphan_parents"),
    )
    n_child = childless.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_childless_orders")
    )
    return (
        n_src.crossJoin(F.broadcast(n_repl))
        .crossJoin(F.broadcast(n_li))
        .crossJoin(F.broadcast(n_orph))
        .crossJoin(F.broadcast(n_child))
        .select(
            "n_source_orders",
            "n_replicated_orders",
            "n_lineitem",
            "n_orphan_rows",
            "n_orphan_parents",
            "n_childless_orders",
            F.expr(
                "n_replicated_orders * 10000 div n_source_orders"
            ).alias("coverage_bp"),
        )
    )


# --------------------------------------------------------------------------
# cdc_ivm_topk — incrementally maintained top-k (leaderboard) under CDC
# deltas, with the candidate-buffer trick and a hash-checked recompute
# parity proof
# --------------------------------------------------------------------------
# Top-k is the classic NOT-trivially-self-maintainable view: a delta can
# promote any touched key into the top, so naive maintenance re-reads
# the world. The standard fix (and this operator's content): rank by a
# MONOTONE aggregate (event count — every insert/update adds 1, never
# subtracts), keep a candidate buffer of the previous top-K' (K' = 5k),
# and maintain the view from buffer ∪ delta-touched keys only — under
# monotone growth an untouched key outside the old buffer can never
# climb past the old k-th count. Tie-boundary honesty: a tie at the
# final k-th count could in principle admit an untouched just-outside-
# buffer key by tiebreak; the operator therefore CHECKS the incremental
# result against a full recompute set-wise and emits the verdict as a
# hashed boolean — if the boundary ever bites, the driver row goes red
# loudly instead of silently serving a wrong leaderboard.

_IVM_TOPK = 10
_IVM_TOPK_BUFFER = 50


def ivm_rank_top(view: DataFrame, k: int = _IVM_TOPK) -> DataFrame:
    """Top-K leaderboard rows of a (user_id, n_events, value_cents) view
    WITHOUT a view-sized global window: ``orderBy().limit(k)`` plans as
    TakeOrderedAndProject (per-partition heaps merged at the driver — no
    single-task sort of the whole view, which is user-cardinality and
    unbounded at 100 TB); ``row_number`` then ranks the k-row result
    only, so the unpartitioned window never sees more than k rows. Same
    output as rank-then-filter (the order is total: n_events desc,
    user_id asc unique). Module-level so both IVM top-k maintainers
    share it and tests/test_plans.py can pin its physical shape."""
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    return (
        view.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(k)
        .select(
            F.row_number().over(w).alias("rk"),
            "user_id",
            "n_events",
            "value_cents",
        )
    )


@query(
    "cdc_ivm_topk",
    oracle=f"""
    WITH totals AS MATERIALIZED (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM events WHERE event_type <> 'error'
      GROUP BY user_id
    )
    SELECT rk, user_id, n_events, value_cents, TRUE AS ivm_matches_recompute
    FROM (
      SELECT user_id, n_events, value_cents,
             ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id ASC) AS rk
      FROM totals
    ) t
    WHERE rk <= {_IVM_TOPK}
    ORDER BY rk ASC
    """,
)
def cdc_ivm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-user leaderboard (tier block above): the feed is
    split in half, the first half builds the view + a top-50
    candidate buffer, the second half is applied as a delta touching
    ONLY buffer ∪ delta keys, and the resulting top-{_IVM_TOPK} must
    equal — and is set-compared against — the from-scratch recompute.
    The oracle recomputes the final leaderboard exactly and states the
    parity boolean TRUE, so both the maintained VALUES and the
    maintenance ALGEBRA are driver-hashed.

    Scale: per batch the delta aggregate is map-combinable; the view
    touch-set is |buffer| + |delta keys| (a keyed lookup against the
    stored view at 100 TB, never a view scan); the final rank runs over
    the bounded candidate frame. The full recompute here exists only as
    the certification arm — production runs the incremental arm and
    alarms on the buffer-underflow condition instead."""
    from mongodb_cdc_spark.sources.changefeed import derive_change_log

    feed = derive_change_log(spark, sf_dir).filter(
        F.col("operationType").isin("insert", "update")
    )
    cut = feed.agg(
        F.expr("CAST(MAX(CAST(_id AS BIGINT)) div 2 AS BIGINT)")
    ).first()[0]
    cut_id = f"{cut:012d}"

    def delta_agg(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col("documentKey._id").alias("user_id"),
                F.expr(
                    "CAST(FLOOR(fullDocument.value * 100) AS BIGINT)"
                ).alias("vc"),
            )
            .groupBy("user_id")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum("vc").cast("bigint").alias("value_cents"),
            )
        )

    v1 = delta_agg(feed.filter(F.col("_id") <= cut_id)).localCheckpoint(
        eager=True
    )
    d2 = delta_agg(feed.filter(F.col("_id") > cut_id))

    buffer_keys = (
        v1.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(_IVM_TOPK_BUFFER)
        .select("user_id")
    )
    cand_keys = buffer_keys.unionByName(d2.select("user_id")).distinct()

    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        m = a.alias("a").join(b.alias("b"), "user_id", "full_outer")
        return m.select(
            "user_id",
            (
                F.coalesce(F.col("a.n_events"), F.lit(0))
                + F.coalesce(F.col("b.n_events"), F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce(F.col("a.value_cents"), F.lit(0))
                + F.coalesce(F.col("b.value_cents"), F.lit(0))
            ).cast("bigint").alias("value_cents"),
        )

    from mongodb_cdc_spark.operators._util import run_parallel

    # incremental arm: view rows for buffer ∪ delta keys only
    v_cand = merge(
        v1.join(cand_keys, "user_id", "left_semi"),
        d2.join(cand_keys, "user_id", "left_semi"),
    )
    # the incremental arm and the certification recompute are
    # independent K-row materializations over the checkpointed base —
    # overlap them (guide §2.6)
    ivm_top, full_top = run_parallel(
        lambda: ivm_rank_top(v_cand).localCheckpoint(eager=True),
        lambda: ivm_rank_top(merge(v1, d2)).localCheckpoint(eager=True),
    )
    # full_outer on ALL columns with presence markers (the join keys
    # themselves coalesce in a named-column full outer, so nullness of a
    # key column can NOT detect one-sided rows): any cell difference
    # yields a row missing one marker; count == 0 iff frames identical.
    mism = (
        ivm_top.withColumn("l_present", F.lit(1))
        .join(
            full_top.withColumn("r_present", F.lit(1)),
            ["rk", "user_id", "n_events", "value_cents"],
            "full_outer",
        )
        .filter(F.col("l_present").isNull() | F.col("r_present").isNull())
        .count()
    )
    return ivm_top.select(
        "rk",
        "user_id",
        "n_events",
        "value_cents",
        F.lit(mism == 0).alias("ivm_matches_recompute"),
    ).orderBy("rk")


# --------------------------------------------------------------------------
# cdc_ivm_topk_tombstone — maintained top-k under DELETE deltas (VERDICT
# r8 next #5): the monotone-buffer trick of `cdc_ivm_topk` is correct
# only while the ranked aggregate never decreases; a tombstone breaks
# that bound, so the maintainer must DETECT the decrease and fall back
# to the recompute arm. This operator extends the IVM tier with exactly
# that invalidation algebra, composed with `cdc_apply_tombstone`'s
# delete semantics (the reference drops deletes at js:159-177; the
# engine deliberately extends past that).
# --------------------------------------------------------------------------
# View semantics (epoch counts, the sessionized-lifetime shape): a
# tombstone RESETS its key — the maintained aggregate counts only events
# after the key's latest tombstone, and a key with no live events since
# its last tombstone leaves the leaderboard. Event order is CDC LOG
# ORDER (_id = event_id — deltas apply in log order, the same prefix
# order the feed split uses), so per-delta states merge exactly:
#   merge(a, b) = b.has_del ? b : (a.n + b.n, a.vc + b.vc)
# Buffer invalidation: ANY tombstone in the delta can demote a buffered
# key, which can promote a key OUTSIDE the buffer — the monotone
# argument is void, so the maintainer serves the recompute arm that
# batch (and the flag is part of the hashed output). With no tombstone
# in the delta the monotone incremental arm serves, parity-checked
# against recompute like `cdc_ivm_topk`.


@query(
    "cdc_ivm_topk_tombstone",
    oracle=f"""
    WITH cut AS MATERIALIZED (
      SELECT MAX(event_id) // 2 AS c FROM events
    ),
    lastdel AS MATERIALIZED (
      SELECT user_id, MAX(event_id) AS de FROM events
      WHERE event_type = 'error' GROUP BY user_id
    ),
    live AS MATERIALIZED (
      SELECT e.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM events e LEFT JOIN lastdel d ON e.user_id = d.user_id
      WHERE e.event_type <> 'error'
        AND (d.de IS NULL OR e.event_id > d.de)
      GROUP BY e.user_id
    )
    SELECT rk, user_id, n_events, value_cents,
           (SELECT COUNT(*) > 0 FROM events
            WHERE event_type = 'error'
              AND event_id > (SELECT c FROM cut)) AS recompute_triggered,
           TRUE AS served_matches_recompute
    FROM (
      SELECT user_id, n_events, value_cents,
             ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id ASC) AS rk
      FROM live
    ) t
    WHERE rk <= {_IVM_TOPK}
    ORDER BY rk ASC
    """,
)
def cdc_ivm_topk_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-aware maintained leaderboard (tier block above): the
    feed splits at the midpoint event id; each half reduces to a
    mergeable per-user epoch state (live count/cents since the half's
    last tombstone + a has-tombstone marker); the delta half is scanned
    for tombstones and, because the feed DOES carry them, the buffer
    bound is declared invalid and the recompute arm serves — the
    invalidation decision, the served values, and the serve==recompute
    parity are all part of the driver-hashed row, so a maintainer that
    wrongly served the monotone arm under deletes goes red loudly.

    Scale: per-delta state is one map-combinable aggregate + one keyed
    self-join on user_id (tombstone positions); the merge is a keyed
    full-outer on the delta's touched keys against the stored view at
    100 TB. The recompute arm's rank is TakeOrderedAndProject + a
    K-row window (`ivm_rank_top`) — even the correctness fallback under
    non-monotone deltas never pays a view-sized single-task sort; it is
    paid ONLY on batches whose delta contains a tombstone (the flag is
    the alarm the production pipeline keys compaction on)."""
    from mongodb_cdc_spark.sources.changefeed import derive_change_log

    feed = derive_change_log(spark, sf_dir)
    cut = feed.agg(
        F.expr("CAST(MAX(CAST(_id AS BIGINT)) div 2 AS BIGINT)")
    ).first()[0]
    cut_id = f"{cut:012d}"

    def epoch_state(df: DataFrame) -> DataFrame:
        """Mergeable per-user state for one log prefix/delta: live
        aggregate since the last in-delta tombstone + has_del marker."""
        base = df.select(
            F.col("documentKey._id").alias("user_id"),
            F.col("_id").alias("eid"),
            (F.col("operationType") == "delete").alias("is_del"),
            F.expr("CAST(FLOOR(fullDocument.value * 100) AS BIGINT)").alias(
                "vc"
            ),
        )
        lastdel = (
            base.filter(F.col("is_del"))
            .groupBy("user_id")
            .agg(F.max("eid").alias("de"))
        )
        live = (
            base.filter(~F.col("is_del"))
            .join(lastdel, "user_id", "left")
            .filter(F.col("de").isNull() | (F.col("eid") > F.col("de")))
            .groupBy("user_id")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum("vc").cast("bigint").alias("value_cents"),
            )
        )
        return lastdel.join(live, "user_id", "full_outer").select(
            "user_id",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce("value_cents", F.lit(0))
            .cast("bigint")
            .alias("value_cents"),
            F.col("de").isNotNull().alias("has_del"),
        )

    from mongodb_cdc_spark.operators._util import run_parallel

    # the base-side and delta-side epoch states are independent —
    # overlap their materializations (guide §2.6)
    s1, s2 = run_parallel(
        lambda: epoch_state(
            feed.filter(F.col("_id") <= cut_id)
        ).localCheckpoint(eager=True),
        lambda: epoch_state(
            feed.filter(F.col("_id") > cut_id)
        ).localCheckpoint(eager=True),
    )
    # the invalidation probe: bounded 1-row scalar over the delta state
    recompute_triggered = (
        s2.filter(F.col("has_del")).limit(1).count() > 0
    )

    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        m = a.alias("a").join(b.alias("b"), "user_id", "full_outer")
        reset = F.coalesce(F.col("b.has_del"), F.lit(False))
        return m.select(
            "user_id",
            F.when(reset, F.coalesce(F.col("b.n_events"), F.lit(0)))
            .otherwise(
                F.coalesce(F.col("a.n_events"), F.lit(0))
                + F.coalesce(F.col("b.n_events"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_events"),
            F.when(reset, F.coalesce(F.col("b.value_cents"), F.lit(0)))
            .otherwise(
                F.coalesce(F.col("a.value_cents"), F.lit(0))
                + F.coalesce(F.col("b.value_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("value_cents"),
        )

    def rank_top(view: DataFrame) -> DataFrame:
        # the shared TakeOrdered-first ranker; dead keys (support 0
        # since the last tombstone) leave the leaderboard first
        return ivm_rank_top(view.filter(F.col("n_events") > 0))

    def t_full():
        return rank_top(merge(s1, s2)).localCheckpoint(eager=True)

    if recompute_triggered:
        full_top = t_full()
        serve = full_top
    else:
        buffer_keys = (
            s1.filter(F.col("n_events") > 0)
            .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
            .limit(_IVM_TOPK_BUFFER)
            .select("user_id")
        )
        cand_keys = buffer_keys.unionByName(s2.select("user_id")).distinct()
        # serve arm ∥ recompute arm (guide §2.6) — both K-row
        # materializations over the checkpointed epoch states
        full_top, serve = run_parallel(
            t_full,
            lambda: rank_top(
                merge(
                    s1.join(cand_keys, "user_id", "left_semi"),
                    s2.join(cand_keys, "user_id", "left_semi"),
                )
            ).localCheckpoint(eager=True),
        )
    # serve-vs-recompute parity, full-outer with presence markers (the
    # cdc_ivm_topk discipline: key-column nullness cannot detect
    # one-sided rows in a named-column full outer)
    mism = (
        serve.withColumn("l_present", F.lit(1))
        .join(
            full_top.withColumn("r_present", F.lit(1)),
            ["rk", "user_id", "n_events", "value_cents"],
            "full_outer",
        )
        .filter(F.col("l_present").isNull() | F.col("r_present").isNull())
        .count()
    )
    return serve.select(
        "rk",
        "user_id",
        "n_events",
        "value_cents",
        F.lit(recompute_triggered).alias("recompute_triggered"),
        F.lit(mism == 0).alias("served_matches_recompute"),
    ).orderBy("rk")


# --------------------------------------------------------------------------
# cdc_ivm_distinct — incrementally maintained COUNT DISTINCT under
# insert AND delete deltas, completing the IVM tier's algebra square
# (aggregate: monotone sums; join: keyed deltas; topk: monotone buffer;
# topk_tombstone: buffer invalidation; distinct: PER-KEY SUPPORT
# COUNTS — the classic refcount construction for the one aggregate
# that is never self-maintainable without auxiliary state).
# --------------------------------------------------------------------------
# View: COUNT(DISTINCT user_id) over LIVE users (epoch semantics shared
# with cdc_ivm_topk_tombstone: a user's live support = events after its
# last tombstone in log order; support 0 = not counted). The auxiliary
# state is the per-user support count — a delta changes the DISTINCT
# only when some key's support crosses 0 in either direction, which the
# merge detects key-locally (no view scan). Both arms (incremental via
# merged per-key states; full recompute) are computed and set-compared;
# the crossing counts themselves are part of the hashed row.

@query(
    "cdc_ivm_distinct",
    oracle="""
    WITH cut AS MATERIALIZED (
      SELECT MAX(event_id) // 2 AS c FROM events
    ),
    lastdel AS MATERIALIZED (
      SELECT user_id, MAX(event_id) AS de FROM events
      WHERE event_type = 'error' GROUP BY user_id
    ),
    live AS MATERIALIZED (
      SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events e LEFT JOIN lastdel d ON e.user_id = d.user_id
      WHERE e.event_type <> 'error'
        AND (d.de IS NULL OR e.event_id > d.de)
      GROUP BY e.user_id
    ),
    live1 AS MATERIALIZED (
      SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events e
      LEFT JOIN (SELECT user_id, MAX(event_id) AS de FROM events
                 WHERE event_type = 'error'
                   AND event_id <= (SELECT c FROM cut)
                 GROUP BY user_id) d ON e.user_id = d.user_id
      WHERE e.event_type <> 'error'
        AND e.event_id <= (SELECT c FROM cut)
        AND (d.de IS NULL OR e.event_id > d.de)
      GROUP BY e.user_id
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM live) AS n_distinct_live,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM live1) AS n_distinct_base,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM live
       WHERE user_id NOT IN (SELECT user_id FROM live1))
        AS n_keys_entered,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM live1
       WHERE user_id NOT IN (SELECT user_id FROM live))
        AS n_keys_left,
      TRUE AS ivm_matches_recompute
    """,
)
def cdc_ivm_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained live-user distinct count (tier block above): the feed
    splits at the midpoint event id; per-half per-user support states
    (live count since the half's last tombstone + has-tombstone marker)
    merge key-locally; the maintained count updates by the two crossing
    sets only — keys whose support rose from 0 (entered) and keys a
    tombstone dropped to 0 (left). The crossing counts, the base and
    final distinct values, and the incremental==recompute parity are
    all driver-hashed, so wrong refcount algebra anywhere goes red.

    Scale: per-delta state is one map-combinable aggregate; the merge
    is a keyed full-outer on the delta's touched keys against the
    stored per-key support (a keyed lookup at 100 TB); the DISTINCT
    update is |crossings|, never a view scan. The full recompute arm
    exists only as certification."""
    from mongodb_cdc_spark.sources.changefeed import derive_change_log

    feed = derive_change_log(spark, sf_dir)
    cut = feed.agg(
        F.expr("CAST(MAX(CAST(_id AS BIGINT)) div 2 AS BIGINT)")
    ).first()[0]
    cut_id = f"{cut:012d}"

    def support(df: DataFrame) -> DataFrame:
        base = df.select(
            F.col("documentKey._id").alias("user_id"),
            F.col("_id").alias("eid"),
            (F.col("operationType") == "delete").alias("is_del"),
        )
        lastdel = (
            base.filter(F.col("is_del"))
            .groupBy("user_id")
            .agg(F.max("eid").alias("de"))
        )
        live = (
            base.filter(~F.col("is_del"))
            .join(lastdel, "user_id", "left")
            .filter(F.col("de").isNull() | (F.col("eid") > F.col("de")))
            .groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n"))
        )
        return lastdel.join(live, "user_id", "full_outer").select(
            "user_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.col("de").isNotNull().alias("has_del"),
        )

    from mongodb_cdc_spark.operators._util import run_parallel

    # the base-side and delta-side supports are independent — overlap
    # their materializations (guide §2.6)
    s1, s2 = run_parallel(
        lambda: support(feed.filter(F.col("_id") <= cut_id)).localCheckpoint(
            eager=True
        ),
        lambda: support(feed.filter(F.col("_id") > cut_id)).localCheckpoint(
            eager=True
        ),
    )
    merged = (
        s1.alias("a")
        .join(s2.alias("b"), "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce(F.col("a.n"), F.lit(0)).alias("n1"),
            F.when(
                F.coalesce(F.col("b.has_del"), F.lit(False)),
                F.coalesce(F.col("b.n"), F.lit(0)),
            )
            .otherwise(
                F.coalesce(F.col("a.n"), F.lit(0))
                + F.coalesce(F.col("b.n"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_final"),
        )
        .localCheckpoint(eager=True)
    )
    # the two crossing counts, the base count, and the certification
    # recompute are four independent actions — overlap them (§2.6)
    entered, left, n_base, n_full = run_parallel(
        lambda: merged.filter(
            (F.col("n1") == 0) & (F.col("n_final") > 0)
        ).count(),
        lambda: merged.filter(
            (F.col("n1") > 0) & (F.col("n_final") == 0)
        ).count(),
        lambda: s1.filter(F.col("n") > 0).count(),
        # certification arm: full recompute over the unsplit feed
        lambda: support(feed).filter(F.col("n") > 0).count(),
    )
    # incremental arm: base + crossings
    n_ivm = n_base + entered - left
    return spark.createDataFrame(
        [
            (
                int(n_ivm),
                int(n_base),
                int(entered),
                int(left),
                bool(n_ivm == n_full),
            )
        ],
        "n_distinct_live bigint, n_distinct_base bigint, "
        "n_keys_entered bigint, n_keys_left bigint, "
        "ivm_matches_recompute boolean",
    )
