"""Maintenance operators: the table-hygiene pass a continuously-written
CDC target needs (reference R7's target table, js:188-199, accumulates
one write per batch forever; the reference never compacts because Mongo
does it server-side — a parquet-backed target must own it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import run_parallel
from mongodb_cdc_spark.registry import query
from mongodb_cdc_spark.sources.changefeed import scratch_root
from mongodb_cdc_spark.streaming.maintenance import (
    compact_parquet_dir,
    parquet_file_count,
)

_FRAGMENT_FILES = 64
_TARGET_FILES = 4


@query(
    "maintenance_compact",
    oracle="""
    SELECT CAST(64 AS INT) AS files_before,
           CAST(4 AS INT) AS files_after,
           TRUE AS rows_match,
           TRUE AS content_match
    """,
)
def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction end to end, self-validating: fragment the
    events table into 64 micro-batch-sized files (what a day of append
    sink output looks like), compact to 4, and emit the invariants the
    driver can state exactly — file counts and full row-multiset
    equality (order-insensitive xxhash64 content sum) across the
    rewrite. Each xxhash is reduced mod 1e9+7 before summing so the
    BIGINT sum cannot overflow under ANSI mode at any table size."""
    import os
    import shutil
    import uuid

    ev = load_table(spark, sf_dir, "events")
    work = os.path.join(scratch_root(), f"compact_{uuid.uuid4().hex[:12]}")

    def content_sum(df: DataFrame):
        h = F.xxhash64(*df.columns) % F.lit(1000000007)
        return df.select(
            F.sum(h).alias("s"), F.count(F.lit(1)).alias("n")
        ).first()

    try:
        ev.repartition(_FRAGMENT_FILES).write.mode("overwrite").parquet(work)
        files_before = parquet_file_count(work)
        before = content_sum(spark.read.parquet(work))
        compact_parquet_dir(spark, work, _TARGET_FILES)
        files_after = parquet_file_count(work)
        after = content_sum(spark.read.parquet(work))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                files_before,
                files_after,
                bool(before["n"] == after["n"]),
                bool(before["s"] == after["s"]),
            )
        ],
        "files_before int, files_after int, rows_match boolean, content_match boolean",
    )


def _zkey_exprs() -> tuple[str, str]:
    """Bit-interleave expressions for the 32-bit z-order key over
    (user16, secq16), generated once for both engines from the same
    loop so they cannot drift. ``u``/``s`` must be bound as BIGINTs in
    the surrounding query."""
    spark_terms = []
    duck_terms = []
    for i in range(16):
        spark_terms.append(f"shiftleft(shiftright(u, {i}) & 1, {2 * i})")
        spark_terms.append(f"shiftleft(shiftright(s, {i}) & 1, {2 * i + 1})")
        duck_terms.append(f"(((u >> {i}) & 1) << {2 * i})")
        duck_terms.append(f"(((s >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(spark_terms), " + ".join(duck_terms)


_Z_SPARK, _Z_DUCK = _zkey_exprs()

@query(
    "maintenance_zorder_key",
    oracle=f"""
    WITH rng AS (
      SELECT MIN(user_id) AS u0, MAX(user_id) AS u1,
             MIN(epoch_ns(ts) // 1000000000) AS t0,
             MAX(epoch_ns(ts) // 1000000000) AS t1
      FROM events
    ), dims AS (
      SELECT ((user_id - u0) * 65535) // GREATEST(u1 - u0, 1) AS u,
             (((epoch_ns(ts) // 1000000000) - t0) * 65535)
               // GREATEST(t1 - t0, 1) AS s
      FROM events CROSS JOIN rng
    ), z AS (
      SELECT u, s, ({_Z_DUCK}) AS zkey FROM dims
    )
    SELECT (zkey >> 24) AS zbucket,
           COUNT(*) AS n,
           MIN(u) AS min_u, MAX(u) AS max_u,
           MIN(s) AS min_s, MAX(s) AS max_s
    FROM z GROUP BY zbucket
    """,
)
def maintenance_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over the two hot filter dimensions
    of the events table — user_id and event time — plus the per-z-bucket
    min/max statistics that make the layout pay off. This is the
    OPTIMIZE ZORDER BY maintenance pass of a lakehouse table, reduced to
    its testable core: writing the table sorted by ``zkey`` puts rows
    near in BOTH dimensions into the same parquet row groups, so
    min/max row-group stats prune either predicate (``user_id = ?``
    AND/OR a time range) — a single-column sort only ever prunes one.

    Both dimensions are min-max normalized to 16 bits from a one-row
    stats aggregate (broadcast, no driver collect) — the same table
    statistics a real OPTIMIZE consults — so the interleave uses every
    bit regardless of the raw value ranges. The emitted per-bucket
    (min,max) spans ARE the proof: each of the 256 z-buckets covers
    ~1/16 of user space AND ~1/16 of the time range simultaneously,
    which is exactly the data-skipping index a scan consults. The
    interleave itself is 64 shift-mask terms of straight-line codegen;
    zero data shuffles before the rollup — at 100 TB the only cost of
    the real rewrite is the one range-partitioned sort-write.

    Reference scope note: the reference never compacts or re-clusters
    (its Mongo target self-maintains, js:188-199); this is the
    parquet-target equivalent of that missing hygiene, extending
    `maintenance_compact`."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("bigint").alias("uid"),
        F.to_unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    rng = ev.agg(
        F.min("uid").alias("u0"),
        F.max("uid").alias("u1"),
        F.min("sec").alias("t0"),
        F.max("sec").alias("t1"),
    )
    dims = ev.join(F.broadcast(rng)).select(
        F.expr("((uid - u0) * 65535) div GREATEST(u1 - u0, 1)").alias("u"),
        F.expr("((sec - t0) * 65535) div GREATEST(t1 - t0, 1)").alias("s"),
    )
    z = dims.select("u", "s", F.expr(_Z_SPARK).alias("zkey"))
    return (
        z.groupBy(F.expr("zkey >> 24").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("s").alias("min_s"),
            F.max("s").alias("max_s"),
        )
    )


# --------------------------------------------------------------------------
# maintenance_vacuum
# --------------------------------------------------------------------------


@query(
    "maintenance_vacuum",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS orphans_uncommitted,
           CAST(1 AS BIGINT) AS orphans_unreferenced,
           CAST(1 AS BIGINT) AS orphans_staging,
           TRUE AS content_unchanged,
           TRUE AS snapshots_readable
    """,
)
def maintenance_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM end to end, self-validating: build a real versioned upsert
    target (two merged batches -> two snapshots), inject the three
    crash-debris classes a long-running CDC writer accumulates — an
    uncommitted version dir (crash before the ``_COMMITTED`` marker), a
    committed version dir absent from every retained manifest (crash
    before the manifest append), and a stale ``.staging/`` dir — then
    run :func:`vacuum_orphans` and state the invariants exactly:
    exactly one orphan of each class removed, the live table's content
    hash unchanged across the vacuum, and every retained snapshot still
    fully readable (reachability comes from the manifest log, so
    time travel survives the cleanup — the Delta/Iceberg VACUUM
    contract)."""
    import os as _os
    import uuid as _uuid

    from mongodb_cdc_spark.sources.changefeed import derive_change_log
    from mongodb_cdc_spark.streaming.maintenance import vacuum_orphans
    from mongodb_cdc_spark.streaming.upsert import (
        ParquetUpsertTarget,
        upsert_projection,
    )

    tdir = _os.path.join(
        scratch_root(), f"vacuum_target_{_uuid.uuid4().hex[:12]}"
    )
    target = ParquetUpsertTarget(tdir, n_buckets=4, keep_versions=2)
    feed = upsert_projection(derive_change_log(spark, sf_dir))
    half = F.pmod(F.xxhash64("_id"), F.lit(2))
    target.merge_batch(feed.filter(half == 0), epoch_id=1)
    target.merge_batch(feed.filter(half == 1), epoch_id=2)

    def content_sum(df: DataFrame) -> int:
        return (
            df.select(
                F.pmod(
                    F.xxhash64(*sorted(df.columns)), F.lit(1_000_000_007)
                ).alias("h")
            )
            .agg(F.sum("h"))
            .first()[0]
        )

    before = content_sum(target.current(spark))
    snaps_before = target.snapshots()

    # inject the three debris classes
    orphan_uncommitted = _os.path.join(tdir, "bucket=0", "v" + "9" * 20)
    _os.makedirs(orphan_uncommitted)
    open(_os.path.join(orphan_uncommitted, "part-junk.parquet"), "w").close()
    orphan_unref = _os.path.join(tdir, "bucket=1", "v" + "0" * 20)
    _os.makedirs(orphan_unref)
    open(_os.path.join(orphan_unref, "part-junk.parquet"), "w").close()
    open(_os.path.join(orphan_unref, "_COMMITTED"), "w").close()
    _os.makedirs(_os.path.join(tdir, ".staging", "v" + "1" * 20))

    # retention_s=0: this operator IS the single writer of its private
    # fixture target and the injected debris is seconds old; production
    # sweeps use the default VACUUM_RETENTION_S age gate (see
    # streaming/maintenance.py), exercised in tests/test_properties.py
    # (fresh debris retained at the default).
    removed = vacuum_orphans(target, retention_s=0)

    after = content_sum(target.current(spark))
    readable = True
    for v in snaps_before:
        try:
            target.read_snapshot(spark, v).count()
        except Exception:
            readable = False
    return spark.createDataFrame(
        [
            (
                removed["uncommitted"],
                removed["unreferenced"],
                removed["staging"],
                bool(before == after),
                readable,
            )
        ],
        "orphans_uncommitted bigint, orphans_unreferenced bigint, "
        "orphans_staging bigint, content_unchanged boolean, "
        "snapshots_readable boolean",
    )


# --------------------------------------------------------------------------
# maintenance_rebucket — online bucket-count rescaling of the upsert
# target (the shard-split maintenance every hash-bucketed 100 TB table
# eventually runs)
# --------------------------------------------------------------------------


@query(
    "maintenance_rebucket",
    oracle="""
    WITH state AS MATERIALIZED (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type <> 'error'
      ) t WHERE rn = 1
    )
    SELECT CAST(4 AS BIGINT) AS n_buckets_before,
           CAST(8 AS BIGINT) AS n_buckets_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS value_checksum_cents,
           TRUE AS rows_preserved,
           TRUE AS bucket_assignment_ok
    FROM state
    """,
)
def maintenance_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescale a live upsert target from 4 to 8 hash buckets — the
    shard-split a hash-bucketed table runs when buckets outgrow their
    size target. The 4-bucket table is built from the full change feed,
    its CURRENT state is re-merged into a fresh 8-bucket target through
    the SAME merge path (one pass: re-reduce is idempotent on
    already-latest state, so rebucketing is just a merge with a wider
    bucket function), and the result is certified three ways, all
    hashed: exact row count and value checksum against the oracle's
    from-scratch latest-per-key recomputation of the feed; row-set
    parity with the 4-bucket source (`rows_preserved`); and physical
    placement — every row in each new bucket=b directory satisfies
    pmod(xxhash64(_id), 8) == b (`bucket_assignment_ok`), the invariant
    that keeps bucket-pruned key lookups correct after the split.

    Scale: rebucketing reads each old bucket once and writes each new
    bucket once (2x table I/O, the unavoidable floor); the merge path's
    one-shuffle reduce and stage-then-rename commit carry over, so the
    split is restart-safe per bucket and readers keep time travel
    across it (fresh target here; production reuses the same dir and
    the manifest log makes the cutover atomic)."""
    import os as _os
    import uuid as _uuid

    from mongodb_cdc_spark.sources.changefeed import derive_change_log
    from mongodb_cdc_spark.streaming.upsert import (
        ParquetUpsertTarget,
        upsert_projection,
    )

    feed = upsert_projection(derive_change_log(spark, sf_dir))
    t4 = ParquetUpsertTarget(
        _os.path.join(
            scratch_root(), f"rebucket4_{_uuid.uuid4().hex[:12]}"
        ),
        n_buckets=4,
    )
    t4.merge_batch(feed, epoch_id=1)
    t8 = ParquetUpsertTarget(
        _os.path.join(
            scratch_root(), f"rebucket8_{_uuid.uuid4().hex[:12]}"
        ),
        n_buckets=8,
    )
    t8.merge_batch(t4.current(spark), epoch_id=1)

    cur4 = t4.current(spark)
    cur8 = t8.current(spark)

    # row-set parity: presence-marker full outer on the key + payload
    def t_mism() -> int:
        return (
            cur4.select("_id", "event_type", "value")
            .withColumn("l", F.lit(1))
            .join(
                cur8.select("_id", "event_type", "value").withColumn(
                    "r", F.lit(1)
                ),
                ["_id", "event_type", "value"],
                "full_outer",
            )
            .filter(F.col("l").isNull() | F.col("r").isNull())
            .count()
        )

    # physical placement audit: each new bucket dir only holds its keys.
    # Round 12 (guide §1.2/§2.6): ONE union-all count instead of 8
    # sequential per-bucket count jobs — same rows scanned, 1/8th the
    # job-scheduling latency — overlapped with the parity count (the two
    # audits share no subtree: placement reads raw bucket files, parity
    # reads the merged current() views).
    def t_placement() -> int:
        per_bucket = None
        for b in range(8):
            paths = t8._latest_bucket_paths([b])
            if not paths:
                continue
            fr = (
                spark.read.parquet(*paths)
                .select("_id")
                .withColumn("b", F.lit(b))
            )
            per_bucket = fr if per_bucket is None else per_bucket.unionByName(fr)
        if per_bucket is None:
            return 0
        return per_bucket.filter(
            F.pmod(F.xxhash64("_id"), F.lit(8)) != F.col("b")
        ).count()

    mism, bad_placement = run_parallel(t_mism, t_placement)
    agg = cur8.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_checksum_cents"),
    )
    return agg.select(
        F.lit(4).cast("bigint").alias("n_buckets_before"),
        F.lit(8).cast("bigint").alias("n_buckets_after"),
        "n_rows",
        "value_checksum_cents",
        F.lit(mism == 0).alias("rows_preserved"),
        F.lit(bad_placement == 0).alias("bucket_assignment_ok"),
    )
