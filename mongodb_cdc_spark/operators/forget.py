"""Forget tier: exact deletion from dedup state (GDPR + rollback).

Every membership structure in the engine answers "have I seen this?";
none of them, until this tier, can UN-see. Production pipelines need
exactly that, twice over:

* **right-to-be-forgotten** — a takedown/DSAR list of documents must
  leave the dedup state so a later lawful re-submission of the same
  content is ADMITTED, while content that other, non-forgotten
  documents still carry stays flagged;
* **poisoned-wave rollback** — an ingested wave found to be bad
  (spam burst, corrupted crawl) must be subtractable from the state
  without a from-scratch rebuild of the 100 TB base.

A distinct-hash set cannot support either (dropping a hash forgets
every OTHER holder of the same content too), and a Bloom filter
structurally cannot delete at all (operators/bloom.py — bits are
shared). The exact answer is a REFCOUNTED store: (h, cnt) where cnt
is the number of live documents carrying content-hash h. Deletion is
counter subtraction — associative and commutative like the OR fold,
but NOT idempotent, so unlike the bloom tier the purge feed needs the
engine's standard exactly-once discipline (idempotent per-batch
overwrites; the keys here are batch ops, so a re-run recomputes
rather than re-decrements). The algebra is the refcount-construction
IVM of `cdc_ivm_distinct` applied to the curation tier's state.

Cited parity: the reference replicator has a DELETE path it applies
per-event (mongodb-cdc-program.js:159-177); this tier is the same
"deletes must take effect in derived state" obligation applied to the
engine's dedup stores. SURVEY.md §2A marks the curation surface
itself "explicitly absent" from the reference.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import new_stage, publish_store
from mongodb_cdc_spark.registry import query

# Deterministic forget-list: every 97th doc_id. Spans sources and both
# splits, includes docs with and without duplicate partners at sf0.1.
_FORGET_MOD = 97

_CUT_SQL = "(MAX(doc_id) * 9) // 10"


def refcount_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, stage-then-rename) the refcounted content store
    over ALL documents: (h = md5(text), cnt = number of live docs
    carrying h). The narrow artifact deletion needs; the distinct-hash
    gate store is its cnt >= 1 projection."""
    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"refcount_{sf_name}_v1")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        d = load_table(spark, sf_dir, "documents")
        counts = d.groupBy(F.md5("text").alias("h")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        stage = new_stage(path)
        counts.write.mode("overwrite").parquet(stage)
        publish_store(stage, path)
    return path


_REFCOUNT_STORE_ORACLE = """
WITH counts AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY md5(text)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM counts) AS n_hashes,
  (SELECT CAST(SUM(cnt) AS BIGINT) FROM counts) AS n_docs,
  (SELECT CAST(MAX(cnt) AS BIGINT) FROM counts) AS max_cnt,
  (SELECT CAST(SUM(CAST(('0x' || substring(h, 1, 8)) AS BIGINT) * cnt)
          AS BIGINT) FROM counts) AS cnt_checksum
"""


@query("maintenance_refcount_store", oracle=_REFCOUNT_STORE_ORACLE)
def maintenance_refcount_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persist the refcounted content store (`refcount_store_path`) and
    read back a full-store audit hash-checked against DuckDB's
    from-scratch count: hash cardinality, total refcount (must equal
    the document count — a lost or double-counted holder anywhere
    breaks it), the largest duplicate group, and an exact
    prefix-int * cnt SUM checksum (one drifted counter on one hash
    breaks it). Scale: one map-combined aggregate at build; the audit
    reads the narrow (16-byte, 8-byte) store only."""
    store = spark.read.parquet(refcount_store_path(spark, sf_dir))
    return store.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.sum(
            F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")
            * F.col("cnt")
        )
        .cast("bigint")
        .alias("cnt_checksum"),
    )


def _subtract_counts(
    store: DataFrame, removed: DataFrame, broadcast_dec: bool = False
) -> DataFrame:
    """Refcount subtraction: ``store`` (h, cnt) minus ``removed`` doc
    rows carrying column ``h`` — decrement per-hash, drop rows at 0.
    The shared kernel of purge and rollback; the inverse of the
    count-construction fold, exact by arithmetic (no tombstone
    approximation). ``broadcast_dec`` pins a broadcast join for the
    takedown-list case (tiny against a 100 TB store — the store side
    must never shuffle); wave rollback leaves it off so AQE can pick
    a shuffle join when the wave's hash set is itself large."""
    dec = removed.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("dec")
    )
    if broadcast_dec:
        dec = F.broadcast(dec)
    return (
        store.join(dec, "h", "left")
        .select(
            "h",
            (F.col("cnt") - F.coalesce("dec", F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


_FORGET_PURGE_ORACLE = f"""
WITH counts AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY md5(text)
),
forget AS MATERIALIZED (
  SELECT doc_id, md5(text) AS h FROM documents
  WHERE doc_id % {_FORGET_MOD} = 0
),
dec AS MATERIALIZED (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS dec FROM forget GROUP BY h
),
purged AS MATERIALIZED (
  SELECT c.h, c.cnt - COALESCE(d.dec, 0) AS cnt
  FROM counts c LEFT JOIN dec d ON d.h = c.h
  WHERE c.cnt - COALESCE(d.dec, 0) > 0
),
rebuilt AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents WHERE doc_id % {_FORGET_MOD} <> 0
  GROUP BY md5(text)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM forget) AS n_forgotten_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM dec) AS n_dec_hashes,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM counts)
    - (SELECT CAST(COUNT(*) AS BIGINT) FROM purged) AS n_dropped_hashes,
  (SELECT CAST(SUM(cnt) AS BIGINT) FROM purged) AS n_remaining_docs,
  CAST(0 AS BIGINT) AS purge_mismatches
"""


@query("maintenance_forget_purge", oracle=_FORGET_PURGE_ORACLE)
def maintenance_forget_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge, verified against the rebuild: the
    forget-list's hashes decrement the refcounted store (rows reaching
    0 drop — content whose LAST holder was forgotten leaves the state;
    content other docs still carry stays with a lower count), and the
    purged store must equal the from-scratch count over the remaining
    documents row for row — ``purge_mismatches`` is a REAL full-outer
    (h, cnt) mismatch count, hash-checked at 0.

    Scale: the decrement side is forget-list-sized (takedown lists are
    tiny against a 100 TB corpus); the subtraction is one narrow-key
    left join + filter — never a rebuild. The parity rebuild here is
    the PROOF arm, not the production path (the cdc_ivm_* pattern)."""
    d = load_table(spark, sf_dir, "documents")
    store = spark.read.parquet(refcount_store_path(spark, sf_dir))
    forget = d.filter(F.col("doc_id") % _FORGET_MOD == 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    purged = _subtract_counts(store, forget, broadcast_dec=True)
    rebuilt = (
        d.filter(F.col("doc_id") % _FORGET_MOD != 0)
        .groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mism = (
        purged.withColumnRenamed("cnt", "pc")
        .join(rebuilt.withColumnRenamed("cnt", "rc"), "h", "full_outer")
        .filter(
            F.col("pc").isNull()
            | F.col("rc").isNull()
            | (F.col("pc") != F.col("rc"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("purge_mismatches"))
    )
    dec_hashes = forget.select("h").distinct()
    return (
        forget.agg(F.count(F.lit(1)).cast("bigint").alias("n_forgotten_docs"))
        .crossJoin(
            F.broadcast(
                dec_hashes.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_dec_hashes")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                store.agg(F.count(F.lit(1)).alias("ns"))
                .crossJoin(purged.agg(F.count(F.lit(1)).alias("np")))
                .select(
                    (F.col("ns") - F.col("np"))
                    .cast("bigint")
                    .alias("n_dropped_hashes")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                purged.agg(
                    F.sum("cnt").cast("bigint").alias("n_remaining_docs")
                )
            )
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "n_forgotten_docs",
            "n_dec_hashes",
            "n_dropped_hashes",
            "n_remaining_docs",
            "purge_mismatches",
        )
    )


_READMIT_AUDIT_ORACLE = f"""
WITH remaining AS MATERIALIZED (
  SELECT DISTINCT md5(text) AS h FROM documents
  WHERE doc_id % {_FORGET_MOD} <> 0
),
resub AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
  WHERE doc_id % {_FORGET_MOD} = 0
)
SELECT r.source,
       CAST(COUNT(*) AS BIGINT) AS n_resubmitted,
       CAST(SUM(CASE WHEN m.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_admitted,
       CAST(SUM(CASE WHEN m.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_still_flagged
FROM resub r LEFT JOIN remaining m ON m.h = r.h
GROUP BY r.source
ORDER BY r.source ASC
"""


@query("ext_forget_readmit_audit", oracle=_READMIT_AUDIT_ORACLE)
def ext_forget_readmit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE compliance property, measured: after the purge, re-submit
    every forgotten document to the exact-dup gate backed by the purged
    refcount store. A re-submission is ADMITTED iff no remaining
    document carries its content hash (its counter reached 0) and
    STILL FLAGGED iff another live holder exists — forgetting one
    holder must not unsee content that other, non-forgotten documents
    legitimately keep. Per-source accounting, hash-checked against
    DuckDB's recomputation over the remaining corpus.

    Scale: gate serve is one left join of the (tiny) re-submission
    batch against the narrow purged store — same shape as every other
    store-backed gate; no corpus text touched."""
    d = load_table(spark, sf_dir, "documents")
    store = spark.read.parquet(refcount_store_path(spark, sf_dir))
    forget = d.filter(F.col("doc_id") % _FORGET_MOD == 0).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    purged = _subtract_counts(store, forget.select("h"), broadcast_dec=True)
    return (
        forget.join(
            purged.select("h").withColumn("live", F.lit(1)), "h", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_resubmitted"),
            F.sum(F.col("live").isNull().cast("int"))
            .cast("bigint")
            .alias("n_admitted"),
            F.sum(F.col("live").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_still_flagged"),
        )
        .orderBy("source")
    )


_WAVE_ROLLBACK_ORACLE = f"""
WITH cut AS MATERIALIZED (
  SELECT {_CUT_SQL} AS c FROM documents
),
counts AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY md5(text)
),
wave AS MATERIALIZED (
  SELECT md5(text) AS h FROM documents
  WHERE doc_id > (SELECT c FROM cut)
),
dec AS MATERIALIZED (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS dec FROM wave GROUP BY h
),
rolled AS MATERIALIZED (
  SELECT c.h, c.cnt - COALESCE(d.dec, 0) AS cnt
  FROM counts c LEFT JOIN dec d ON d.h = c.h
  WHERE c.cnt - COALESCE(d.dec, 0) > 0
),
base_only AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents WHERE doc_id <= (SELECT c FROM cut)
  GROUP BY md5(text)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM wave) AS n_wave_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM rolled) AS n_rolled_hashes,
  (SELECT CAST(SUM(cnt) AS BIGINT) FROM rolled) AS n_rolled_docs,
  CAST(0 AS BIGINT) AS rollback_mismatches
"""


@query("maintenance_wave_rollback", oracle=_WAVE_ROLLBACK_ORACLE)
def maintenance_wave_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisoned-wave rollback: subtract an entire ingested wave's
    contributions (the doc_id > cut split standing in for the bad
    crawl) from the merged refcount store and prove the result equals
    the base-only store row for row — ``rollback_mismatches`` is a
    REAL full-outer (h, cnt) mismatch count, hash-checked at 0. The
    exact inverse of `maintenance_*_refresh`'s fold arms: refresh
    proves merge(base, wave) == rebuild(all); this proves
    subtract(rebuild(all), wave) == base. Together they make wave
    ingestion a reversible transaction over dedup state.

    Scale: the subtraction joins on narrow 16-byte keys, wave-sized
    decrement side; the 100 TB base is touched only through its
    already-persisted counters — rollback cost is proportional to the
    wave being rolled back, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    store = spark.read.parquet(refcount_store_path(spark, sf_dir))
    wave = d.filter(F.col("doc_id") > cut).select(F.md5("text").alias("h"))
    rolled = _subtract_counts(store, wave)
    base_only = (
        d.filter(F.col("doc_id") <= cut)
        .groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mism = (
        rolled.withColumnRenamed("cnt", "lc")
        .join(base_only.withColumnRenamed("cnt", "bc"), "h", "full_outer")
        .filter(
            F.col("lc").isNull()
            | F.col("bc").isNull()
            | (F.col("lc") != F.col("bc"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("rollback_mismatches"))
    )
    return (
        wave.agg(F.count(F.lit(1)).cast("bigint").alias("n_wave_docs"))
        .crossJoin(
            F.broadcast(
                rolled.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rolled_hashes"),
                    F.sum("cnt").cast("bigint").alias("n_rolled_docs"),
                )
            )
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "n_wave_docs",
            "n_rolled_hashes",
            "n_rolled_docs",
            "rollback_mismatches",
        )
    )


# --------------------------------------------------------------------------
# stream_refcount_ingest — the forget tier's streaming completion: a
# CDC-style event feed (wave-doc INSERTs interleaved deterministically
# with takedown DELETEs of base docs) maintained against the persisted
# base refcount store, per micro-batch, under the run_supervised
# restart contract. This is the reference's per-event delete path
# (mongodb-cdc-program.js:159-177) applied continuously to curation
# state — the batch keys above prove the algebra; this key runs it the
# way production would, as a standing stream.
# --------------------------------------------------------------------------
# Semantics are PER-EVENT-ORDER (seq): before event e on content-hash
# h, cnt(h) = base_cnt(h) + sum of earlier events' deltas on h (+1 per
# insert, -1 per delete). An INSERT's verdict is "content already
# present" (cnt_before >= 1); a DELETE's verdict is "dropped the last
# holder" (cnt_before == 1 — the doc becomes lawfully re-admittable).
# The feed is seq-range files replayed in order, so the per-batch rule
# "base + strictly-earlier committed deltas + in-batch prefix window"
# implements exactly the oracle's global running sum. Exactly-once by
# idempotence: verdicts AND per-batch delta commits are idempotent
# overwrites; deltas are ADDITIVE rows, so the shared fold/compaction
# machinery (`maybe_fold_state`'s union rewrite) preserves their sums.

_EVENT_FEED_FILES = 4
_SEQ_BUCKETS = 11  # seq = (doc_id % 11) * 10^10 + doc_id interleaves
_SEQ_STRIDE = 10_000_000_000


def _event_cols(df: DataFrame) -> DataFrame:
    """(seq, doc_id, op, h) event projection; `op` decided by the
    forget-list rule, seq by the interleaving bucket formula."""
    return df.select(
        (
            (F.col("doc_id") % _SEQ_BUCKETS) * F.lit(_SEQ_STRIDE)
            + F.col("doc_id")
        ).alias("seq"),
        "doc_id",
        "op",
        F.md5("text").alias("h"),
    )


def _refcount_event_feed(spark: SparkSession, sf_dir: str, cut: int) -> str:
    """The event feed: wave docs (doc_id > cut) as 'ins' events, base
    takedowns (doc_id <= cut, doc_id % _FORGET_MOD == 0) as 'del'
    events, ordered by seq = (doc_id % 11)*1e10 + doc_id so deletes
    interleave among inserts across batches. Materialized as seq-range
    parquet files whose listing AND mtime order equals seq order
    (the `_url_wave_feed` discipline), so maxFilesPerTrigger=1 replays
    events in seq order."""
    import glob as _glob
    import shutil as _shutil

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(
        scratch_root(), f"rcfeed_{sf_name}_{_EVENT_FEED_FILES}"
    )
    if not _os.path.exists(_os.path.join(path, "_FEED_DONE")):
        d = load_table(spark, sf_dir, "documents")
        ins = d.filter(F.col("doc_id") > cut).withColumn("op", F.lit("ins"))
        dels = d.filter(
            (F.col("doc_id") <= cut) & (F.col("doc_id") % _FORGET_MOD == 0)
        ).withColumn("op", F.lit("del"))
        events = _event_cols(ins.unionByName(dels))
        # contiguous seq ranges: buckets [0-2] [3-5] [6-8] [9-10]
        bounds = [0, 3, 6, 9, _SEQ_BUCKETS]
        stage = new_stage(path)
        _shutil.rmtree(stage, ignore_errors=True)
        _os.makedirs(stage, exist_ok=True)
        for i in range(_EVENT_FEED_FILES):
            tmp = _os.path.join(stage, f"_tmp{i}")
            (
                events.filter(
                    (F.col("seq") >= bounds[i] * _SEQ_STRIDE)
                    & (F.col("seq") < bounds[i + 1] * _SEQ_STRIDE)
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = _glob.glob(_os.path.join(tmp, "part-*.parquet"))[0]
            wave = _os.path.join(stage, f"wave_{i}.parquet")
            _os.rename(part, wave)
            _os.utime(wave, (1_600_000_000 + i, 1_600_000_000 + i))
            _shutil.rmtree(tmp, ignore_errors=True)
        with open(_os.path.join(stage, "_FEED_DONE"), "w"):
            pass
        publish_store(stage, path)
    return path


def base_refcount_store_path(
    spark: SparkSession, sf_dir: str, cut: int
) -> str:
    """Build (once, stage-then-rename) the BASE-slice refcount store
    (docs <= cut) — the standing state the event stream mutates."""
    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"refcount_{sf_name}_c{cut}_v1")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        d = load_table(spark, sf_dir, "documents")
        counts = (
            d.filter(F.col("doc_id") <= cut)
            .groupBy(F.md5("text").alias("h"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        stage = new_stage(path)
        counts.write.mode("overwrite").parquet(stage)
        publish_store(stage, path)
    return path


def refcount_batch_verdicts(
    s: SparkSession,
    ev: DataFrame,
    base_store: str,
    delta_dir: str,
    batch_id: int,
) -> DataFrame:
    """Build one micro-batch's verdict frame from events ``ev``
    (seq, doc_id, op, h, delta) — the gate's whole read path, factored
    out so the plan-shape test drives the applier's EXACT joins.

    100 TB shape: the counter state is corpus-hash-cardinality — never
    broadcast, shuffle, or groupBy it whole. Prune base store AND
    committed deltas to the batch's hashes FIRST (a broadcast semi-join
    is a map-side filter over the state scan; at scale the store is
    bucketed by h so it prunes to buckets), THEN merge the batch-sized
    slices and probe them with a broadcast left join. Plan-pinned in
    test_refcount_stream_never_shuffles_state."""
    from pyspark.sql.window import Window

    from mongodb_cdc_spark.operators.curation import fold_state_paths

    batch_hashes = F.broadcast(ev.select("h").distinct())
    relevant = (
        s.read.parquet(base_store)
        .select("h", "cnt")
        .join(batch_hashes, "h", "left_semi")
    )
    committed = fold_state_paths(delta_dir, batch_id)
    if committed:
        relevant = (
            relevant.unionByName(
                s.read.parquet(*committed)
                .select("h", F.col("delta").alias("cnt"))
                .join(batch_hashes, "h", "left_semi")
            )
            .groupBy("h")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    w = (
        Window.partitionBy("h")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn("pre", F.sum("delta").over(w))
        .join(
            F.broadcast(relevant.withColumnRenamed("cnt", "pc")),
            "h",
            "left",
        )
        .select(
            "seq",
            "doc_id",
            "op",
            "delta",
            "h",
            (F.coalesce("pc", F.lit(0)) + F.coalesce("pre", F.lit(0)))
            .cast("bigint")
            .alias("cnt_before"),
        )
    )


def refcount_gate_batch_applier(base_store: str, target: str, delta_dir: str):
    """The refcount gate's per-micro-batch function, module-level so
    the restart/replay contract is directly testable: read effective
    counts (persisted base store + STRICTLY-earlier committed deltas),
    add the in-batch prefix running sum, emit per-event verdicts,
    commit this batch's per-hash delta — both writes idempotent
    per-batch overwrites. Replaying batch N reads exactly the pre-N
    state (its own failed-attempt delta commit is excluded), the
    lesson of the URL gate's replay-corruption fix."""
    from mongodb_cdc_spark.operators.curation import maybe_fold_state

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        ev = bdf.withColumn(
            "delta",
            F.when(F.col("op") == "ins", F.lit(1)).otherwise(F.lit(-1)),
        ).localCheckpoint(eager=True)
        maybe_fold_state(s, delta_dir, batch_id)
        verdicts = refcount_batch_verdicts(
            s, ev, base_store, delta_dir, batch_id
        ).localCheckpoint(eager=True)
        from mongodb_cdc_spark.operators._util import run_parallel

        # verdict write and delta commit are independent projections of
        # the checkpointed verdicts — overlap them (guide §2.6)
        def t_verdicts():
            verdicts.select(
                "doc_id",
                "op",
                "cnt_before",
                F.when(F.col("op") == "ins", F.col("cnt_before") >= 1)
                .otherwise(F.col("cnt_before") == 1)
                .alias("verdict"),
            ).write.mode("overwrite").parquet(f"{target}/batch={batch_id}")

        def t_delta():
            (
                verdicts.groupBy("h")
                .agg(F.sum("delta").cast("bigint").alias("delta"))
                .filter(F.col("delta") != 0)
                .write.mode("overwrite")
                .parquet(f"{delta_dir}/batch={batch_id}")
            )

        run_parallel(t_verdicts, t_delta)

    return apply_batch


_EVENTS_ORACLE_CTES = f"""
cut AS MATERIALIZED (
  SELECT (MAX(doc_id) * 9) // 10 AS c FROM documents
),
events AS MATERIALIZED (
  SELECT (doc_id % {_SEQ_BUCKETS}) * {_SEQ_STRIDE} + doc_id AS seq,
         doc_id, 'ins' AS op, md5(text) AS h
  FROM documents WHERE doc_id > (SELECT c FROM cut)
  UNION ALL
  SELECT (doc_id % {_SEQ_BUCKETS}) * {_SEQ_STRIDE} + doc_id AS seq,
         doc_id, 'del' AS op, md5(text) AS h
  FROM documents
  WHERE doc_id <= (SELECT c FROM cut) AND doc_id % {_FORGET_MOD} = 0
),
base AS MATERIALIZED (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents WHERE doc_id <= (SELECT c FROM cut)
  GROUP BY md5(text)
)
"""


@query(
    "stream_refcount_ingest",
    oracle=f"""
    WITH {_EVENTS_ORACLE_CTES},
    runs AS (
      SELECT seq, doc_id, op, h,
             SUM(CASE WHEN op = 'ins' THEN 1 ELSE -1 END) OVER (
               PARTITION BY h ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS pre
      FROM events
    )
    SELECT r.doc_id, r.op,
           CAST(COALESCE(b.cnt, 0) + COALESCE(r.pre, 0) AS BIGINT)
             AS cnt_before,
           CASE WHEN r.op = 'ins'
                THEN COALESCE(b.cnt, 0) + COALESCE(r.pre, 0) >= 1
                ELSE COALESCE(b.cnt, 0) + COALESCE(r.pre, 0) = 1
           END AS verdict
    FROM runs r LEFT JOIN base b ON b.h = r.h
    ORDER BY r.doc_id ASC
    """,
)
def stream_refcount_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming refcount maintenance (tier block above): drain the
    seq-ordered insert/delete event feed through foreachBatch; each
    micro-batch reads effective counts (base store + strictly-earlier
    committed deltas), adds its in-batch prefix running sum, emits
    per-event verdicts (insert: content already present; delete:
    dropped the last holder), and commits its per-hash delta.
    Hash-checked against DuckDB's from-scratch global running-sum
    recomputation over the same event order.

    Scale: per-batch cost is one broadcast-able narrow-key join of
    batch hashes against the counter state plus a per-hash in-batch
    window (events per hash per batch are few); delta commits are
    hash-cardinality of the batch, additive under the shared fold
    compaction, and fold back into the base store via
    `maintenance_refcount_refresh` — a standing ingest reads zero
    corpus text per wave."""
    from mongodb_cdc_spark.streaming.pipeline import (
        new_scratch_dir,
        run_supervised,
    )

    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    base_store = base_refcount_store_path(spark, sf_dir, cut)
    feed = _refcount_event_feed(spark, sf_dir, cut)
    target = new_scratch_dir("rcgate_target")
    delta_dir = new_scratch_dir("rcgate_delta")
    ckpt = new_scratch_dir("rcgate_ckpt")
    apply_batch = refcount_gate_batch_applier(base_store, target, delta_dir)

    def start_query():
        stream = (
            spark.readStream.schema(
                "seq bigint, doc_id bigint, op string, h string"
            )
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "wave_*.parquet")
            .parquet(feed)
        )
        return (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    run_supervised(start_query, max_restarts=2, restart_delay_s=1.0)
    return (
        spark.read.parquet(target)
        .select("doc_id", "op", "cnt_before", "verdict")
        .orderBy("doc_id")
    )


@query(
    "maintenance_refcount_refresh",
    oracle=f"""
    WITH {_EVENTS_ORACLE_CTES},
    deltas AS MATERIALIZED (
      SELECT h, CAST(SUM(CASE WHEN op = 'ins' THEN 1 ELSE -1 END)
                 AS BIGINT) AS delta
      FROM events GROUP BY h
    ),
    folded AS MATERIALIZED (
      SELECT COALESCE(b.h, d.h) AS h,
             COALESCE(b.cnt, 0) + COALESCE(d.delta, 0) AS cnt
      FROM base b FULL OUTER JOIN deltas d ON d.h = b.h
    ),
    kept AS MATERIALIZED (SELECT h, cnt FROM folded WHERE cnt > 0),
    survivors AS MATERIALIZED (
      SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents
      WHERE doc_id > (SELECT c FROM cut)
         OR doc_id % {_FORGET_MOD} <> 0
      GROUP BY md5(text)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_hashes,
      (SELECT CAST(SUM(cnt) AS BIGINT) FROM kept) AS n_docs,
      CAST(0 AS BIGINT) AS refresh_mismatches
    """,
)
def maintenance_refcount_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The stream's compaction arm: fold the event feed's net per-hash
    deltas into the base refcount store (full-outer add, drop rows at
    <= 0) and prove the folded store equals the from-scratch count over
    the surviving documents (wave inserts plus non-forgotten base) row
    for row — ``refresh_mismatches`` is a REAL full-outer (h, cnt)
    mismatch count, hash-checked at 0. Closes the transaction loop:
    ingest (stream deltas) -> fold (this) -> rollback/purge (the
    subtraction keys) are all exact inverses over the same store.

    Scale: the fold joins narrow counter rows on 16-byte keys —
    delta-cardinality vs store-cardinality, no corpus text; identical
    shape to the url/phash/bitext refresh arms."""
    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    base = spark.read.parquet(
        base_refcount_store_path(spark, sf_dir, cut)
    )
    ins = d.filter(F.col("doc_id") > cut).withColumn("op", F.lit("ins"))
    dels = d.filter(
        (F.col("doc_id") <= cut) & (F.col("doc_id") % _FORGET_MOD == 0)
    ).withColumn("op", F.lit("del"))
    deltas = (
        _event_cols(ins.unionByName(dels))
        .groupBy("h")
        .agg(
            F.sum(
                F.when(F.col("op") == "ins", F.lit(1)).otherwise(F.lit(-1))
            )
            .cast("bigint")
            .alias("delta")
        )
    )
    folded = (
        base.withColumnRenamed("cnt", "bc")
        .join(deltas, "h", "full_outer")
        .select(
            "h",
            (
                F.coalesce("bc", F.lit(0)) + F.coalesce("delta", F.lit(0))
            ).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    survivors = (
        d.filter(
            (F.col("doc_id") > cut)
            | (F.col("doc_id") % _FORGET_MOD != 0)
        )
        .groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mism = (
        folded.withColumnRenamed("cnt", "fc")
        .join(survivors.withColumnRenamed("cnt", "sc"), "h", "full_outer")
        .filter(
            F.col("fc").isNull()
            | F.col("sc").isNull()
            | (F.col("fc") != F.col("sc"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("refresh_mismatches"))
    )
    return (
        folded.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
            F.sum("cnt").cast("bigint").alias("n_docs"),
        )
        .crossJoin(F.broadcast(mism))
        .select("n_hashes", "n_docs", "refresh_mismatches")
    )
