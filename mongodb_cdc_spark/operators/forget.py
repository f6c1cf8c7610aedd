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
