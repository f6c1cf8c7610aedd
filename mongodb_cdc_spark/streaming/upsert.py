"""Idempotent upsert sink (SURVEY.md §2B `sink_upsert_foreachbatch`;
reference R7-R9).

The reference applies each micro-batch as an unordered bulk write of
``insertOne`` / ``updateOne{upsert:true}`` ops keyed by ``_id``
(js:157-199) and explicitly documents its delivery contract: checkpoint
lag may replay events, and the upsert makes replay safe (js:114-115,
js:171-173). This module is the same contract on Spark: at-least-once
``foreachBatch`` + an idempotent keyed MERGE => effectively exactly-once
end state.

MERGE target: with Delta/Iceberg on the classpath this is literally
``MERGE INTO target USING batch ON target._id = batch._id WHEN MATCHED
UPDATE * WHEN NOT MATCHED INSERT *`` (or the Mongo connector's upsert
write in production). Neither jar ships in this environment, so the
bundled target is a hash-bucketed versioned-parquet key-value table with
the same semantics. Because "latest" is decided by the event's own
(clusterTime, token) — not arrival time — the merge is a semilattice
join: replays and reorderings cannot change the fixpoint.

Scale design — per-batch work is O(batch + touched buckets), NOT
O(total state): the table is hash-partitioned into ``n_buckets`` by
``pmod(xxhash64(_id), n)``, each bucket keeping its own version chain
(``bucket=B/v...``). A micro-batch merges and rewrites ONLY the buckets
its keys hash into; untouched buckets keep serving their last committed
version. At reference scale (md:176: 5M+ events/day over a large key
space) a batch of ~10k keys against a billion-key state touches a
bounded fraction of buckets — the previous design (read whole state,
window over ALL keys, rewrite whole table every batch) was O(state) per
batch, quadratic over a day of micro-batches. Size ``n_buckets`` so one
bucket's state fits an executor comfortably (the same sizing rule as
``spark.sql.shuffle.partitions``); the true 100 TB swap-in remains Delta
MERGE, isolated behind ``merge_fn``.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Columns of the materialized state table.
STATE_COLUMNS = ("_id", "event_type", "value", "props", "cluster_ts", "token")


class MergeTarget(Protocol):
    """The sink seam: anything with an idempotent keyed ``merge_batch``.

    ``ParquetUpsertTarget`` is the bundled implementation; the 100 TB
    swap-in is a Delta/Iceberg ``MERGE INTO`` (or the Mongo connector's
    bulk upsert) behind the same one-method contract — the pipeline
    builder and ``foreach_batch_upsert`` never see anything beyond it."""

    def merge_batch(self, batch: DataFrame, epoch_id: int) -> None: ...

_COMMIT_MARKER = "_COMMITTED"


class ParquetUpsertTarget:
    """Hash-bucketed versioned-parquet keyed table with MERGE-upsert
    semantics. Layout: ``path/bucket=B/v<mono>/part-*.parquet`` plus a
    commit marker per version; readers only see marker-committed
    versions, so a crash mid-write is invisible (and replay of the same
    batch converges to the same state — the merge is idempotent)."""

    def __init__(
        self,
        path: str,
        n_buckets: int = 16,
        keep_versions: int = 2,
        aqe_in_merge: bool = False,
    ):
        self.path = path
        self.n_buckets = n_buckets
        if keep_versions < 1:
            # keep_versions=0 would make the retention slice [:None] and
            # delete EVERY manifest/version including the one just
            # written — silently destroying the snapshot log.
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        self.keep_versions = keep_versions
        # Micro-batch merge jobs are latency-sensitive and their partition
        # sizes are bounded by construction (that is what the bucketing is
        # for), so AQE's per-stage materialize-and-replan adds latency
        # without a decision to improve. Leave False unless individual
        # buckets grow past executor comfort.
        self.aqe_in_merge = aqe_in_merge
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ layout --
    def _bucket_dir(self, b: int) -> str:
        return os.path.join(self.path, f"bucket={b}")

    def _bucket_versions(self, b: int) -> list[str]:
        bdir = self._bucket_dir(b)
        if not os.path.isdir(bdir):
            return []
        return sorted(
            v
            for v in os.listdir(bdir)
            if v.startswith("v")
            and os.path.exists(os.path.join(bdir, v, _COMMIT_MARKER))
        )

    def _latest_bucket_paths(self, buckets: list[int] | None = None) -> list[str]:
        out = []
        for b in buckets if buckets is not None else range(self.n_buckets):
            vs = self._bucket_versions(b)
            if vs:
                out.append(os.path.join(self._bucket_dir(b), vs[-1]))
        return out

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.xxhash64("_id"), F.lit(self.n_buckets))

    # ------------------------------------------------------------ reads ---
    def current(self, spark: SparkSession) -> DataFrame | None:
        paths = self._latest_bucket_paths()
        if not paths:
            return None
        return spark.read.parquet(*paths).select(*STATE_COLUMNS)

    # ------------------------------------------------------------ merge ---
    def _reduce(self, df: DataFrame, n_parts: int) -> DataFrame:
        """Latest-per-key, bucket-partitioned, in ONE shuffle:
        ``repartition(n, __bucket)`` then ``groupBy(__bucket, _id)`` —
        hash partitioning on __bucket alone satisfies the aggregate's
        clustered distribution on (__bucket, _id) because __bucket is a
        function of _id, so Catalyst inserts no second exchange, and the
        output stays laid out one-task-per-bucket for a partitioned write
        (~1 file per bucket, no sliver files).

        Latest-per-key is ``max(struct(cluster_ts, token, payload...))``:
        lexicographic struct comparison with the ordering columns leading
        — a map-side-combinable aggregate (duplicate keys collapse before
        the shuffle), unlike the row_number-window formulation."""
        m = F.max(
            F.struct("cluster_ts", "token", "event_type", "value", "props")
        ).alias("m")
        return (
            df.withColumn("__bucket", self._bucket_col())
            .repartition(n_parts, "__bucket")
            .groupBy("__bucket", "_id")
            .agg(m)
            .select(
                "__bucket",
                "_id",
                F.col("m.event_type").alias("event_type"),
                F.col("m.value").alias("value"),
                F.col("m.props").alias("props"),
                F.col("m.cluster_ts").alias("cluster_ts"),
                F.col("m.token").alias("token"),
            )
        )

    def _commit_staged(self, stage: str, version: str, buckets: list[int]) -> None:
        for b in buckets:
            src = os.path.join(stage, f"__bucket={b}")
            if not os.path.isdir(src):
                continue
            bdir = self._bucket_dir(b)
            os.makedirs(bdir, exist_ok=True)
            dst = os.path.join(bdir, version)
            os.rename(src, dst)
            with open(os.path.join(dst, _COMMIT_MARKER), "w"):
                pass
            self._prune(b)
        self._write_snapshot_manifest(version, buckets)

    # -------------------------------------------------------- snapshots --
    # Table-level commit log (the Iceberg/Delta snapshot concept): each
    # merge appends one manifest naming every bucket's committed version
    # at that instant. Buckets version independently, so WITHOUT the log
    # there is no consistent whole-table cut; with it, any recorded
    # version is readable (time travel) and two snapshots diff by
    # COMPARING MANIFESTS — only buckets whose version changed are ever
    # read, the file-skipping diff that makes incremental consumers
    # O(changed data) instead of O(table).

    def _log_dir(self) -> str:
        return os.path.join(self.path, "_log")

    def _write_snapshot_manifest(
        self, version: str, touched: list[int] | None = None
    ) -> None:
        """Append one manifest. Incremental: start from the previous
        manifest and overwrite only the touched buckets' entries — the
        merge path stays O(batch + touched buckets), never a full
        n_buckets x versions listdir sweep. Manifest retention mirrors
        bucket retention: only the last ``keep_versions`` manifests stay
        listed (older ones may reference bucket versions _prune has
        deleted, so advertising them invites the pruned-read error)."""
        import json

        snaps = self.snapshots()
        if snaps and touched is not None:
            mapping = dict(self._manifest(snaps[-1]))
            for b in touched:
                vs = self._bucket_versions(b)
                if vs:
                    mapping[str(b)] = vs[-1]
        else:
            mapping = {}
            for b in range(self.n_buckets):
                vs = self._bucket_versions(b)
                if vs:
                    mapping[str(b)] = vs[-1]
        os.makedirs(self._log_dir(), exist_ok=True)
        tmp = os.path.join(self._log_dir(), f".{version}.tmp")
        with open(tmp, "w") as f:
            json.dump({"version": version, "buckets": mapping}, f)
        os.rename(tmp, os.path.join(self._log_dir(), f"{version}.json"))
        for old_v in self.snapshots()[: -self.keep_versions or None]:
            try:
                os.remove(os.path.join(self._log_dir(), f"{old_v}.json"))
            except OSError:
                pass

    def snapshots(self) -> list[str]:
        """Committed table versions, oldest first."""
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            f[:-5] for f in os.listdir(d)
            if f.endswith(".json") and not f.startswith(".")
        )

    def _manifest(self, version: str) -> dict[str, str]:
        import json

        p = os.path.join(self._log_dir(), f"{version}.json")
        if not os.path.exists(p):
            # name the pruned-read contract HERE too: retention deletes
            # the manifest json first, so without this check a pruned
            # version surfaced as a bare open() stack instead of the
            # documented error (the bucket-level check below it never ran)
            raise FileNotFoundError(
                f"snapshot {version} was pruned from the manifest log "
                f"(keep_versions={self.keep_versions}); raise keep_versions "
                "to retain deeper time travel"
            )
        with open(p) as f:
            return json.load(f)["buckets"]

    def _bucket_version_path(self, b: str, v: str, context: str) -> str:
        """Committed path of bucket ``b`` at version ``v``, or a named
        error if _prune already removed it (shared by every snapshot
        reader so the pruned-read contract cannot drift)."""
        path = os.path.join(self._bucket_dir(int(b)), v)
        if not os.path.exists(os.path.join(path, _COMMIT_MARKER)):
            raise FileNotFoundError(
                f"{context}: bucket {b} version {v} was pruned "
                f"(keep_versions={self.keep_versions}); raise keep_versions "
                "to retain deeper time travel"
            )
        return path

    def _snapshot_paths(self, version: str) -> list[str]:
        return [
            self._bucket_version_path(b, v, f"snapshot {version}")
            for b, v in self._manifest(version).items()
        ]

    def read_snapshot(
        self, spark: SparkSession, version: str | None = None
    ) -> DataFrame | None:
        """Table state AS OF a committed snapshot (default: latest) —
        time travel over the manifest, same contract as Delta's
        ``VERSION AS OF``."""
        snaps = self.snapshots()
        if not snaps:
            return None
        version = version or snaps[-1]
        paths = self._snapshot_paths(version)
        if not paths:
            return None
        return spark.read.parquet(*paths).select(*STATE_COLUMNS)

    def snapshot_diff(
        self, spark: SparkSession, v_from: str, v_to: str
    ) -> DataFrame:
        """Keys that changed between two snapshots, classified
        insert/update, reading ONLY buckets whose manifest entry changed
        (file skipping: unchanged buckets are proven identical by the
        manifest, no data read). Returns (_id, change) rows."""
        m_from, m_to = self._manifest(v_from), self._manifest(v_to)
        changed = [
            b for b in m_to
            if m_from.get(b) != m_to[b]
        ]
        if not changed:
            return spark.createDataFrame([], "_id bigint, change string")
        old_paths = [
            self._bucket_version_path(b, m_from[b], "snapshot diff")
            for b in changed
            if b in m_from
        ]
        new_paths = [
            self._bucket_version_path(b, m_to[b], "snapshot diff")
            for b in changed
        ]
        new = spark.read.parquet(*new_paths).select(
            "_id", "cluster_ts", "token"
        )
        if not old_paths:
            return new.select("_id", F.lit("insert").alias("change"))
        old = spark.read.parquet(*old_paths).select(
            "_id",
            F.col("cluster_ts").alias("old_ts"),
            F.col("token").alias("old_token"),
        )
        j = new.join(old, "_id", "left")
        return j.select(
            "_id",
            F.when(F.col("old_ts").isNull(), "insert")
            .when(
                (F.col("cluster_ts") != F.col("old_ts"))
                | (F.col("token") != F.col("old_token")),
                "update",
            )
            .otherwise("unchanged")
            .alias("change"),
        ).filter(F.col("change") != "unchanged")

    def merge_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """MERGE: latest-per-key of (touched-bucket state ∪ batch),
        decided by (cluster_ts, token) — idempotent under replay by
        construction. Only buckets containing a batch key are read and
        rewritten. Two jobs, one parquet write: the batch is reduced to
        latest-per-key and CACHED (the only scan of the streaming source,
        so input metrics stay honest; the touched-bucket list is a tiny
        collect over the cache), then one job unions the cached rows with
        the touched buckets' current state, re-reduces, and stage-writes
        partitioned by bucket; commit is per-bucket rename + marker."""
        spark = batch.sparkSession
        aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
        if not self.aqe_in_merge:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            self._merge_batch_inner(spark, batch)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_before)

    def _next_version(self) -> str:
        """Strictly increasing across process restarts: wall clock,
        clamped above every committed version (monotonic_ns would reset
        on restart and new commits would sort BEFORE existing state;
        wall clock alone could step backwards under clock adjustment)."""
        prev = max(
            (
                int(v[1:])
                for b in range(self.n_buckets)
                for v in self._bucket_versions(b)
            ),
            default=0,
        )
        return f"v{max(time.time_ns(), prev + 1):020d}"

    def _merge_batch_inner(self, spark: SparkSession, batch: DataFrame) -> None:
        version = self._next_version()
        stage = os.path.join(self.path, ".staging", version)
        reduced = self._reduce(batch.select(*STATE_COLUMNS), self.n_buckets).persist()
        try:
            # partial collect_set per cache partition + 1-task final: far
            # cheaper than distinct() (which would shuffle into
            # spark.sql.shuffle.partitions tasks for a <= n_buckets result)
            touched = sorted(
                reduced.agg(F.collect_set("__bucket")).first()[0]
            )
            if not touched:
                return
            cur_paths = self._latest_bucket_paths(touched)
            out = reduced
            if cur_paths:
                combined = reduced.select(*STATE_COLUMNS).unionByName(
                    spark.read.parquet(*cur_paths).select(*STATE_COLUMNS)
                )
                out = self._reduce(combined, max(len(touched), 1))
            out.write.partitionBy("__bucket").mode("overwrite").parquet(stage)
            self._commit_staged(stage, version, touched)
        finally:
            reduced.unpersist()
            shutil.rmtree(os.path.join(self.path, ".staging"), ignore_errors=True)

    def _prune(self, b: int) -> None:
        """Bound disk: drop all but the last ``keep_versions`` committed
        versions of a bucket (the previous version is kept as a rollback
        point, mirroring the old whole-table version chain)."""
        vs = self._bucket_versions(b)
        for v in vs[: -self.keep_versions or None]:
            shutil.rmtree(os.path.join(self._bucket_dir(b), v), ignore_errors=True)


def upsert_projection(events: DataFrame) -> DataFrame:
    """R2+R6: keep inserts/updates (deletes dropped, js:159-177), project
    the fullDocument payload plus the ordering columns the merge needs."""
    return events.filter(
        F.col("operationType").isin("insert", "update")
    ).select(
        F.col("fullDocument._id").alias("_id"),
        F.col("fullDocument.event_type").alias("event_type"),
        F.col("fullDocument.value").alias("value"),
        F.col("fullDocument.props").alias("props"),
        F.col("clusterTime").alias("cluster_ts"),
        F.col("_id").alias("token"),
    )


def foreach_batch_upsert(target: MergeTarget):
    """The ``foreachBatch`` function: project + MERGE each micro-batch —
    js:251-282's accumulate-and-flush loop, with Spark supplying the
    batching, retries, and offset tracking."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        target.merge_batch(upsert_projection(batch_df), epoch_id)

    return fn


def invalid_event_predicate() -> F.Column:
    """An event the MERGE cannot apply: no document key, no payload, or
    an op type outside the CDC contract. The reference would crash its
    batch loop on these (js:161-174 reads fields unguarded); a production
    pipeline quarantines them instead."""
    return (
        F.col("documentKey._id").isNull()
        | F.col("fullDocument").isNull()
        | ~F.col("operationType").isin("insert", "update", "delete")
    )


def foreach_batch_upsert_with_dlq(target: MergeTarget, dlq_path: str):
    """foreachBatch with dead-letter routing: malformed events append to
    a quarantine parquet (with the epoch id for replay provenance);
    well-formed events MERGE as usual. The batch stays atomic per path —
    the DLQ append is idempotent-safe because replays rewrite the same
    rows keyed by (token, batch_id), and the main path is the idempotent
    MERGE. At 100 TB this is the difference between one poison event
    stalling replication (reference behavior: crash + restart loop,
    js:286-299) and a bounded quarantine a human inspects later."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from mongodb_cdc_spark.operators._util import run_parallel

        # Round 12 (guide §1.2/§2.6): the old shape ran three sequential
        # jobs per micro-batch — a bad.limit(1).count() existence probe,
        # the quarantine append, then the MERGE. The probe is dropped
        # (an append of a bad-free batch writes a zero-row part file:
        # same DLQ rows, and the path always carries a schema for the
        # final read), and the quarantine append overlaps the MERGE —
        # they share no output (different directories) and each scans
        # the micro-batch independently.
        def t_dlq():
            (
                batch_df.filter(invalid_event_predicate())
                .withColumn("batch_id", F.lit(epoch_id))
                .write.mode("append")
                .parquet(dlq_path)
            )

        def t_merge():
            good = batch_df.filter(~invalid_event_predicate())
            target.merge_batch(upsert_projection(good), epoch_id)

        run_parallel(t_dlq, t_merge)

    return fn
