"""Table maintenance: small-file compaction for streaming sink output.

Every append-mode streaming sink (`sink_append_parquet`, the versioned
upsert buckets) emits one file per micro-batch per partition — at the
reference's event rates (md:176: 5M+ events/day) that is thousands of
tiny files per day, and at 100 TB the file-listing + open overhead
dominates scan time long before the bytes do. Compaction is the standard
background fix: rewrite a directory's many small files into few
well-sized ones, atomically, without changing a single row.

The rewrite itself is one distributed pass — `spark.read` of the
fragmented directory, `repartition(target)`, write to a staging path,
then swap. Sizing: pick `target_files` ~ total_bytes / 128 MB (the
parquet sweet spot); `maxRecordsPerFile` caps stragglers when rows are
wide. On a real lakehouse this is `OPTIMIZE` / `rewrite_data_files`;
the semantics verified here (row multiset preserved, file count reduced)
are exactly those.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet_dir(
    spark: SparkSession, path: str, target_files: int, max_records_per_file: int = 0
) -> None:
    """Rewrite ``path``'s parquet files into ``target_files`` files.

    Staging-then-swap: the rewrite lands in a sibling staging dir and
    replaces the original only after the write commits, so a crashed
    compaction leaves the table readable (the swap is the non-atomic
    seam a real lakehouse closes with metadata transactions)."""
    staging = path.rstrip("/") + ".compacting"
    writer = spark.read.parquet(path).repartition(target_files).write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)


#: Default VACUUM retention: debris younger than this is left alone, so
#: a vacuum racing an in-flight merge_batch (staged write not yet
#: renamed; renamed dir not yet marked _COMMITTED; marked dir not yet in
#: the manifest) can never delete the writer's work — the same reason
#: Delta/Iceberg gate VACUUM on a retention age. One day is generous
#: against any real write latency while still draining crash debris on
#: the next scheduled sweep.
VACUUM_RETENTION_S = 24 * 3600


def vacuum_orphans(target, retention_s: float = VACUUM_RETENTION_S) -> dict[str, int]:
    """Delete unreachable files from a :class:`ParquetUpsertTarget` —
    the VACUUM every versioned table needs, because crashes leave three
    kinds of debris the snapshot protocol makes invisible to readers
    but never deletes:

    * **uncommitted version dirs** (crash between stage-rename and the
      ``_COMMITTED`` marker) — never readable, pure waste;
    * **committed-but-unreferenced version dirs** (crash between the
      marker and the manifest append, or versions aged out of every
      retained manifest) — unreachable through any retained snapshot;
    * **stale staging dirs** (crash mid-write under ``.staging/``).

    Reachability is computed from the retained manifest log (the union
    of every snapshot's bucket->version map), so every snapshot that
    `read_snapshot` can serve keeps every file it needs — the same
    log-is-truth rule Delta/Iceberg VACUUM follows. Returns counts per
    debris class.

    Concurrency: deletion of staging dirs and marker-less version dirs
    is gated on ``retention_s`` (mtime age, default
    :data:`VACUUM_RETENTION_S`): merge_batch stages under
    ``.staging/<version>``, renames, and only then writes
    ``_COMMITTED`` / appends the manifest — so without the age gate a
    vacuum racing a live writer could delete an in-flight staged write
    or a renamed-but-not-yet-marked version dir. Debris younger than
    the window is counted as ``retained_young`` and left for the next
    sweep, the Delta/Iceberg VACUUM contract. Tests that fabricate
    fresh debris pass ``retention_s=0`` explicitly (single-writer by
    construction there).

    Scale: the scan is one directory listing per bucket (metadata-only,
    no data read); at real table sizes the listing fans out through the
    object store's prefix API exactly like the merge path's own
    bucket listing, and the deletes are embarrassingly parallel."""
    import shutil
    import time

    now = time.time()

    def _old_enough(path: str) -> bool:
        try:
            return (now - os.path.getmtime(path)) >= retention_s
        except OSError:
            return False  # vanished under us: someone else's problem

    referenced: set[str] = set()
    for v in target.snapshots():
        for b, bv in target._manifest(v).items():
            referenced.add(
                os.path.abspath(os.path.join(target.path, f"bucket={b}", bv))
            )
    removed = {
        "uncommitted": 0,
        "unreferenced": 0,
        "staging": 0,
        "retained_young": 0,
    }
    staging = os.path.join(target.path, ".staging")
    if os.path.isdir(staging):
        for s in os.listdir(staging):
            sfull = os.path.join(staging, s)
            if not _old_enough(sfull):
                removed["retained_young"] += 1
                continue
            shutil.rmtree(sfull, ignore_errors=True)
            removed["staging"] += 1
    for name in os.listdir(target.path):
        bdir = os.path.join(target.path, name)
        if not (name.startswith("bucket=") and os.path.isdir(bdir)):
            continue
        for vdir in os.listdir(bdir):
            if not vdir.startswith("v"):
                continue
            vfull = os.path.abspath(os.path.join(bdir, vdir))
            if not os.path.exists(os.path.join(vfull, "_COMMITTED")):
                if not _old_enough(vfull):
                    removed["retained_young"] += 1
                    continue
                shutil.rmtree(vfull, ignore_errors=True)
                removed["uncommitted"] += 1
            elif vfull not in referenced:
                # a marked dir missing from every retained manifest is
                # either crash debris or aged out of the log; the same
                # pre-manifest race applies, so the gate applies too
                if not _old_enough(vfull):
                    removed["retained_young"] += 1
                    continue
                shutil.rmtree(vfull, ignore_errors=True)
                removed["unreferenced"] += 1
    return removed
