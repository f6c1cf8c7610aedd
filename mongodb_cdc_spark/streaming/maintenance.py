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
