"""Maintenance operators: the table-hygiene pass a continuously-written
CDC target needs (reference R7's target table, js:188-199, accumulates
one write per batch forever; the reference never compacts because Mongo
does it server-side — a parquet-backed target must own it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
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
