"""Change-feed source (SURVEY.md §2B `source_changefeed`; reference R1).

The reference opens a resumable MongoDB change-stream cursor (js:248
``sourceCollection.watch(pipeline, options)``) carrying events shaped
js:160-184: ``{_id: resumeToken, operationType, clusterTime, documentKey,
fullDocument}``. Here that source is a factory:

* **tests/local**: a file-backed Structured Streaming source over a
  deterministically derived change-event log (from the driver's `events`
  table — no new data is synthesized, FIXTURES.md §B);
* **production**: the MongoDB Spark connector's change-stream mode —
  `mongo_stream_options` builds the reader config (connector jar not
  present in this environment, so it is config-only, guarded at call
  time).

The derivation rule (deterministic, FIXTURES.md §B): per user, the first
event is an ``insert``, later ones are ``update``; `error` events play
the role of ``delete`` ops, which the pipeline MUST drop (js:159-177
handles only insert/update; deletes fall through silently).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from mongodb_cdc_spark.io import load_table

# Bump when the derivation rule changes to invalidate cached logs.
LOG_VERSION = "v2"

EVENT_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),  # resume token (js:258)
        StructField("operationType", StringType(), False),  # js:160
        StructField("clusterTime", TimestampType(), False),  # js:227 — ltz:
        # watermarks require TIMESTAMP, not TIMESTAMP_NTZ (session tz is UTC)
        StructField(
            "documentKey",
            StructType([StructField("_id", LongType(), False)]),
            False,
        ),  # js:170
        StructField(
            "fullDocument",
            StructType(
                [
                    StructField("_id", LongType(), False),
                    StructField("event_type", StringType(), True),
                    StructField("value", DoubleType(), True),
                    StructField("props", StringType(), True),
                ]
            ),
            True,
        ),  # js:163/171
    ]
)


def derive_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-derive the change-event log from `events` (deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .select(
            F.format_string("%012d", F.col("event_id")).alias("_id"),
            F.when(F.col("event_type") == "error", "delete")
            .when(F.col("rn") == 1, "insert")
            .otherwise("update")
            .alias("operationType"),
            F.col("ts").cast("timestamp").alias("clusterTime"),
            F.struct(F.col("user_id").alias("_id")).alias("documentKey"),
            F.struct(
                F.col("user_id").alias("_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            ).alias("fullDocument"),
        )
    )


def scratch_root() -> str:
    root = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
    os.makedirs(root, exist_ok=True)
    return root


def write_change_log(
    spark: SparkSession, sf_dir: str, n_files: int = 4, duplicate: bool = False
) -> str:
    """Materialize the change log as parquet files for the streaming
    source. Cached by (sf, variant, LOG_VERSION) — content is a pure
    function of the input table. ``duplicate=True`` appends a second copy
    of every event (for replay/dedup tests, R9)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    variant = "dup" if duplicate else "plain"
    path = os.path.join(
        scratch_root(), f"changelog_{sf_name}_{variant}_{LOG_VERSION}_{n_files}"
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    log = derive_change_log(spark, sf_dir)
    if duplicate:
        log = log.unionByName(log)
    log.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def read_changefeed_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """File-backed streaming change feed: an unbounded DataFrame with the
    reference's change-event schema. ``maxFilesPerTrigger`` forces
    multi-micro-batch execution so stateful operators actually cross
    batch boundaries in tests."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def mongo_stream_options(
    uri: str,
    database: str,
    collection: str,
    full_document: str = "updateLookup",
) -> dict[str, str]:
    """Production reader options for the MongoDB Spark connector's
    change-stream mode — the direct analog of the reference's watch()
    options (js:235-245: fullDocument='updateLookup', resumeAfter /
    startAtOperationTime are subsumed by Spark's checkpointLocation).
    Usage: ``spark.readStream.format("mongodb").options(**opts).load()``
    (requires the mongo-spark-connector jar, not bundled here)."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "change.stream.publish.full.document.only": "false",
        "change.stream.lookup.full.document": full_document,
    }
