"""SparkSession factory tuned for the engine.

The reference (js:120-146 ``connectToMongoDB``) opens two MongoClient
connections; our analog is a single SparkSession whose configs encode the
engine's performance posture:

* AQE on (runtime join selection, partition coalescing, skew-join splitting)
  — at 100 TB this is what adapts the plan to real shuffle sizes.
* Shuffle partitions sized to the local core count for tests; on a real
  cluster AQE coalescing makes the static number far less critical.
* Arrow enabled so any pandas-UDF path is vectorized, never row-at-a-time.
* Session timezone pinned to UTC so timestamp semantics are engine-stable
  (and match the DuckDB oracle, which is UTC-naive).
* ``nanosAsLong`` because the driver's `events` table carries
  TIMESTAMP(NANOS) parquet, which Spark's reader does not accept natively;
  the io layer converts ns -> a proper timestamp column.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that must hold on ANY session running engine queries, including a
# session the verify driver created itself. All of these are runtime-settable
# SQL confs; ensure_session_confs() applies them defensively.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables (region/nation/customer/supplier/part at any sane SF)
    # stay broadcastable; facts never are. 64 MB keeps star-join dims on the
    # broadcast path even at sf100-equivalent dims.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # The Python Data Source connector (sources/pydatasource.py) declares
    # pushFilters(); Spark refuses to plan it unless pushdown is opted in.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Non-settable in this build — keep going; io layer has fallbacks.
            pass
    try:
        # A session still on Spark's stock 200 shuffle partitions (e.g. the
        # verify driver's default-built session) gets the engine's sizing;
        # deliberate non-default settings are left alone.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "mongodb-cdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults target the test rig (local[N] where N = SPARK_GRAFT_CPUS or 32);
    on a real cluster pass ``master=None`` with externally-managed deploy and
    the same SQL confs apply unchanged.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
    # Driver heap must back the broadcast threshold: the 64 MB limit in
    # RUNTIME_CONFS is an estimate of compressed SCAN size, and the
    # in-memory broadcast build runs 5-10x that (decoded rows + hash
    # relation). Spark's 1 GB default driver heap OOMs building a
    # ~60 MB-on-disk broadcast (hit at the 10x rehearsal); size the heap
    # so the threshold is honest. JVM-start-only conf — applies to
    # sessions this factory creates, not an already-running JVM.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # bucketed-table support (saveAsTable) without polluting the repo:
        # warehouse + metastore live under scratch
        .config("spark.sql.warehouse.dir", f"{scratch}/warehouse")
        .config(
            "spark.driver.extraJavaOptions", f"-Dderby.system.home={scratch}/derby"
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_session_confs(spark)
