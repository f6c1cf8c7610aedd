"""Table IO over the driver's parquet star schema.

Mirrors the reference's "collection handle" layer (js:133-137
``sourceCollection`` / ``targetCollection``) as DataFrame loaders. One
deliberate divergence from schema-on-read BSON (SURVEY.md §1.2): each table
gets a static Catalyst schema straight from the parquet footer, with the
``events.props`` JSON-string column kept as the open-attribute escape hatch
(parsed per-query with ``get_json_object`` / ``from_json``).

Scale note: loaders return *lazy* scans — no caching, no collect — so
Catalyst sees the raw parquet relation and can push filters/projections into
the scan (verify with ``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import threading as _threading
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.session import ensure_session_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# ------------------------------------------------------------------------
# Per-query-invocation scan reuse (optimization guide §6 file listing /
# round-11 VERDICT item 7). Building a parquet scan is driver-side work —
# footer/schema read, file listing, a handful of py4j round trips — paid on
# EVERY load_table call. Queries that read the same table several times in
# one invocation (store builder + eval arms, register_views + direct loads)
# re-pay it for an identical immutable relation. The registry wrapper opens
# a scope per query invocation; inside it, load_table returns the SAME lazy
# DataFrame handle for a repeated (session, sf_dir, table). The scope dies
# when the invocation returns — nothing persists across queries (reuse
# across bench/oracle runs would be result caching; this is not: the handle
# is a lazy plan over the raw parquet, recomputed by every action).
# Process-global with a depth counter (not thread-local) so run_parallel
# worker threads inside one invocation share the scope; queries never run
# concurrently from independent top-level callers in the bench or driver.
_scan_lock = _threading.Lock()
_scan_cache: dict | None = None
_scan_depth = 0


@_contextmanager
def scan_scope():
    """Scope one query invocation's scan-handle reuse (re-entrant)."""
    global _scan_cache, _scan_depth
    with _scan_lock:
        if _scan_depth == 0:
            _scan_cache = {}
        _scan_depth += 1
    try:
        yield
    finally:
        with _scan_lock:
            _scan_depth -= 1
            if _scan_depth == 0:
                _scan_cache = None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a lazy DataFrame scan.

    ``events.ts`` arrives as parquet TIMESTAMP(NANOS) which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a
    raw ns-epoch long, converted here to TIMESTAMP_NTZ at microsecond
    precision. Integer ``DIV`` (never ``/``) — ns epochs (~1.7e18) exceed
    double's 2^53 exact-integer range, so float division would corrupt
    timestamps.
    """
    key = (id(spark), sf_dir, name)
    with _scan_lock:
        if _scan_cache is not None and key in _scan_cache:
            return _scan_cache[key]
        # inside a scan scope the registry wrapper already ran
        # ensure_session_confs on this session (it opens the scope right
        # after) — skip re-asserting ~8 confs per load via py4j
        confs_done = (
            _scan_cache is not None and ("__confs__", id(spark)) in _scan_cache
        )
    if not confs_done:
        ensure_session_confs(spark)
        with _scan_lock:
            if _scan_cache is not None:
                _scan_cache[("__confs__", id(spark))] = True
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    with _scan_lock:
        if _scan_cache is not None:
            _scan_cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``t = load_tables(spark, d, "orders", ...)``."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API surface.

    Round 12 (guide §2.6/§6): building one parquet scan is ~0.1 s of
    driver-side work (footer read, listing, py4j round trips); ~50
    registered queries call this, and the sequential 10-table loop cost
    ~1 s per call. The ten loads are independent — run them from the
    shared bounded pool. View registration itself stays in the caller
    thread (catalog mutation order is irrelevant; names are distinct)."""
    from mongodb_cdc_spark.operators._util import run_parallel

    frames = run_parallel(
        *((lambda name: lambda: load_table(spark, sf_dir, name))(n)
          for n in TABLE_NAMES)
    )
    for n, df in zip(TABLE_NAMES, frames):
        df.createOrReplaceTempView(n)
