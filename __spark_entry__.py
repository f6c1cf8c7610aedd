"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The engine itself lives in :mod:`mongodb_cdc_spark`; this module is a thin
adapter over its operator registry (mongodb_cdc_spark/registry.py), which
implements the SURVEY.md §2B inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongodb_cdc_spark.registry import (
    ORACLES,
    QUERIES,
    driver_ordered,
    load_all_operators,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary, SURVEY.md §2B
    `agg_hash_groupby`) on /root/testdata/sf0.001; driver checks rows>0."""
    load_all_operators()
    return QUERIES["agg_hash_groupby"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    load_all_operators()
    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per exactly-checkable operator; keys absent here
    (e.g. approx sketches, MinHash-LSH candidates) get the driver's
    rows-only check."""
    load_all_operators()
    return driver_ordered(ORACLES)
