"""Operator registry: the SURVEY.md §2B contract, code-side.

Every engine operator registers a ``(spark, sf_dir) -> DataFrame`` callable
and (when exactly SQL-expressible) a DuckDB oracle SQL string. This is the
single source `__spark_entry__.py` re-exports, and the differential-testing
spine (SURVEY.md §5.1): the driver hash-compares Spark vs DuckDB results at
sf0.01, generalizing the reference's own diff-the-two-sides reconciliation
philosophy (js:457-475).

Determinism disciplines enforced by convention in every registered pair:

* double aggregates run as ``sum(CAST(x AS DECIMAL(18,2)))`` — decimal
  addition is exact and associative, so partial-aggregation order (which
  differs between engines AND between runs) cannot change the result; the
  final value is cast back to double after rounding.
* every ordered / top-k output carries a unique tiebreak key.
* raw timestamp columns never appear in exact-oracle output — they are
  projected as epoch-second BIGINTs (Spark sees µs precision, DuckDB ns;
  floor-to-second is stable under that truncation).
* column names are aliased identically on both sides (driver sorts columns
  by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine operator under ``key``.

    ``oracle`` is the equivalent DuckDB SQL (None for ops with no faithful
    SQL formulation — the driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registration side-effects run."""
    from mongodb_cdc_spark import operators  # noqa: F401

    operators.load()
