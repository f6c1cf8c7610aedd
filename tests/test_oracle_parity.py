"""Differential test: every registered exact-oracle operator must match
DuckDB on the same parquet inputs (row multiset over name-sorted columns).
This mirrors the driver's correctness gate so failures surface here first.
"""

from __future__ import annotations

import pytest

from mongodb_cdc_spark.registry import ORACLES, QUERIES, load_all_operators
from mongodb_cdc_spark.testing import compare_query

load_all_operators()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_exact_oracle_parity(spark, oracle_con, sf_dir, key):
    report = compare_query(spark, key, sf_dir, con=oracle_con)
    assert report.ok, str(report)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()) >= set(e.oracle_sql())
