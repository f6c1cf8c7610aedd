"""Scan operators (SURVEY.md §2B "Scans / sources / sinks", batch side).

The reference's scan is a MongoDB change-stream cursor (js:248
``sourceCollection.watch(...)``); its batch analog here is a parquet
relation scan that Catalyst can push filters/projections into. The
streaming change-feed source lives in
:mod:`mongodb_cdc_spark.sources.changefeed`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full relation scan of `lineitem` (all columns pass through; the
    ms-precision l_shipdate is exactly representable in both engines)."""
    return load_table(spark, sf_dir, "lineitem")
