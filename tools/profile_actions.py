#!/usr/bin/env python
"""Per-action profiler for a registered query (guide §1: measure first).

Monkeypatches the eager seams — ``DataFrame.localCheckpoint``,
``DataFrameWriter.parquet``/``save``, ``DataFrame.collect`` — to time
every Spark action a query triggers and attribute it to the repo
source line that issued it. foreachBatch-heavy operators are opaque
to .explain() (the per-batch work happens inside callbacks), so this
is the measurement tool for the streaming tier: it answers "which of
the ~20 actions per micro-batch is the money" without the (disabled)
Spark UI.

Usage: python tools/profile_actions.py <query_key> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AGG: dict[str, list[float]] = defaultdict(list)
T_WALL = [0.0]


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/mongodb_cdc_spark/" in fn or fn.endswith("__spark_entry__.py"):
            return f"{os.path.basename(fn)}:{fr.lineno} {fr.name}"
    return "external"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        dt = time.perf_counter() - t0
        AGG[f"{name} @ {_site()}"].append(dt)
        T_WALL[0] += dt
        return out

    setattr(cls, name, timed)


def main() -> None:
    key = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    _wrap(DataFrame, "localCheckpoint")
    _wrap(DataFrame, "collect")
    _wrap(DataFrame, "count")
    _wrap(DataFrame, "toPandas")
    _wrap(DataFrameWriter, "parquet")
    _wrap(DataFrameWriter, "save")
    _wrap(DataFrameReader, "parquet")

    # per-micro-batch wall time: wrap every foreachBatch callback
    from pyspark.sql.streaming.readwriter import DataStreamWriter

    orig_feb = DataStreamWriter.foreachBatch

    def timed_feb(self, fn):
        def wrapped(bdf, bid):
            t0 = time.perf_counter()
            fn(bdf, bid)
            AGG[f"BATCH #{bid} wall"].append(time.perf_counter() - t0)

        return orig_feb(self, wrapped)

    DataStreamWriter.foreachBatch = timed_feb

    from mongodb_cdc_spark.registry import QUERIES, load_all_operators
    from mongodb_cdc_spark.session import get_spark

    spark = get_spark("profile-actions")
    load_all_operators()
    # warm like bench.py so JIT/worker startup is not billed to the query
    QUERIES["agg_cdc_batch_stats"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    AGG.clear()
    T_WALL[0] = 0.0

    t0 = time.perf_counter()
    QUERIES[key](spark, sf).write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0

    print(f"\n=== {key} @ {sf}: total {total:.2f}s, "
          f"timed actions {T_WALL[0]:.2f}s ===")
    rows = sorted(AGG.items(), key=lambda kv: -sum(kv[1]))
    for site, ds in rows:
        print(f"{sum(ds):8.2f}s  n={len(ds):3d}  avg={sum(ds)/len(ds):6.3f}  {site}")
    spark.stop()


if __name__ == "__main__":
    main()
