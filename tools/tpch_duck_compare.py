"""Side-by-side TPC-H wall-times: the engine (Spark, local[N]) vs the
DuckDB oracle, both at sf0.1 (VERDICT r3 item 8's second half).

Method: warm both engines (one full pass each), then time a second full
pass per query — Spark through the noop sink (full materialization, no
driver transfer), DuckDB via fetchall() on the registered oracle SQL.
Prints one JSON line; paste the table into SCALING.md.

Honest-comparison note, stated up front: at sf0.1 (600 k lineitem) a
single-process vectorized engine holds every working set in L2/L3 and
pays zero scheduling cost, while Spark pays per-query fixed costs
(Catalyst analysis, codegen, task scheduling, shuffle setup) that do not
shrink with data size. The interesting signal is the RATIO SHAPE: if
Spark's times are dominated by a roughly constant ~1 s floor rather than
data-proportional work, the gap is the fixed overhead that amortizes
away at the engine's design point (TB-scale inputs, where the same
shuffle machinery is what makes the query finish at all).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from mongodb_cdc_spark.registry import ORACLES, QUERIES, load_all_operators
    from mongodb_cdc_spark.session import get_spark
    from mongodb_cdc_spark.testing import duckdb_connect

    load_all_operators()
    keys = ["agg_hash_groupby"] + [f"sql_tpch_q{i}" for i in range(2, 23)]
    # --only=sql_tpch_q21,sql_tpch_q22 re-times a subset on an idle box
    # (a concurrent pytest run pollutes Spark wall-times; re-run clean).
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = {s.strip() for s in a.split("=", 1)[1].split(",")}
            unknown = only - set(keys)
            if unknown:
                sys.exit(f"--only keys not in the TPC-H set: {sorted(unknown)}")
            keys = [k for k in keys if k in only]
    spark = get_spark(
        app_name="tpch-duck-compare",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(SF)

    rows = {}
    for k in keys:
        # warm pass each side (JIT/codegen/buffer cache), then timed pass
        QUERIES[k](spark, SF).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        QUERIES[k](spark, SF).write.format("noop").mode("overwrite").save()
        spark_s = time.perf_counter() - t0
        con.execute(ORACLES[k]).fetchall()
        t0 = time.perf_counter()
        con.execute(ORACLES[k]).fetchall()
        duck_s = time.perf_counter() - t0
        rows[k] = {
            "spark_s": round(spark_s, 3),
            "duck_s": round(duck_s, 3),
            "ratio": round(spark_s / duck_s, 1) if duck_s > 0 else None,
        }
        print(f"  {k:18s} spark {spark_s:6.2f}s  duck {duck_s:6.3f}s", flush=True)
    print(json.dumps({"sf": SF, "tpch": rows}))


if __name__ == "__main__":
    main()
