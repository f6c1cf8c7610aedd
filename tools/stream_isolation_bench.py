"""Isolated CDC-streaming drain bench (r2-verdict item-4 method).

Runs ONLY the foreachBatch replication drain — no prior suite, fresh JVM —
so a regression here is attributable to the streaming path itself, not
whole-suite contention. Usage:

    python tools/stream_isolation_bench.py [sf_dir] [n_runs]

Prints one JSON line per run plus a median summary.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

from mongodb_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mongodb_cdc_spark.sources.changefeed import (
        derive_change_log,
        write_change_log,
    )
    from mongodb_cdc_spark.streaming.pipeline import (
        new_scratch_dir,
        run_to_completion,
        start_cdc_replication,
    )
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    spark = get_spark("stream-isolation-bench")
    log_path = write_change_log(spark, sf_dir)
    n_events = derive_change_log(spark, sf_dir).count()

    # One warm drain at sf0.001 so run 1 doesn't bill state-store +
    # foreachBatch plan compilation.
    warm_sf = sf_dir.replace("sf0.1", "sf0.001")
    if warm_sf != sf_dir:
        wlog = write_change_log(spark, warm_sf)
        wt = ParquetUpsertTarget(new_scratch_dir("iso_warm_target"))
        run_to_completion(
            start_cdc_replication(
                spark, wlog, wt, new_scratch_dir("iso_warm_ckpt"),
                max_files_per_trigger=2,
            )
        )
        shutil.rmtree(wt.path, ignore_errors=True)

    secs = []
    for i in range(n_runs):
        target = ParquetUpsertTarget(new_scratch_dir(f"iso_target_{i}"))
        t0 = time.perf_counter()
        q = start_cdc_replication(
            spark, log_path, target, new_scratch_dir(f"iso_ckpt_{i}"),
            max_files_per_trigger=2,
        )
        run_to_completion(q)
        s = time.perf_counter() - t0
        secs.append(s)
        shutil.rmtree(target.path, ignore_errors=True)
        print(json.dumps({"run": i, "secs": round(s, 3),
                          "eps": round(n_events / s, 1)}))

    med = statistics.median(secs)
    print(json.dumps({"metric": "cdc_stream_drain_median_secs",
                      "value": round(med, 3),
                      "eps_median": round(n_events / med, 1),
                      "n_events": n_events, "runs": n_runs,
                      "sf": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
