"""CLI entry points mirroring the reference's surface (js:626-631 exports
+ md:106-113 usage):

    node mongodb-cdc-program.js                  -> cdc replicate
    node ... --start-time t1 --end-time t2       -> cdc replicate --start-time ...
    node ... --compare-id <id>                   -> cdc compare --id <id>
    node ... --compare-window t1 t2              -> cdc compare-window t1 t2
    node ... --health-check                      -> cdc health

Usage: ``python -m mongodb_cdc_spark.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from mongodb_cdc_spark.config import CDCConfig
from mongodb_cdc_spark.session import get_spark


def cmd_replicate(cfg: CDCConfig, args) -> int:
    """Continuous replication (reference entry point 1, js:608-623)."""
    from mongodb_cdc_spark.streaming.monitor import CDCHealthListener
    from mongodb_cdc_spark.streaming.pipeline import (
        run_to_completion,
        start_cdc_replication,
    )
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    spark = get_spark("cdc-replicate")
    listener = CDCHealthListener()
    spark.streams.addListener(listener)
    if not cfg.file_backed:
        raise SystemExit(
            "mongodb:// sources need the mongo-spark-connector jar on the "
            "classpath; see sources/changefeed.py::mongo_stream_options"
        )
    target = ParquetUpsertTarget(cfg.target)

    def _start():
        return start_cdc_replication(
            spark,
            cfg.source,
            target,
            cfg.checkpoint_dir,
            available_now=args.drain,
            processing_time=cfg.trigger_interval,
            watermark=cfg.watermark,
            max_files_per_trigger=cfg.max_files_per_trigger,
            start_time=getattr(args, "start_time", None),
            end_time=getattr(args, "end_time", None),
        )

    if args.drain:
        run_to_completion(_start())
        print(json.dumps({"status": "drained", "stats": listener.report.__dict__},
                         default=str))
    else:
        # Continuous mode runs under the R10 supervisor: restart from
        # the checkpoint on stream error (js:286-299), bounded retries.
        from mongodb_cdc_spark.streaming.pipeline import run_supervised

        run_supervised(
            _start,
            max_restarts=args.max_restarts,
            restart_delay_s=5.0,  # js:296-298
            on_error=lambda exc, n: print(
                json.dumps({"alert": "stream_error", "attempt": n,
                            "error": str(exc)[:200]}),
                file=sys.stderr,
            ),
        )
    return 0


def cmd_compare(cfg: CDCConfig, args) -> int:
    """Point reconciliation (reference entry point 2, js:399-454): fetch
    one key from source-truth and target state, diff field-wise."""
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    spark = get_spark("cdc-compare")
    target_df = ParquetUpsertTarget(cfg.target).current(spark)
    source_df = spark.read.parquet(cfg.source)
    s = source_df.filter(F.col("documentKey._id") == args.id)
    t = (target_df or spark.createDataFrame([], "``_id`` bigint")).filter(
        F.col("_id") == args.id
    )
    report = {
        "documentId": args.id,
        "existsInSource": s.count() > 0,
        "existsInTarget": t.count() > 0,
    }
    print(json.dumps(report))
    return 0 if report["existsInSource"] == report["existsInTarget"] else 1


def cmd_compare_window(cfg: CDCConfig, args) -> int:
    """Window reconciliation (reference entry point 3, js:478-538) — the
    set-based one-pass version of its per-id loop."""
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    spark = get_spark("cdc-compare-window")
    source_df = spark.read.parquet(cfg.source)
    touched = (
        source_df.filter(F.col("clusterTime").between(args.start, args.end))
        .filter(F.col("operationType").isin("insert", "update"))
        .select(F.col("documentKey._id").alias("_id"))
        .distinct()
        .limit(args.limit)
    )
    target_df = ParquetUpsertTarget(cfg.target).current(spark)
    if target_df is None:
        missing = touched.count()
        compared = missing
    else:
        compared = touched.count()
        missing = touched.join(target_df, "_id", "left_anti").count()
    print(
        json.dumps(
            {
                "timeWindow": {"start": args.start, "end": args.end},
                "totalDocumentsCompared": compared,
                "documentsWithDifferences": missing,
            }
        )
    )
    return 0 if missing == 0 else 1


def cmd_health(cfg: CDCConfig, args) -> int:
    """Health check (reference entry point 4, js:541-600): state lag vs
    the feed head, threshold 300 s (js:557)."""
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    spark = get_spark("cdc-health")
    source_df = spark.read.parquet(cfg.source)
    head = source_df.agg(F.max("clusterTime")).collect()[0][0]
    target_df = ParquetUpsertTarget(cfg.target).current(spark)
    if target_df is None:
        print(json.dumps({"status": "critical", "reason": "no target state"}))
        return 1
    applied = target_df.agg(F.max("cluster_ts")).collect()[0][0]
    lag_s = (head - applied).total_seconds() if head and applied else None
    status = "healthy" if lag_s is not None and lag_s < cfg.max_healthy_lag_s else "unhealthy"
    print(json.dumps({"status": status, "secondsBehind": lag_s}))
    return 0 if status == "healthy" else 1


def cmd_compact(cfg: CDCConfig, args) -> int:
    """Small-file compaction of a parquet directory (the maintenance the
    reference never needs because Mongo compacts server-side; a parquet
    target must own it — see streaming/maintenance.py)."""
    from mongodb_cdc_spark.streaming.maintenance import (
        compact_parquet_dir,
        parquet_file_count,
    )

    spark = get_spark("cdc-compact")
    before = parquet_file_count(args.path)
    n_rows = spark.read.parquet(args.path).count()
    compact_parquet_dir(
        spark, args.path, args.target_files, args.max_records_per_file
    )
    after = parquet_file_count(args.path)
    ok = spark.read.parquet(args.path).count() == n_rows
    print(
        json.dumps(
            {
                "status": "compacted" if ok else "row-count-mismatch",
                "filesBefore": before,
                "filesAfter": after,
                "rows": n_rows,
            }
        )
    )
    return 0 if ok else 1


def cmd_snapshots(cfg: CDCConfig, args) -> int:
    """List the target's committed table snapshots (the commit log the
    reference keeps implicitly in Mongo's oplog; here it is explicit —
    streaming/upsert.py snapshot manifests)."""
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    target = ParquetUpsertTarget(cfg.target)
    print(json.dumps({"snapshots": target.snapshots()}))
    return 0


def cmd_snapshot_diff(cfg: CDCConfig, args) -> int:
    """Changed keys between two committed snapshots via manifest compare
    — reads only buckets whose version changed (the incremental-consumer
    path: downstreams pull a diff, never rescan the table)."""
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    target = ParquetUpsertTarget(cfg.target)
    snaps = target.snapshots()
    if args.v_from not in snaps or args.v_to not in snaps:
        # pure-filesystem check — fail fast without paying Spark startup
        print(json.dumps({"status": "unknown-snapshot", "known": snaps}))
        return 1
    spark = get_spark("cdc-snapshot-diff")
    diff = target.snapshot_diff(spark, args.v_from, args.v_to)
    by_kind = {
        r["change"]: r["n"]
        for r in diff.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "status": "ok",
                "from": args.v_from,
                "to": args.v_to,
                "inserts": int(by_kind.get("insert", 0)),
                "updates": int(by_kind.get("update", 0)),
            }
        )
    )
    return 0


def cmd_audit_refs(cfg: CDCConfig, args) -> int:
    """Cross-collection referential-integrity audit: orphaned child rows
    (fk with no parent key) and childless parents, via keyed anti-joins
    over key projections. The cross-table generalization of the
    reference's single-collection compare (js:399-538) — scheduled after
    every bootstrap/backfill; `cdc_referential_audit` is the
    driver-certified operator twin."""
    spark = get_spark("cdc-audit-refs")
    parent = spark.read.parquet(args.parent).select(
        F.col(args.parent_key).alias("k")
    )
    child = spark.read.parquet(args.child).select(
        F.col(args.child_fk).alias("fk")
    )
    orphans = child.join(parent, child.fk == parent.k, "left_anti")
    childless = parent.join(
        child.select("fk").distinct(), parent.k == F.col("fk"), "left_anti"
    )
    out = {
        "status": "ok",
        "n_parents": parent.count(),
        "n_children": child.count(),
        "n_orphan_rows": orphans.count(),
        "n_childless_parents": childless.count(),
    }
    print(json.dumps(out))
    return 0 if out["n_orphan_rows"] == 0 else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cdc", description=__doc__)
    p.add_argument("--source", help="change feed path (or mongodb:// URI)")
    p.add_argument("--target", help="target state dir (or mongodb:// URI)")
    p.add_argument("--checkpoint-dir")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("replicate", help="continuous replication (entry 1)")
    sp.add_argument("--start-time", dest="start_time",
                    help="replicate only events with clusterTime >= this "
                         "(reference --start-time, js:226-232)")
    sp.add_argument("--end-time", dest="end_time",
                    help="replicate only events with clusterTime <= this")
    sp.add_argument("--max-restarts", dest="max_restarts", type=int, default=5,
                    help="supervisor restart budget for continuous mode "
                         "(reference restarts forever, js:286-299)")
    sp.add_argument("--drain", action="store_true",
                    help="availableNow: drain current feed contents and exit")
    sp.set_defaults(fn=cmd_replicate)

    sp = sub.add_parser("compare", help="single-document reconciliation (entry 2)")
    sp.add_argument("--id", type=int, required=True)
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("compare-window", help="time-window audit (entry 3)")
    sp.add_argument("start")
    sp.add_argument("end")
    sp.add_argument("--limit", type=int, default=100)  # js:478 default
    sp.set_defaults(fn=cmd_compare_window)

    sp = sub.add_parser("health", help="health check (entry 4)")
    sp.set_defaults(fn=cmd_health)

    sp = sub.add_parser("snapshots", help="list target snapshot versions")
    sp.set_defaults(fn=cmd_snapshots)

    sp = sub.add_parser("snapshot-diff",
                        help="changed keys between two snapshots")
    sp.add_argument("v_from")
    sp.add_argument("v_to")
    sp.set_defaults(fn=cmd_snapshot_diff)

    sp = sub.add_parser("compact", help="compact a parquet dir's small files")
    sp.add_argument("path")
    sp.add_argument("--target-files", type=int, default=8)
    sp.add_argument("--max-records-per-file", type=int, default=0)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser(
        "audit-refs",
        help="cross-collection referential-integrity audit "
             "(orphans / childless parents)",
    )
    sp.add_argument("parent", help="parent table parquet dir")
    sp.add_argument("child", help="child table parquet dir")
    sp.add_argument("--parent-key", default="_id")
    sp.add_argument("--child-fk", required=True)
    sp.set_defaults(fn=cmd_audit_refs)

    args = p.parse_args(argv)
    overrides = {
        k: v
        for k, v in (
            ("source", args.source),
            ("target", args.target),
            ("checkpoint_dir", args.checkpoint_dir),
        )
        if v
    }
    cfg = CDCConfig.from_env(**overrides)
    return args.fn(cfg, args)


if __name__ == "__main__":
    sys.exit(main())
