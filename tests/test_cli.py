"""CLI surface e2e (reference R22: js:626-631 exports, md:106-113 flags):
drive replicate/compare-window/health through the argparse entry point."""

from __future__ import annotations

import json

import pytest

from mongodb_cdc_spark import cli
from mongodb_cdc_spark.sources.changefeed import write_change_log
from mongodb_cdc_spark.streaming.pipeline import new_scratch_dir


@pytest.fixture(scope="module")
def replicated(spark, sf_dir):
    src = write_change_log(spark, sf_dir)
    target = new_scratch_dir("cli_target")
    ckpt = new_scratch_dir("cli_ckpt")
    rc = cli.main(
        ["--source", src, "--target", target, "--checkpoint-dir", ckpt,
         "replicate", "--drain"]
    )
    assert rc == 0
    return src, target


def test_replicate_then_health_is_healthy(replicated, capsys):
    src, target = replicated
    rc = cli.main(["--source", src, "--target", target, "health"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # after a full drain, lag between feed head and applied state is zero
    assert rc == 0
    assert out["status"] == "healthy"
    assert out["secondsBehind"] == 0.0


def test_compare_window_reports_no_differences(replicated, capsys):
    src, target = replicated
    rc = cli.main(
        ["--source", src, "--target", target,
         "compare-window", "2024-01-01 00:00:00", "2024-12-31 00:00:00",
         "--limit", "1000000"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["documentsWithDifferences"] == 0
    assert out["totalDocumentsCompared"] > 0


def test_compare_single_id(replicated, capsys):
    src, target = replicated
    rc = cli.main(["--source", src, "--target", target, "compare", "--id", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["existsInSource"] and out["existsInTarget"]


def test_compact_cli_preserves_rows_and_reduces_files(spark, sf_dir, capsys):
    """`cdc compact`: fragment a table, compact through the CLI, verify
    row preservation + file-count reduction from the CLI's own report."""
    import os

    from mongodb_cdc_spark.io import load_table

    frag = new_scratch_dir("cli_compact")
    load_table(spark, sf_dir, "events").repartition(16).write.mode(
        "overwrite"
    ).parquet(frag)
    rc = cli.main(["compact", frag, "--target-files", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["status"] == "compacted"
    assert out["filesBefore"] == 16
    assert out["filesAfter"] == 2
    assert out["rows"] == spark.read.parquet(frag).count()


def test_compact_crash_leaves_table_readable(spark, sf_dir):
    """A compaction that died mid-write leaves a stale .compacting dir;
    the original table must stay readable and a retry must succeed
    (staging-then-swap contract of compact_parquet_dir)."""
    import os

    from mongodb_cdc_spark.io import load_table
    from mongodb_cdc_spark.streaming.maintenance import (
        compact_parquet_dir,
        parquet_file_count,
    )

    path = new_scratch_dir("crash_compact")
    load_table(spark, sf_dir, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(path)
    n = spark.read.parquet(path).count()
    # simulate a dead compaction: stale partial staging output
    staging = path.rstrip("/") + ".compacting"
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    assert spark.read.parquet(path).count() == n  # original intact
    compact_parquet_dir(spark, path, 2)  # retry overwrites stale staging
    assert spark.read.parquet(path).count() == n
    assert parquet_file_count(path) == 2
    assert not os.path.exists(staging)


def test_replicate_time_window_bounds_the_feed(spark, sf_dir, capsys):
    """R3 (--start-time/--end-time, js:226-232): a bounded replicate
    must apply exactly the events inside the clusterTime window — the
    target's keys equal the batch latest-per-key over that window."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark.sources.changefeed import derive_change_log
    from mongodb_cdc_spark.streaming.upsert import ParquetUpsertTarget

    t1, t2 = "2024-01-08 00:00:00", "2024-01-14 23:59:59"
    src = write_change_log(spark, sf_dir)
    target = new_scratch_dir("cli_win_target")
    ckpt = new_scratch_dir("cli_win_ckpt")
    rc = cli.main(
        ["--source", src, "--target", target, "--checkpoint-dir", ckpt,
         "replicate", "--drain", "--start-time", t1, "--end-time", t2]
    )
    assert rc == 0
    got = ParquetUpsertTarget(target).current(spark)
    assert got is not None
    want = (
        derive_change_log(spark, sf_dir)
        .filter(F.col("operationType").isin("insert", "update"))
        .filter(F.col("clusterTime").between(t1, t2))
        .select(F.col("documentKey._id").alias("k"))
        .distinct()
    )
    assert got.count() == want.count()
    assert got.count() > 0
    # and nothing outside the window leaked in: keys must match exactly
    got_keys = {r["_id"] for r in got.select("_id").collect()}
    want_keys = {r["k"] for r in want.collect()}
    assert got_keys == want_keys


def test_snapshots_and_diff_cli(replicated, capsys):
    """snapshots lists committed versions; snapshot-diff of the first
    and last versions reports insert/update counts as JSON (zero diff
    when only one merge happened is also valid — then from == to)."""
    src, target = replicated
    rc = cli.main(["--source", src, "--target", target, "snapshots"])
    assert rc == 0
    snaps = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "snapshots"
    ]
    assert len(snaps) >= 1
    rc = cli.main(
        ["--source", src, "--target", target,
         "snapshot-diff", snaps[0], snaps[-1]]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["status"] == "ok"
    assert out["inserts"] >= 0 and out["updates"] >= 0
    if snaps[0] == snaps[-1]:
        assert out["inserts"] == 0 and out["updates"] == 0

    rc = cli.main(
        ["--source", src, "--target", target, "snapshot-diff", "vX", "vY"]
    )
    assert rc == 1
    assert (
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])["status"]
        == "unknown-snapshot"
    )


def test_audit_refs_cli_counts_injected_orphans(spark, sf_dir, capsys, tmp_path):
    """audit-refs must report exactly the orphans a synthetic parent gap
    implies (exit 1 when orphans exist, 0 on a clean pair)."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark import cli
    from mongodb_cdc_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    parent = str(tmp_path / "parent")
    child = str(tmp_path / "child")
    o.filter("o_orderkey % 50 <> 0").select("o_orderkey").write.parquet(parent)
    li.select("l_orderkey").write.parquet(child)

    rc = cli.main(
        [
            "--source", "unused", "--target", "unused",
            "audit-refs", parent, child,
            "--parent-key", "o_orderkey", "--child-fk", "l_orderkey",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_orphans = li.filter("l_orderkey % 50 = 0").count()
    # this synthetic corpus legitimately contains childless orders —
    # compute the expectation instead of assuming TPC-H's 1..7 guarantee
    want_childless = (
        o.filter("o_orderkey % 50 <> 0")
        .join(li.select("l_orderkey").distinct(),
              F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .count()
    )
    assert out["n_orphan_rows"] == want_orphans
    assert out["n_childless_parents"] == want_childless
    assert rc == (1 if want_orphans else 0)

    # clean pair: full parent set -> zero orphans, exit 0
    parent_full = str(tmp_path / "parent_full")
    o.select("o_orderkey").write.parquet(parent_full)
    rc = cli.main(
        [
            "--source", "unused", "--target", "unused",
            "audit-refs", parent_full, child,
            "--parent-key", "o_orderkey", "--child-fk", "l_orderkey",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_orphan_rows"] == 0
