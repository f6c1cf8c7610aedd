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
