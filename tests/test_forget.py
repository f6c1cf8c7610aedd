"""Forget tier (operators/forget.py): the refcount-subtraction algebra
(decrement, drop-at-zero, multi-holder survival), the purge==rebuild and
rollback-inverts-ingest identities on engineered frames, the compliance
property (purged content re-admits iff its last holder was forgotten),
and the plan shape backing the 100 TB claim (takedown decrement side
broadcasts; the store side never shuffles for a purge)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mongodb_cdc_spark.operators.forget import _subtract_counts


def _counts(spark, pairs):
    return spark.createDataFrame(
        [Row(h=h, cnt=c) for h, c in pairs], "h string, cnt bigint"
    )


def _held(spark, hashes):
    return spark.createDataFrame(
        [Row(h=h) for h in hashes], "h string"
    )


def test_subtract_decrements_and_drops_at_zero(spark):
    """One holder of A and one of two B holders removed: A (last holder)
    drops out entirely, B survives at 1, untouched C keeps its count."""
    store = _counts(spark, [("A", 1), ("B", 2), ("C", 3)])
    removed = _held(spark, ["A", "B"])
    got = {
        r.h: r.cnt for r in _subtract_counts(store, removed).collect()
    }
    assert got == {"B": 1, "C": 3}


def test_subtract_multiplicity_counts_every_row(spark):
    """The removed side is doc rows, not a distinct hash set — three
    removed holders of the same content decrement by three. A distinct
    collapse here would silently leak state (the exact failure a
    distinct-hash store has)."""
    store = _counts(spark, [("A", 3), ("B", 5)])
    removed = _held(spark, ["A", "A", "A", "B"])
    got = {
        r.h: r.cnt for r in _subtract_counts(store, removed).collect()
    }
    assert got == {"B": 4}


def test_subtract_ignores_unknown_hashes(spark):
    """Removing content the store never saw is a no-op on other rows
    (left join, not inner): a takedown list can cite already-gone docs."""
    store = _counts(spark, [("A", 2)])
    removed = _held(spark, ["Z", "A"])
    got = {
        r.h: r.cnt for r in _subtract_counts(store, removed).collect()
    }
    assert got == {"A": 1}


def test_purge_equals_rebuild_on_engineered_frame(spark):
    """subtract(count(all), forgotten) == count(remaining), on a frame
    with all three interesting shapes: a hash fully forgotten, a hash
    partially forgotten, a hash untouched."""
    docs = [
        (1, "x"), (2, "x"), (3, "x"),  # partially forgotten (1 of 3)
        (4, "y"), (5, "y"),            # fully forgotten
        (6, "z"),                      # untouched
    ]
    d = spark.createDataFrame(
        [Row(doc_id=i, h=h) for i, h in docs], "doc_id bigint, h string"
    )
    forgotten_ids = {1, 4, 5}
    store = d.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    forget = d.filter(F.col("doc_id").isin(list(forgotten_ids)))
    purged = {
        r.h: r.cnt
        for r in _subtract_counts(store, forget.select("h")).collect()
    }
    rebuilt = {
        r.h: r.cnt
        for r in d.filter(~F.col("doc_id").isin(list(forgotten_ids)))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    assert purged == rebuilt == {"x": 2, "z": 1}


def test_rollback_inverts_ingest(spark):
    """The transactional identity the key proves at corpus scale:
    subtract(merge(base, wave), wave) == base — including a hash the
    wave introduced (must vanish) and one it incremented (must return
    to its base count)."""
    base = _counts(spark, [("x", 2), ("z", 1)])
    wave = _held(spark, ["x", "w", "w"])
    merged = (
        base.unionByName(
            wave.groupBy("h").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt")
            )
        )
        .groupBy("h")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    rolled = {
        r.h: r.cnt for r in _subtract_counts(merged, wave).collect()
    }
    assert rolled == {"x": 2, "z": 1}


def test_readmit_iff_last_holder_forgotten(spark, sf_dir):
    """The compliance property on real data: every re-submitted
    (forgotten) doc is admitted exactly when the purged store carries
    no other holder of its content — i.e. admitted == (its hash's
    refcount fell to 0), cross-checked doc by doc, not just in
    aggregate."""
    from mongodb_cdc_spark.io import load_table
    from mongodb_cdc_spark.operators.forget import (
        _FORGET_MOD,
        refcount_store_path,
    )

    d = load_table(spark, sf_dir, "documents")
    store = spark.read.parquet(refcount_store_path(spark, sf_dir))
    forget = d.filter(F.col("doc_id") % _FORGET_MOD == 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    purged = _subtract_counts(store, forget.select("h"))
    # ground truth: hashes some non-forgotten doc still carries
    still_held = (
        d.filter(F.col("doc_id") % _FORGET_MOD != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("held", F.lit(1))
    )
    checked = (
        forget.join(
            purged.select("h").withColumn("live", F.lit(1)), "h", "left"
        )
        .join(still_held, "h", "left")
        .select(
            (F.col("live").isNotNull() == F.col("held").isNotNull()).alias(
                "agree"
            )
        )
    )
    n, n_agree = checked.agg(
        F.count(F.lit(1)), F.sum(F.col("agree").cast("int"))
    ).first()
    assert n > 0 and n_agree == n


@pytest.fixture()
def refcount_fixture(spark, tmp_path):
    """A two-hash base store plus two event batches engineered to hit
    every verdict shape: in-batch ins-after-del of the same hash, a
    delete dropping a last holder, a delete of a multi-holder hash, a
    cross-batch re-insert of freed content, and a fresh insert."""
    store = str(tmp_path / "base_store")
    spark.createDataFrame(
        [Row(h="A", cnt=1), Row(h="B", cnt=2)], "h string, cnt bigint"
    ).write.parquet(store)
    schema = "seq bigint, doc_id bigint, op string, h string"
    b0 = spark.createDataFrame(
        [
            Row(seq=1, doc_id=10, op="del", h="A"),  # last holder -> freed
            Row(seq=2, doc_id=11, op="ins", h="A"),  # re-insert freed: admit
            Row(seq=3, doc_id=12, op="del", h="B"),  # multi-holder: not freed
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [
            Row(seq=4, doc_id=20, op="ins", h="A"),  # cross-batch: dup again
            Row(seq=5, doc_id=21, op="del", h="B"),  # now the last holder
            Row(seq=6, doc_id=22, op="ins", h="C"),  # fresh content
        ],
        schema,
    )
    return {
        "store": store,
        "target": str(tmp_path / "target"),
        "delta": str(tmp_path / "delta"),
        "b0": b0,
        "b1": b1,
    }


def _rc_verdicts(spark, target, i):
    return {
        r.doc_id: (r.cnt_before, r.verdict)
        for r in spark.read.parquet(f"{target}/batch={i}").collect()
    }


def test_refcount_gate_sequential_semantics(spark, refcount_fixture):
    from mongodb_cdc_spark.operators.forget import (
        refcount_gate_batch_applier,
    )

    fx = refcount_fixture
    apply_batch = refcount_gate_batch_applier(
        fx["store"], fx["target"], fx["delta"]
    )
    apply_batch(fx["b0"], 0)
    apply_batch(fx["b1"], 1)
    assert _rc_verdicts(spark, fx["target"], 0) == {
        10: (1, True),   # deleting A's last holder frees it
        11: (0, False),  # freed content re-admitted (not a dup)
        12: (2, False),  # B still has another holder
    }
    assert _rc_verdicts(spark, fx["target"], 1) == {
        20: (1, True),   # doc 11 re-holds A -> dup across batches
        21: (1, True),   # B's remaining holder -> freed now
        22: (0, False),  # fresh
    }


def test_refcount_gate_replay_sees_pre_batch_state(spark, refcount_fixture):
    """A supervised replay of batch 1 must read exactly the pre-1
    state — counting batch 1's own committed delta would shift every
    cnt_before and flip the last-holder verdicts."""
    from mongodb_cdc_spark.operators.forget import (
        refcount_gate_batch_applier,
    )

    fx = refcount_fixture
    apply_batch = refcount_gate_batch_applier(
        fx["store"], fx["target"], fx["delta"]
    )
    apply_batch(fx["b0"], 0)
    apply_batch(fx["b1"], 1)
    first = _rc_verdicts(spark, fx["target"], 1)
    delta_first = {
        r.h: r.delta
        for r in spark.read.parquet(f"{fx['delta']}/batch=1").collect()
    }
    apply_batch(fx["b1"], 1)  # replay
    assert _rc_verdicts(spark, fx["target"], 1) == first
    delta_again = {
        r.h: r.delta
        for r in spark.read.parquet(f"{fx['delta']}/batch=1").collect()
    }
    assert delta_again == delta_first


def test_refcount_stream_never_shuffles_state(spark, refcount_fixture):
    """The streaming gate's 100 TB claim in plan form: the counter
    state must reach the batch only through broadcast joins (semi-join
    prunes, then the pruned batch-sized slice as the probe's build
    side) — a sort-merge/shuffle join against the state side would
    move corpus-hash-cardinality rows every micro-batch. Drives the
    applier's OWN read path (`refcount_batch_verdicts`) at batch 1,
    where both the base store AND a committed delta batch are in
    play."""
    from mongodb_cdc_spark.operators.forget import (
        refcount_batch_verdicts,
        refcount_gate_batch_applier,
    )

    fx = refcount_fixture
    apply_batch = refcount_gate_batch_applier(
        fx["store"], fx["target"], fx["delta"]
    )
    apply_batch(fx["b0"], 0)
    ev = fx["b1"].withColumn(
        "delta",
        F.when(F.col("op") == "ins", F.lit(1)).otherwise(F.lit(-1)),
    )
    probe = refcount_batch_verdicts(spark, ev, fx["store"], fx["delta"], 1)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "simple"
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # 2 semi prunes + probe


def test_purge_decrement_side_broadcasts(spark, sf_dir):
    """The scale claim in plan form: a takedown-list purge must probe
    the refcounted store via BroadcastHashJoin on the decrement side —
    a shuffle of the store for a tiny forget list would be the exact
    anti-pattern the docstring forbids."""
    from mongodb_cdc_spark.registry import QUERIES

    df = QUERIES["maintenance_forget_purge"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan
