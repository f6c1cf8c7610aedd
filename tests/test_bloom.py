"""Bloom-filter membership tier (operators/bloom.py): geometry lock
vs DuckDB, OR-fold algebra, the streaming gate's sequential semantics
(cross-batch + in-batch), the replay contract, and the plan shape that
makes the tier's 100 TB story true (fixed-size side broadcasts)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mongodb_cdc_spark.operators.bloom import (
    _BLOOM_M_TIGHT,
    _BLOOM_M_WIDE,
    _pack_words,
    _positions_spark,
    _positions_sql,
    bloom_gate_batch_applier,
)


def test_bloom_positions_engine_matches_duckdb(spark, oracle_con):
    """The k=4 slice/mod geometry must be bit-identical across engines —
    a drifted slice offset or mod width silently breaks every key in
    the tier at once."""
    texts = ["", "a", "the quick brown fox", "x" * 500, "日本語テキスト"]
    df = spark.createDataFrame([Row(text=t) for t in texts], "text string")
    for m in (_BLOOM_M_WIDE, _BLOOM_M_TIGHT):
        got = {
            r.text: sorted(r.pos)
            for r in df.select(
                "text", _positions_spark(m).alias("pos")
            ).collect()
        }
        for t in texts:
            want = sorted(
                oracle_con.sql(
                    f"SELECT unnest({_positions_sql(m, '$t')}) AS pos",
                    params={"t": t},
                ).df()["pos"]
                .astype(int)
                .tolist()
            )
            assert got[t] == want, (m, t)


def test_pack_words_or_merge_equals_rebuild(spark):
    """The fold algebra: OR-merging two packed bitmaps equals packing
    the union of their position sets — the property maintenance_bloom_refresh
    relies on, here on positions chosen to share words and bits."""
    a = [0, 1, 31, 32, 33, 64, 1000, 65535]
    b = [1, 31, 40, 64, 2048, 65535, 7]
    pack = lambda xs: _pack_words(  # noqa: E731
        spark.createDataFrame([Row(pos=p) for p in xs], "pos bigint")
    )
    merged = (
        pack(a)
        .withColumnRenamed("mask", "am")
        .join(pack(b).withColumnRenamed("mask", "bm"), "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce("am", F.lit(0)).bitwiseOR(
                    F.coalesce("bm", F.lit(0))
                )
            ).alias("mask"),
        )
    )
    rebuilt = pack(sorted(set(a) | set(b)))
    got = {r.word: r.mask for r in merged.collect()}
    want = {r.word: r.mask for r in rebuilt.collect()}
    assert got == want
    # idempotence: re-merging a side changes nothing
    again = (
        merged.unionByName(pack(a))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    assert {r.word: r.mask for r in again.collect()} == want


@pytest.fixture()
def bloom_fixture(spark, tmp_path):
    """A one-doc base bitmap plus two wave batches engineered so the
    gate must flag: an in-batch dup (batch 0), a cross-batch dup
    (batch 1 duplicating batch 0), and a base dup (batch 1 duplicating
    the store) — while fresh docs pass."""
    base_text = "the quick brown fox jumps over the lazy dog"
    b0_fresh = "completely novel content number one"
    b1_fresh = "completely novel content number two"
    store = str(tmp_path / "bloom_store")
    _pack_words(
        spark.createDataFrame(
            [Row(text=base_text)], "text string"
        ).select(F.explode(_positions_spark(_BLOOM_M_WIDE)).alias("pos"))
    ).write.parquet(store)
    schema = "doc_id bigint, text string"
    b0 = spark.createDataFrame(
        [
            Row(doc_id=10, text=b0_fresh),
            Row(doc_id=11, text=b0_fresh),  # in-batch dup of 10
            Row(doc_id=12, text="another fresh batch zero doc"),
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [
            Row(doc_id=20, text=b0_fresh),  # cross-batch dup of 10
            Row(doc_id=21, text=base_text),  # dup of the base store
            Row(doc_id=22, text=b1_fresh),  # fresh
        ],
        schema,
    )
    return {
        "store": store,
        "target": str(tmp_path / "target"),
        "state": str(tmp_path / "state"),
        "b0": b0,
        "b1": b1,
    }


def _verdicts(spark, target: str, i: int) -> dict[int, bool]:
    return {
        r.doc_id: r.bloom_flagged
        for r in spark.read.parquet(f"{target}/batch={i}").collect()
    }


def test_bloom_gate_sequential_semantics(spark, bloom_fixture):
    fx = bloom_fixture
    apply_batch = bloom_gate_batch_applier(
        fx["store"], fx["target"], fx["state"]
    )
    apply_batch(fx["b0"], 0)
    apply_batch(fx["b1"], 1)
    v0 = _verdicts(spark, fx["target"], 0)
    v1 = _verdicts(spark, fx["target"], 1)
    assert v0 == {10: False, 11: True, 12: False}
    assert v1 == {20: True, 21: True, 22: False}


def test_bloom_gate_replay_sees_pre_batch_state(spark, bloom_fixture):
    """A supervised replay of batch 1 must read exactly the pre-1 state:
    identical verdicts, identical state commit — even though batch 1's
    own (possibly partial) commit is already on disk. The OR algebra
    additionally makes the state commit idempotent byte-for-byte."""
    fx = bloom_fixture
    apply_batch = bloom_gate_batch_applier(
        fx["store"], fx["target"], fx["state"]
    )
    apply_batch(fx["b0"], 0)
    apply_batch(fx["b1"], 1)
    first = _verdicts(spark, fx["target"], 1)
    state_first = {
        r.word: r.mask
        for r in spark.read.parquet(f"{fx['state']}/batch=1").collect()
    }
    apply_batch(fx["b1"], 1)  # replay
    assert _verdicts(spark, fx["target"], 1) == first
    state_again = {
        r.word: r.mask
        for r in spark.read.parquet(f"{fx['state']}/batch=1").collect()
    }
    assert state_again == state_first


def test_bloom_probe_side_broadcasts(spark, sf_dir):
    """The tier's scale claim in plan form: the membership probe joins
    against the bounded bit set via BroadcastHashJoin — the fixed-size
    side must never shuffle the corpus."""
    from mongodb_cdc_spark.registry import QUERIES

    df = QUERIES["ext_dedup_bloom"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_store_bounded_by_m(spark, sf_dir):
    """The packed store can never exceed m/32 words no matter the
    corpus — the fixed-size guarantee itself."""
    from mongodb_cdc_spark.operators.bloom import bloom_store_path

    store = spark.read.parquet(bloom_store_path(spark, sf_dir))
    assert store.count() <= _BLOOM_M_WIDE // 32
    bad = store.filter(
        (F.col("word") < 0) | (F.col("word") >= _BLOOM_M_WIDE // 32)
    ).count()
    assert bad == 0
