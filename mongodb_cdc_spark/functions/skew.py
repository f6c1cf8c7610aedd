"""Skew-handling join helpers — the hot-key survival kit for 100 TB joins.

Two mechanisms, complementary to AQE's automatic skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py):

* **Salting**: shard each hot left-side key into ``n_salt`` sub-keys and
  replicate the right side once per shard. Turns one straggler partition
  into ``n_salt`` even ones at the cost of an ``n_salt``-times-replicated
  (small) right side. Deterministic salt — hash of a unique column, never
  ``rand()`` — so retried tasks and replayed batches produce identical
  partitioning (the same determinism contract as everything else here).
* **Bucketing** (see tests/test_scale_features.py): pre-shuffling both
  fact tables into the same bucket layout at write time makes every later
  equi-join on the bucket key shuffle-free (SortMergeJoin with zero
  Exchange). The write pays the shuffle once; every downstream join rides
  it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_cols: str | Column | list,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted against key skew.

    ``salt_cols``: left-side column(s) whose combination is high-
    cardinality PER KEY (e.g. the full row key tuple) — the salt is
    ``pmod(xxhash64(cols...), n_salt)``, deterministic across runs and
    retries. A low-cardinality salt column silently caps the spread at
    its distinct count. The right side is replicated
    ``n_salt`` times via explode(sequence) — use ONLY when the right side
    is the small one (dimension-sized); for fact-fact skew prefer AQE's
    split-and-replicate, which salts just the skewed partitions.

    ``how`` is restricted to joins whose result is row-identical to
    ``left.join(right, left_key == right_key, how)`` under right-side
    replication: inner / left / left_semi / left_anti (verified in
    tests). Right/full outer are rejected — an unmatched right row exists
    ``n_salt`` times after replication and would be emitted once per
    replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join: how={how!r} would duplicate unmatched "
            f"right rows n_salt times; use one of {sorted(allowed)}"
        )
    if not isinstance(salt_cols, list):
        salt_cols = [salt_cols]
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salt))
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return out.drop("__salt")
