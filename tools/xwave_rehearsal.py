#!/usr/bin/env python
"""Per-batch cost-flatness rehearsal for the cross-wave corpus pipeline.

The xwave gate applier reads per-run state (md5 / bands / shingles /
sizes / phash / semn / seme + the URL seen set) committed by earlier
batches. Without the in-run fold, a standing run's read set grows one
path per completed batch — O(B) directory opens per batch and O(B^2)
cumulative; with `maybe_fold_state` (every `_STATE_FOLD_EVERY` batches)
it stays <= _STATE_FOLD_EVERY paths per gate family forever.

This tool drives `corpus_gate_xwave_applier` directly over a synthetic
N-batch wave (the sf wave docs re-dealt round-robin into N slices, so
every batch has comparable size) and records per-batch wall time plus
the max state-path count any gate family read. Flat wall time + capped
path counts across N >> 4 batches is the standing-crawl evidence the
4-file driver feed cannot show.

Usage: python tools/xwave_rehearsal.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import functions as F

    from mongodb_cdc_spark.functions.vectors import centroid_cosines_udf
    from mongodb_cdc_spark.io import load_table
    from mongodb_cdc_spark.operators.curation import (
        _SEM_K,
        _XWAVE_STATE_NAMES,
        base_signature_store_path,
        corpus_gate_xwave_applier,
        dedup_gate_store_path,
        fold_state_paths,
        _gate_setup_frames,
        _phash_band_rows,
        sem_base_rank_store_path,
        url_seen_store_path,
    )
    from mongodb_cdc_spark.operators.extensions import signature_bands
    from mongodb_cdc_spark.operators.multimodal import phash_store_path
    from mongodb_cdc_spark.session import get_spark
    from mongodb_cdc_spark.streaming.pipeline import new_scratch_dir

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])

    url_seen_store = url_seen_store_path(spark, sf_dir, cut)
    store_bands = signature_bands(
        spark.read.parquet(base_signature_store_path(spark, sf_dir, cut))
    ).localCheckpoint(eager=True)
    gate = dedup_gate_store_path(spark, sf_dir, cut)
    base_md5, bsh, bsz = (
        f.localCheckpoint(eager=True) for f in _gate_setup_frames(spark, gate)
    )
    base_sig_bands = _phash_band_rows(
        spark.read.parquet(phash_store_path(spark, sf_dir)).filter(
            F.col("doc_id") <= cut
        )
    ).localCheckpoint(eager=True)
    e = load_table(spark, sf_dir, "embeddings")
    sem_base_narrow = (
        spark.read.parquet(sem_base_rank_store_path(spark, sf_dir, cut))
        .select(
            "vec_id",
            "cluster",
            *[f"s{k}" for k in range(_SEM_K)],
            F.lit(False).alias("is_wave"),
        )
        .localCheckpoint(eager=True)
    )
    sem_base_emb = (
        e.filter(F.col("vec_id") <= cut)
        .select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bemb"))
        .localCheckpoint(eager=True)
    )
    sem_project = centroid_cosines_udf(
        [
            r["embedding"]
            for r in e.filter(F.col("vec_id") < _SEM_K)
            .orderBy("vec_id")
            .collect()
        ]
    )
    emb = e.select("vec_id", "embedding").localCheckpoint(eager=True)

    target = new_scratch_dir("xwave_rehearsal_target")
    url_target = new_scratch_dir("xwave_rehearsal_urlv")
    url_seen_dir = new_scratch_dir("xwave_rehearsal_seen")
    state_root = new_scratch_dir("xwave_rehearsal_state")
    apply_batch = corpus_gate_xwave_applier(
        url_seen_store,
        url_target,
        url_seen_dir,
        base_md5,
        store_bands,
        bsh,
        bsz,
        base_sig_bands,
        sem_base_narrow,
        sem_base_emb,
        sem_project,
        emb,
        target,
        state_root,
    )

    # round-robin deal of the wave into n_batches comparable slices
    wave = (
        d.filter(F.col("doc_id") > cut)
        .withColumn("_b", (F.col("doc_id") % n_batches).cast("int"))
        .localCheckpoint(eager=True)
    )
    rows = []
    for i in range(n_batches):
        b = wave.filter(F.col("_b") == i).drop("_b")
        t0 = time.monotonic()
        apply_batch(b, i)
        dt = time.monotonic() - t0
        max_paths = max(
            len(fold_state_paths(os.path.join(state_root, n), i + 1))
            for n in _XWAVE_STATE_NAMES
        )
        rows.append((i, dt, max_paths))
        # NOTE: measured BEFORE batch i+1's own maybe_fold_state runs,
        # so odd batches show fold+2 commits; the applier folds first,
        # so its actual read is <= _STATE_FOLD_EVERY paths
        print(
            f"batch {i:2d}: {dt:6.2f}s  "
            f"max state paths next batch would list (pre-fold): {max_paths}"
        )
    head = sum(dt for _, dt, _ in rows[1:4]) / 3
    tail = sum(dt for _, dt, _ in rows[-3:]) / 3
    print(
        f"warm head (b1-3) {head:.2f}s vs tail (last 3) {tail:.2f}s "
        f"-> ratio {tail / head:.2f}; path cap {max(p for *_, p in rows)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
