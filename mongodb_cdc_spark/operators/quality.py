"""Corpus-quality extension operators: per-label embedding centroids,
incremental (new-batch-vs-corpus) dedup, and cross-document bigram
novelty scoring. North-star LLM-pipeline surface (the reference engine
has no text/embedding tier at all — SURVEY.md §2A "explicitly absent").

All three follow the exact-integer oracle discipline: fixed-point
per-row ints, exact BIGINT sums, positive-only integer division — so
even the embedding-centroid operator (floats in, floats summed) carries
an exact DuckDB oracle rather than a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.functions.text import (
    fingerprint,
    fingerprint_sql,
    tokens,
    tokens_sql,
)
from mongodb_cdc_spark.functions.vectors import (
    cosine_unrolled_sql,
    dot_unrolled_sql,
)
from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query
from mongodb_cdc_spark.operators._util import new_stage, publish_store

# --------------------------------------------------------------------------
# ext_embed_centroids
# --------------------------------------------------------------------------

# Per-element fixed-point: widen float32 -> double (exact), one IEEE
# multiply, exact floor. 1e-6 resolution comfortably exceeds float32 input
# precision.
_VI = "CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
# Sign-mirrored half-up integer average of the micro-unit sum.
_AVG_MICRO = (
    "CASE WHEN S >= 0 THEN (2 * S + n) {div} (2 * n) "
    "ELSE -(((-2 * S) + n) {div} (2 * n)) END"
)


@query(
    "ext_embed_centroids",
    oracle=f"""
    WITH ex AS (
      SELECT label,
             CAST(pos - 1 AS BIGINT) AS dim,
             embedding[pos] AS v
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
    ),
    s AS (
      SELECT label, dim, SUM({_VI}) AS S, COUNT(*) AS n
      FROM ex GROUP BY label, dim
    )
    SELECT label, dim, n,
           CAST({_AVG_MICRO.format(div="//")} AS BIGINT) AS centroid_micro
    FROM s
    """,
)
def ext_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in exact micro-units — the training
    step behind every IVF/k-means index (`ext_sim_ann_ivf` consumes
    exactly these) and the class-profile drift monitor for embedding
    pipelines. Float sums are order-nondeterministic, so each element is
    fixed-pointed to 1e-6 and summed as exact BIGINTs; the mean is an
    integer half-up division. The result is bit-identical across engines
    AND across partitionings — which is what lets a 100 TB centroid job
    be retried/restarted without drift.

    Scale: posexplode is a zero-shuffle scan-stage expansion (64 rows per
    vector); the aggregate is map-side-combinable on (label, dim) — the
    shuffle carries labels x dims x partitions rows, independent of
    corpus size. Same shape incrementally: partial (S, n) pairs merge
    associatively."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select("label", F.col("dim").cast("bigint").alias("dim"), "v")
    s = ex.groupBy("label", "dim").agg(
        F.expr(f"SUM({_VI})").alias("S"), F.count(F.lit(1)).alias("n")
    )
    return s.select(
        "label",
        "dim",
        "n",
        F.expr(_AVG_MICRO.format(div="div")).alias("centroid_micro"),
    )


# --------------------------------------------------------------------------
# ext_dedup_incremental
# --------------------------------------------------------------------------

# Deterministic batch split: last 10% of the seeded hash space arrives as
# the "incoming" batch, the rest is the already-ingested corpus.
_INCR_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':incr-seed-1'), 1, 8)) "
    "AS BIGINT) % 100"
)


def _incr_bucket() -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":incr-seed-1"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )


@query(
    "ext_dedup_incremental",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, {fingerprint_sql("text")} AS h,
             {_INCR_BUCKET_SQL} AS bucket
      FROM documents
    ),
    existing AS (SELECT DISTINCT h FROM docs WHERE bucket < 90),
    incoming AS (SELECT doc_id, lang, h FROM docs WHERE bucket >= 90),
    keepers AS (SELECT h, MIN(doc_id) AS keep_id FROM incoming GROUP BY h),
    marked AS (
      SELECT i.doc_id, i.lang,
             CASE WHEN e.h IS NOT NULL THEN 'dup_existing'
                  WHEN i.doc_id <> k.keep_id THEN 'dup_within'
                  ELSE 'kept' END AS verdict
      FROM incoming i
      LEFT JOIN existing e ON i.h = e.h
      JOIN keepers k ON i.h = k.h
    )
    SELECT lang,
           COUNT(*) AS n_incoming,
           CAST(SUM(CASE WHEN verdict = 'dup_existing' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_existing,
           CAST(SUM(CASE WHEN verdict = 'dup_within' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_within,
           CAST(SUM(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM marked GROUP BY lang
    """,
)
def ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: classify an INCOMING batch of documents against
    the already-ingested corpus — drop docs whose fingerprint exists in
    the corpus, collapse duplicates within the batch to their min-id
    representative, keep the rest. This is the shape every continuously-
    ingesting 100 TB pipeline actually runs (full-corpus re-dedup per
    batch is not an option); the batch split here is a seeded hash so the
    fixture is deterministic.

    Scale: the corpus side is reduced to DISTINCT 16-hex fingerprints
    before the join — the join carries 16-byte keys, never text; the
    incoming batch is small by construction, so Spark broadcast-joins it
    (or bloom-prunes the corpus scan). Within-batch collapse is one keyed
    aggregate on the same fingerprint, reusing the join's partitioning."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", fingerprint("text").alias("h"), _incr_bucket().alias("b")
    )
    existing = docs.filter(F.col("b") < 90).select("h").distinct()
    incoming = docs.filter(F.col("b") >= 90).select("doc_id", "lang", "h")
    keepers = incoming.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    marked = (
        incoming.join(
            existing.withColumn("in_existing", F.lit(1)), "h", "left"
        )
        .join(keepers, "h")
        .select(
            "lang",
            F.when(F.col("in_existing") == 1, "dup_existing")
            .when(F.col("doc_id") != F.col("keep_id"), "dup_within")
            .otherwise("kept")
            .alias("verdict"),
        )
    )
    cnt = lambda v: F.sum(F.when(F.col("verdict") == v, 1).otherwise(0)).cast(
        "bigint"
    )
    return marked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        cnt("dup_existing").alias("n_dup_existing"),
        cnt("dup_within").alias("n_dup_within"),
        cnt("kept").alias("n_kept"),
    )


# --------------------------------------------------------------------------
# ext_bigram_novelty
# --------------------------------------------------------------------------

_NOVELTY_TOP = 50


@query(
    "ext_bigram_novelty",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {tokens_sql("text")} AS t FROM documents),
    bg AS (
      SELECT DISTINCT doc_id, t[g] AS w1, t[g+1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS g) u
      WHERE len(t) >= 2
    ),
    dfreq AS (SELECT w1, w2, COUNT(*) AS df FROM bg GROUP BY w1, w2),
    per AS (
      SELECT b.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM bg b JOIN dfreq d ON b.w1 = d.w1 AND b.w2 = d.w2
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, n_shared,
           ((n_bigrams - n_shared) * 1000000) // n_bigrams AS novelty_ppm
    FROM per
    ORDER BY novelty_ppm DESC, doc_id ASC LIMIT {_NOVELTY_TOP}
    """,
)
def ext_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document novelty score: for each document, the ppm share of
    its DISTINCT bigrams that appear in no other document — high scores
    mark genuinely novel text, low scores mark boilerplate/template
    documents (the complement of near-dup detection: instead of pairing
    duplicates it *ranks* documents by how much shared phrasing they
    carry). Top-50 most-novel docs, integer-ppm scored, unique-key
    tiebreak.

    Scale: bigram enumeration is a scan-stage explode with per-doc
    DISTINCT (bounded by doc length); document frequency is one map-side-
    combinable aggregate on vocabulary-sized keys; the join back is keyed
    on the same (w1, w2) so the DF table's partitioning is reused. The
    final top-50 plans as TakeOrderedAndProject (per-partition heaps). At
    100 TB the df table is the shared artifact — computed once per corpus
    snapshot, reused by collocations/novelty/TF-IDF alike."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t)-2),"
                    " i -> struct(t[i] AS w1, t[i+1] AS w2))"
                )
            ).alias("bgp"),
        )
        .select("doc_id", "bgp.w1", "bgp.w2")
        .distinct()
    )
    dfreq = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("df"))
    per = (
        bg.join(dfreq, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    return (
        per.select(
            "doc_id",
            "n_bigrams",
            "n_shared",
            F.expr(
                "((n_bigrams - n_shared) * 1000000) div n_bigrams"
            ).alias("novelty_ppm"),
        )
        .orderBy(F.col("novelty_ppm").desc(), F.col("doc_id").asc())
        .limit(_NOVELTY_TOP)
    )


# --------------------------------------------------------------------------
# ext_sim_ann_pq — product-quantization ANN with an exact cross-engine oracle
# --------------------------------------------------------------------------

# Codebook geometry: M=8 subspaces of 8 dims each over the 64-dim
# embeddings; K=4 centroids per subspace, constant per dim in micro-units
# (+-0.15 / +-0.05 ~ within 1.2 sigma of the observed N(0, 0.125)
# element distribution, so codes spread). LITERAL constants — like
# `ext_sim_lsh_topk`'s hyperplanes — are what makes an *exact* DuckDB
# oracle possible for a quantization index.
_PQ_M = 8  # subspaces
_PQ_D = 8  # dims per subspace
_PQ_CENTROIDS = (-150_000, -50_000, 50_000, 150_000)  # micro-units
_PQ_TOPK = 10


def _pq_elem(i: int, dialect: str) -> str:
    """1-based element accessor, fixed-pointed to micro-units (exact:
    float32 widens to double, one IEEE multiply, exact floor)."""
    acc = f"element_at(embedding, {i})" if dialect == "spark" else f"embedding[{i}]"
    return f"CAST(FLOOR(CAST({acc} AS DOUBLE) * 1000000) AS BIGINT)"


def _pq_dist(m: int, k: int, dialect: str) -> str:
    """Exact integer L2^2 between subvector m and centroid k."""
    c = _PQ_CENTROIDS[k]
    terms = [
        f"({_pq_elem(m * _PQ_D + i + 1, dialect)} - ({c}))"
        f" * ({_pq_elem(m * _PQ_D + i + 1, dialect)} - ({c}))"
        for i in range(_PQ_D)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_code(m: int) -> str:
    """Argmin over the 4 distance columns d{m}_0..d{m}_3, ties to the
    smaller code — identical CASE on both engines."""
    d = [f"d{m}_{k}" for k in range(4)]
    return (
        f"CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]} AND {d[0]} <= {d[3]} THEN 0 "
        f"WHEN {d[1]} <= {d[2]} AND {d[1]} <= {d[3]} THEN 1 "
        f"WHEN {d[2]} <= {d[3]} THEN 2 ELSE 3 END"
    )


def _pq_adc(m: int) -> str:
    """Asymmetric-distance lookup: the probe's precomputed distance to
    the centroid this document's code m selected."""
    return (
        f"CASE c{m} WHEN 0 THEN pd{m}_0 WHEN 1 THEN pd{m}_1 "
        f"WHEN 2 THEN pd{m}_2 ELSE pd{m}_3 END"
    )


def _pq_oracle() -> str:
    dist_cols = ", ".join(
        f"{_pq_dist(m, k, 'duck')} AS d{m}_{k}"
        for m in range(_PQ_M)
        for k in range(4)
    )
    code_cols = ", ".join(f"{_pq_code(m)} AS c{m}" for m in range(_PQ_M))
    probe_cols = ", ".join(
        f"d{m}_{k} AS pd{m}_{k}" for m in range(_PQ_M) for k in range(4)
    )
    adc = " + ".join(_pq_adc(m) for m in range(_PQ_M))
    # duck-only string: `dists` has 2 consumers — MATERIALIZED per the
    # oracle-OOM-class audit (tools/audit_oracle_ctes.py).
    return f"""
    WITH dists AS MATERIALIZED (SELECT vec_id, {dist_cols} FROM embeddings),
    codes AS MATERIALIZED (SELECT vec_id, {code_cols} FROM dists),
    probe AS MATERIALIZED (SELECT {probe_cols} FROM dists WHERE vec_id = 0)
    SELECT c.vec_id, ({adc}) AS adc_dist
    FROM codes c, probe
    WHERE c.vec_id <> 0
    ORDER BY adc_dist ASC, c.vec_id ASC LIMIT {_PQ_TOPK}
    """


@query("ext_sim_ann_pq", oracle=_pq_oracle())
def ext_sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: each 64-dim embedding compresses to 8
    one-byte codes (argmin centroid per 8-dim subspace), and the probe
    ranks documents by asymmetric distance — a per-subspace table lookup
    of the probe's precomputed centroid distances, summed. This is the
    billion-vector memory play (64 floats -> 8 bytes, 32x) that IVF-PQ
    indexes (Faiss-style) run at 100 TB; `ext_sim_ann_ivf` provides the
    coarse partition-pruning half, this provides the in-partition
    compressed scoring half.

    Exactness: the codebook is LITERAL micro-unit constants and every
    distance is exact integer arithmetic, so — unusually for a
    quantization index — the DuckDB oracle reproduces codes and ADC
    distances bit-for-bit (`ext_sim_lsh_topk`'s literal-hyperplane
    pattern).

    Scale: encoding is one codegen map pass (no shuffle — the 32
    distance expressions live in the scan stage); the probe's 32-entry
    distance table joins as a broadcast 1-row frame; ranking is
    TakeOrderedAndProject on the 8-term ADC sum. The code table is the
    persistable artifact: re-probing touches 8 bytes/vector, never the
    raw embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    dists = emb.selectExpr(
        "vec_id",
        *[
            f"{_pq_dist(m, k, 'spark')} AS d{m}_{k}"
            for m in range(_PQ_M)
            for k in range(4)
        ],
    )
    codes = dists.selectExpr(
        "vec_id", *[f"{_pq_code(m)} AS c{m}" for m in range(_PQ_M)]
    )
    probe = dists.filter(F.col("vec_id") == 0).selectExpr(
        *[f"d{m}_{k} AS pd{m}_{k}" for m in range(_PQ_M) for k in range(4)]
    )
    adc = " + ".join(_pq_adc(m) for m in range(_PQ_M))
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .selectExpr("vec_id", f"({adc}) AS adc_dist")
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(_PQ_TOPK)
    )


# --------------------------------------------------------------------------
# maintenance_pq_store / ext_sim_ivfpq_rerank — the composed production ANN
# --------------------------------------------------------------------------

# IVF (coarse prune) and PQ (compressed in-bucket scoring) exist above as
# separate operators; this pair composes them into the index a 100 TB
# deployment actually serves — Faiss's IVFADC with exact refinement:
#   probe -> nprobe bucket prune -> ADC over packed codes -> top-R
#   candidates -> exact re-rank of R rows -> top-k.
#
# Codebook geometry is TUNED, not inherited from ext_sim_ann_pq: that
# key's constant-per-dim centroids only quantize each subvector's MEAN —
# measured candidate recall vs the bucket-exact top-10 was 0-2/10 at
# sf0.1. This tier uses M=16 subspaces x 4 dims with PER-DIM literal
# centroids (sign/magnitude from a fixed integer hash — the LSH-literal
# trick), which carries direction, not just mean: measured 6/10 at
# R=100 on BOTH sf0.01 and sf0.1. The sweep that picked it (all DuckDB-
# replayed, exact): M=8 per-dim 4/10@sf0.1, M=8 K=8 3/10, M=16 K=4
# 6/10; element L2-normalization measured a NO-OP (synthetic Gaussian
# norms already concentrate) and was dropped. On an isotropic random
# corpus true neighbor gaps are tiny — real clustered embeddings
# quantize far better; R (re-rank depth) and M are the recall knobs and
# the eval key pins the measured number per corpus.
#
# The 16 codes pack into ONE BIGINT (2 bits/code, 4 bytes/vector): the
# ADC pass reads 4 bytes of code + 8 bytes of id instead of 256 bytes of
# float32 — the 64x I/O collapse that makes billion-vector search
# feasible.

_PQ2_M = 16  # subspaces
_PQ2_D = 4  # dims per subspace
_IVFPQ_RERANK_R = 100  # ADC candidates kept for exact re-ranking
_IVFPQ_TOPK = 10


def _pq2_cent(m: int, k: int, i: int) -> int:
    """Literal micro-unit centroid value for (subspace m, code k, dim i):
    sign and magnitude from a fixed integer hash — deterministic constants
    inlined into BOTH engines' SQL, like ext_sim_lsh_topk's hyperplanes."""
    h = (m * 73856093 ^ k * 19349663 ^ i * 83492791) & 0xFFFFFFFF
    mag = 150_000 if (h >> 8) & 1 else 50_000
    return mag if (h >> 4) & 1 else -mag


def _pq2_dist(m: int, k: int, dialect: str) -> str:
    """Exact integer L2^2 between subvector m and per-dim centroid k."""
    terms = [
        f"({_pq_elem(m * _PQ2_D + i + 1, dialect)} - ({_pq2_cent(m, k, i)}))"
        f" * ({_pq_elem(m * _PQ2_D + i + 1, dialect)} - ({_pq2_cent(m, k, i)}))"
        for i in range(_PQ2_D)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq2_packed() -> str:
    """All 16 codes packed little-endian into one BIGINT, 2 bits each
    (4^15 overflows INT32, so each code is cast BIGINT before scaling).
    Identical text on both engines."""
    return " + ".join(
        f"(CAST({_pq_code(m)} AS BIGINT)) * {4 ** m}" for m in range(_PQ2_M)
    )


def _pq_unpack(m: int, dialect: str) -> str:
    """Code m back out of the packed BIGINT: integer-divide by 4^m, mask
    with % 4 — same bits on both engines for non-negative packed words
    (Spark spells integer division ``div``, DuckDB ``//``)."""
    op = "div" if dialect == "spark" else "//"
    return f"((packed {op} {4 ** m}) % 4)"


def _pq_adc_packed(m: int, dialect: str) -> str:
    """ADC lookup driven by the packed code word (store-side codes),
    against the probe's precomputed pd{m}_k distance table."""
    c = _pq_unpack(m, dialect)
    return (
        f"CASE {c} WHEN 0 THEN pd{m}_0 WHEN 1 THEN pd{m}_1 "
        f"WHEN 2 THEN pd{m}_2 ELSE pd{m}_3 END"
    )


def pq_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, stage-then-rename) the packed-code PQ store on top of
    the persisted IVF assignment store: ``(vec_id, packed, bucket)``
    partitioned by bucket, so the ADC pass inherits the IVF store's
    partition pruning AND reads 2-byte codes instead of raw vectors.
    Same once-per-corpus discipline and cache-key versioning as
    :func:`~mongodb_cdc_spark.operators.extensions.ivf_store_path`."""
    import os as _os

    from mongodb_cdc_spark.operators.extensions import ivf_store_path
    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(
        scratch_root(), f"pq_store_{sf_name}_m{_PQ2_M}k4_v2"
    )
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        ivf = spark.read.parquet(ivf_store_path(spark, sf_dir))
        dists = ivf.selectExpr(
            "vec_id",
            "bucket",
            *[
                f"{_pq2_dist(m, k, 'spark')} AS d{m}_{k}"
                for m in range(_PQ2_M)
                for k in range(4)
            ],
        )
        codes = dists.selectExpr(
            "vec_id", f"CAST({_pq2_packed()} AS BIGINT) AS packed", "bucket"
        )
        stage = new_stage(path)
        codes.write.mode("overwrite").partitionBy("bucket").parquet(stage)
        publish_store(stage, path)
    return path


def _pq_store_oracle() -> str:
    from mongodb_cdc_spark.operators.extensions import _IVF_K

    dist_cols = ", ".join(
        f"{_pq2_dist(m, k, 'duck')} AS d{m}_{k}"
        for m in range(_PQ2_M)
        for k in range(4)
    )
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id AS bucket FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_unrolled_sql('e.embedding', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    dists AS (SELECT vec_id, bucket, {dist_cols} FROM assigned),
    codes AS (SELECT vec_id, bucket,
                     CAST({_pq2_packed()} AS BIGINT) AS packed
              FROM dists)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(packed) AS BIGINT) AS code_checksum
    FROM codes GROUP BY bucket ORDER BY bucket ASC
    """


@query("maintenance_pq_store", oracle=_pq_store_oracle())
def maintenance_pq_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the packed PQ code store (4 bytes/vector, bucket-
    partitioned on the IVF assignment) and read back the per-bucket
    histogram plus an exact code checksum (``SUM(packed)``) — the sum
    over every vector's full 32-bit code word, so a single flipped code
    anywhere in the store breaks the hash against the oracle's
    from-scratch DuckDB recomputation. The maintenance twin of
    `maintenance_ivf_store`, completing the two-artifact index
    (assignments + codes) `ext_sim_ivfpq_rerank` serves from.

    Scale: the build is one codegen map pass over the already-persisted
    IVF store (no shuffle — the 64 distance expressions and the packing
    arithmetic live in the scan stage, and partitionBy reuses the
    store's bucket layout); the checksum read-back aggregates 4-byte
    words, never raw vectors."""
    store = spark.read.parquet(pq_store_path(spark, sf_dir))
    return (
        store.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("packed").cast("bigint").alias("code_checksum"),
        )
        .orderBy("bucket")
    )


def _ivfpq_rerank_oracle() -> str:
    from mongodb_cdc_spark.operators.extensions import (
        _IVF_K,
        _IVF_STORE_NPROBE,
    )

    dist_cols = ", ".join(
        f"{_pq2_dist(m, k, 'duck')} AS d{m}_{k}"
        for m in range(_PQ2_M)
        for k in range(4)
    )
    probe_cols = ", ".join(
        f"d{m}_{k} AS pd{m}_{k}" for m in range(_PQ2_M) for k in range(4)
    )
    adc = " + ".join(_pq_adc_packed(m, "duck") for m in range(_PQ2_M))
    # Every CTE below is AS MATERIALIZED: DuckDB otherwise inlines each
    # multi-consumer CTE per consumer, recomputing the 128-term unrolled
    # dot products against `embeddings` once per reference — the oracle-
    # environment OOM class that cost gate rows in r6/r7 and was fixed
    # the same way in _ivf_multiprobe_sql (quality.py:1497) and
    # extensions.py:1002. Duck-only string, so the hint is unconditional.
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    probe AS MATERIALIZED (
      SELECT embedding AS p FROM embeddings WHERE vec_id = 0
    ),
    pbuckets AS MATERIALIZED (
      SELECT cent_id FROM (
        SELECT c.cent_id,
               ROW_NUMBER() OVER (
                 ORDER BY {dot_unrolled_sql('pr.p', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS cr
        FROM cents c CROSS JOIN probe pr
      ) t WHERE cr <= {_IVF_STORE_NPROBE}
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id, embedding, cent_id AS bucket FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_unrolled_sql('e.embedding', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    dists AS MATERIALIZED (SELECT vec_id, bucket, {dist_cols} FROM assigned),
    codes AS MATERIALIZED (SELECT vec_id, bucket,
                     CAST({_pq2_packed()} AS BIGINT) AS packed
              FROM dists),
    ptab AS MATERIALIZED (
      SELECT {probe_cols}
      FROM (SELECT {dist_cols} FROM embeddings WHERE vec_id = 0) t
    ),
    cand AS MATERIALIZED (
      SELECT c.vec_id, c.bucket, ({adc}) AS adc_dist
      FROM codes c
      JOIN pbuckets pb ON c.bucket = pb.cent_id
      CROSS JOIN ptab
      WHERE c.vec_id <> 0
      ORDER BY adc_dist ASC, c.vec_id ASC LIMIT {_IVFPQ_RERANK_R}
    ),
    rerank AS MATERIALIZED (
      SELECT a.vec_id, a.bucket, cd.adc_dist,
             {cosine_unrolled_sql('a.embedding', 'pr.p', dialect='duck')} AS c
      FROM assigned a
      JOIN cand cd ON a.vec_id = cd.vec_id
      CROSS JOIN probe pr
    )
    SELECT rk, vec_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(adc_dist AS BIGINT) AS adc_dist,
           CAST(FLOOR(c * 1000000) AS BIGINT) AS cos_e6
    FROM (SELECT vec_id, bucket, adc_dist, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, vec_id ASC) AS rk
          FROM rerank)
    WHERE rk <= {_IVFPQ_TOPK} ORDER BY rk ASC
    """


@query("ext_sim_ivfpq_rerank", oracle=_ivfpq_rerank_oracle())
def ext_sim_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with exact refinement — the full Faiss-style production
    ANN path, composed from the two persisted index artifacts:

    1. rank the K=8 broadcast centroids against probe vec_id=0, keep
       nprobe=3 buckets (the measured `ext_sim_ivf_multiprobe_recall`
       operating point; <=3-row documented scalar collect so the bucket
       ids are a literal IN-list the scans prune on);
    2. ADC-score ONLY those buckets of the packed-code store
       (`maintenance_pq_store`): unpack each 2-bit code out of the
       BIGINT word and look up the probe's precomputed 64-entry
       subspace-distance table (broadcast 1-row frame) — exact integer
       arithmetic over 4 bytes/vector, TakeOrdered to R=100 candidates
       (the MEASURED operating point: the ADC top-100 holds 6/10 of the
       bucket-exact top-10 at sf0.01 AND sf0.1 on this isotropic
       synthetic corpus — the codebook-sweep table in the tier comment;
       clustered real embeddings quantize far better, and R/M are the
       per-corpus recall knobs);
    3. exact-rerank: join the 100 candidate ids back to the
       bucket-pruned IVF store (raw vectors touched for R rows only),
       exact cosine, top-10.

    The oracle replays all three stages from the raw embeddings table
    in DuckDB — drifted codes, a stale bucket, or a wrong unpack all
    break the hash. Scale: stage 2's I/O is (nprobe/K) x 2 bytes/vec;
    stage 3 reads R rows regardless of corpus size; no stage shuffles
    (broadcasts + TakeOrderedAndProject only)."""
    from pyspark.sql.window import Window

    from mongodb_cdc_spark.functions.vectors import cosine, dot
    from mongodb_cdc_spark.operators.extensions import (
        _IVF_K,
        _IVF_STORE_NPROBE,
        ivf_store_path,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("p"))
    ranked = (
        probe.crossJoin(F.broadcast(cents))
        .select("cent_id", dot("p", "cent").alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("cent_id").asc())
        .limit(_IVF_STORE_NPROBE)
    )
    # bounded driver-side scalars: exactly nprobe (=3) bucket ids — the
    # same documented pattern as ext_sim_ann_from_store.
    buckets = [int(r.cent_id) for r in ranked.collect()]

    ptab = (
        e.filter(F.col("vec_id") == 0)
        .selectExpr(
            *[
                f"{_pq2_dist(m, k, 'spark')} AS pd{m}_{k}"
                for m in range(_PQ2_M)
                for k in range(4)
            ]
        )
    )
    adc = " + ".join(_pq_adc_packed(m, "spark") for m in range(_PQ2_M))
    codes = spark.read.parquet(pq_store_path(spark, sf_dir))
    cand = (
        codes.filter(F.col("bucket").isin(buckets) & (F.col("vec_id") != 0))
        .join(F.broadcast(ptab))
        .selectExpr("vec_id", "bucket", f"({adc}) AS adc_dist")
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(_IVFPQ_RERANK_R)
    )

    ivf = spark.read.parquet(ivf_store_path(spark, sf_dir))
    rerank = (
        ivf.filter(F.col("bucket").isin(buckets))
        .join(F.broadcast(cand.select("vec_id", "adc_dist")), "vec_id")
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "bucket",
            "adc_dist",
            cosine("embedding", "p").alias("c"),
        )
    )
    top = rerank.orderBy(F.col("c").desc(), F.col("vec_id").asc()).limit(
        _IVFPQ_TOPK
    )
    w = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.col("c").desc(), F.col("vec_id").asc()
    )
    return top.select(
        F.row_number().over(w).alias("rk"),
        "vec_id",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("adc_dist").cast("bigint").alias("adc_dist"),
        F.floor(F.col("c") * 1000000).cast("bigint").alias("cos_e6"),
    ).orderBy("rk")


def _ivfpq_recall_oracle() -> str:
    from mongodb_cdc_spark.operators.extensions import (
        _IVF_K,
        _IVF_STORE_NPROBE,
    )

    dist_cols = ", ".join(
        f"{_pq2_dist(m, k, 'duck')} AS d{m}_{k}"
        for m in range(_PQ2_M)
        for k in range(4)
    )
    probe_cols = ", ".join(
        f"d{m}_{k} AS pd{m}_{k}" for m in range(_PQ2_M) for k in range(4)
    )
    adc = " + ".join(_pq_adc_packed(m, "duck") for m in range(_PQ2_M))
    # AS MATERIALIZED on every CTE — same OOM-class fix as
    # _ivfpq_rerank_oracle above; this exact oracle was the one red row
    # of CORRECTNESS_r07 (DuckDB inlined the embedding-heavy CTEs per
    # consumer: `inb` has 3 consumers, `cand`/`exact` 2 each).
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    probe AS MATERIALIZED (
      SELECT embedding AS p FROM embeddings WHERE vec_id = 0
    ),
    pbuckets AS MATERIALIZED (
      SELECT cent_id FROM (
        SELECT c.cent_id,
               ROW_NUMBER() OVER (
                 ORDER BY {dot_unrolled_sql('pr.p', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS cr
        FROM cents c CROSS JOIN probe pr
      ) t WHERE cr <= {_IVF_STORE_NPROBE}
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id, embedding, cent_id AS bucket FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_unrolled_sql('e.embedding', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    inb AS MATERIALIZED (
      SELECT a.vec_id, a.embedding, a.bucket
      FROM assigned a JOIN pbuckets pb ON a.bucket = pb.cent_id
      WHERE a.vec_id <> 0
    ),
    dists AS MATERIALIZED (SELECT vec_id, bucket, {dist_cols} FROM inb),
    codes AS MATERIALIZED (SELECT vec_id, bucket,
                     CAST({_pq2_packed()} AS BIGINT) AS packed
              FROM dists),
    ptab AS MATERIALIZED (
      SELECT {probe_cols}
      FROM (SELECT {dist_cols} FROM embeddings WHERE vec_id = 0) t
    ),
    cand AS MATERIALIZED (
      SELECT c.vec_id, ({adc}) AS adc_dist
      FROM codes c CROSS JOIN ptab
      ORDER BY adc_dist ASC, c.vec_id ASC LIMIT {_IVFPQ_RERANK_R}
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT i.vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY {cosine_unrolled_sql('i.embedding', 'pr.p', dialect='duck')} DESC,
                          i.vec_id ASC) AS rk
        FROM inb i CROSS JOIN probe pr
      ) t WHERE rk <= {_IVFPQ_TOPK}
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM inb) AS n_candidates,
           CAST({_IVFPQ_RERANK_R} AS BIGINT) AS adc_depth_r,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact_topk,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM exact e JOIN cand c USING (vec_id)) AS n_hit,
           (SELECT CAST(COUNT(*) * 10000 AS BIGINT)
            FROM exact e JOIN cand c USING (vec_id))
             // (SELECT COUNT(*) FROM exact) AS recall_bp
    """


@query("ext_sim_ivfpq_recall_eval", oracle=_ivfpq_recall_oracle())
def ext_sim_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify the IVFPQ operating point: does the ADC top-R candidate
    set actually contain the bucket-exact top-k? Reports the in-bucket
    candidate pool size, R, and the measured containment (hash-checked
    in basis points — the 6/10 number quoted in the tier comment is
    THIS key's output, not prose). Mirrors `ext_sim_ivf_recall_eval`'s
    contract for the coarse-quantizer half: run at index-build time per
    corpus, never per query; if recall_bp drifts below target, raise R
    (re-rank depth) or M (code width) and re-certify.

    Scale: the candidate pool is nprobe/K of the corpus; the exact
    in-bucket top-k ground truth costs one pass over that pool (bounded
    TakeOrdered both sides); the final containment join touches R+k
    ids."""
    from mongodb_cdc_spark.functions.vectors import cosine, dot
    from mongodb_cdc_spark.operators.extensions import (
        _IVF_K,
        _IVF_STORE_NPROBE,
        ivf_store_path,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("p"))
    ranked = (
        probe.crossJoin(F.broadcast(cents))
        .select("cent_id", dot("p", "cent").alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("cent_id").asc())
        .limit(_IVF_STORE_NPROBE)
    )
    buckets = [int(r.cent_id) for r in ranked.collect()]

    ivf = spark.read.parquet(ivf_store_path(spark, sf_dir))
    inb = ivf.filter(F.col("bucket").isin(buckets) & (F.col("vec_id") != 0))

    ptab = e.filter(F.col("vec_id") == 0).selectExpr(
        *[
            f"{_pq2_dist(m, k, 'spark')} AS pd{m}_{k}"
            for m in range(_PQ2_M)
            for k in range(4)
        ]
    )
    adc = " + ".join(_pq_adc_packed(m, "spark") for m in range(_PQ2_M))
    codes = spark.read.parquet(pq_store_path(spark, sf_dir)).filter(
        F.col("bucket").isin(buckets) & (F.col("vec_id") != 0)
    )
    cand = (
        codes.join(F.broadcast(ptab))
        .selectExpr("vec_id", f"({adc}) AS adc_dist")
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(_IVFPQ_RERANK_R)
        .select("vec_id")
    )
    exact = (
        inb.crossJoin(F.broadcast(probe))
        .select("vec_id", cosine("embedding", "p").alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(_IVFPQ_TOPK)
        .select("vec_id")
    )
    n_cand = inb.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_exact = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_topk"))
    n_hit = (
        exact.join(cand, "vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    return (
        n_cand.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_candidates",
            F.lit(_IVFPQ_RERANK_R).cast("bigint").alias("adc_depth_r"),
            "n_exact_topk",
            "n_hit",
            F.expr("CAST(n_hit * 10000 div n_exact_topk AS BIGINT)").alias(
                "recall_bp"
            ),
        )
    )


# --------------------------------------------------------------------------
# ml_kmeans_refine — exact-integer Lloyd iterations on DataFrames
# --------------------------------------------------------------------------

_KM_K = 4
_KM_INIT = (-150_000, -50_000, 50_000, 150_000)  # micro-units, per-dim const
_KM_AVG = (
    "CASE WHEN {S} >= 0 THEN (2 * {S} + {n}) {div} (2 * {n}) "
    "ELSE -(((-2 * {S}) + {n}) {div} (2 * {n})) END"
)


def _km_oracle() -> str:
    init_rows = ", ".join(f"({cid}, {c})" for cid, c in enumerate(_KM_INIT))
    avg = _KM_AVG.format(div="//", S="SUM(e.vi)", n="COUNT(*)")
    return f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, CAST(pos - 1 AS BIGINT) AS dim,
             CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * 1000000) AS BIGINT) AS vi
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
    ),
    c0 AS MATERIALIZED (SELECT * FROM (VALUES {init_rows}) t(cid, c)),
    d1 AS MATERIALIZED (
      SELECT e.vec_id, c.cid, SUM((e.vi - c.c) * (e.vi - c.c)) AS dist
      FROM ex e CROSS JOIN c0 c GROUP BY 1, 2
    ),
    a1 AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY dist ASC, cid ASC) AS rn FROM d1) WHERE rn = 1
    ),
    c1 AS MATERIALIZED (
      SELECT a.cid, e.dim, CAST({avg} AS BIGINT) AS c
      FROM ex e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY a.cid, e.dim
    ),
    d2 AS MATERIALIZED (
      SELECT e.vec_id, c.cid, SUM((e.vi - c.c) * (e.vi - c.c)) AS dist
      FROM ex e JOIN c1 c ON e.dim = c.dim GROUP BY 1, 2
    ),
    a2 AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY dist ASC, cid ASC) AS rn FROM d2) WHERE rn = 1
    ),
    c2 AS MATERIALIZED (
      SELECT a.cid, e.dim, CAST({avg} AS BIGINT) AS c
      FROM ex e JOIN a2 a ON e.vec_id = a.vec_id GROUP BY a.cid, e.dim
    )
    SELECT m.cid, m.n_members, s.checksum
    FROM (SELECT cid, COUNT(*) AS n_members FROM a2 GROUP BY cid) m
    JOIN (SELECT cid, CAST(SUM(c) AS BIGINT) AS checksum FROM c2 GROUP BY cid) s
      ON m.cid = s.cid
    """


@query("ml_kmeans_refine", oracle=_km_oracle())
def ml_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means over the embedding corpus,
    bit-exact across engines: distances, argmin assignments (unique
    (dist, cid) tiebreak), and the recomputed centroids (exact BIGINT
    sums + half-up integer means, the `ext_embed_centroids` machinery)
    are all integer arithmetic, so a nondeterministic-looking ML
    training step becomes a hashable cross-engine contract. Output:
    per-cluster membership count + centroid checksum after the second
    assignment.

    This is the iterative-refinement template the engine offers for
    Lloyd/EM-style algorithms at 100 TB (same family as the connected-
    components loop in `ext_dedup_cluster`): per iteration, the centroid
    table (K x dims rows — tiny) BROADCAST-joins the exploded vectors,
    the per-(vector, cluster) distance aggregate combines fully map-side
    (a vector's 64 elements never span partitions), assignment is one
    keyed argmin, and the new centroids are a map-combinable aggregate
    on (cid, dim). No driver collect between iterations; K x dims stays
    distributed. Fixed-point determinism is what makes retries/restarts
    safe mid-training."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.expr(
            "CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("vi"),
    )
    c0 = spark.createDataFrame(
        [(cid, c) for cid, c in enumerate(_KM_INIT)], "cid int, c bigint"
    )
    avg = F.expr(
        _KM_AVG.format(div="div", S="SUM(vi)", n="COUNT(*)")
    ).cast("bigint")

    def assign(cents: DataFrame, on_dim: bool) -> DataFrame:
        joined = (
            ex.join(F.broadcast(cents), "dim")
            if on_dim
            else ex.crossJoin(F.broadcast(cents))
        )
        d = joined.groupBy("vec_id", "cid").agg(
            F.sum((F.col("vi") - F.col("c")) * (F.col("vi") - F.col("c"))).alias(
                "dist"
            )
        )
        return d.groupBy("vec_id").agg(
            F.min_by("cid", F.struct("dist", "cid")).alias("cid")
        )

    def recompute(assigned: DataFrame) -> DataFrame:
        return (
            ex.join(assigned, "vec_id")
            .groupBy("cid", "dim")
            .agg(avg.alias("c"))
        )

    a1 = assign(c0, on_dim=False)
    c1 = recompute(a1)
    a2 = assign(c1, on_dim=True)
    c2 = recompute(a2)
    members = a2.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    checksum = c2.groupBy("cid").agg(
        F.sum("c").cast("bigint").alias("checksum")
    )
    return members.join(checksum, "cid")


# --------------------------------------------------------------------------
# ext_quality_rules — Gopher-style rule battery as a corpus diagnostic
# --------------------------------------------------------------------------

# Each rule: (name, spark_fail_predicate, duckdb_fail_predicate) over the
# per-document features. Integer cross-multiplies only — no ratio floats.
_QR_TOK = "size(filter(split(text, ' '), t -> t != ''))"
_QR_TOK_D = "len(list_filter(string_split(text, ' '), t -> t <> ''))"
_QR_WCHARS = "length(replace(text, ' ', ''))"
_QR_ALPHA = (
    "size(filter(split(text, ' '), t -> t rlike '[a-z]'))"
)
_QR_ALPHA_D = (
    "len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '[a-z]')))"
)
_QR_DIGIT = "size(filter(split(text, ' '), t -> t rlike '^[0-9]+$'))"
_QR_DIGIT_D = (
    "len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$')))"
)

_QR_RULES: tuple[tuple[str, str, str], ...] = (
    # word-count band [20, 100000]
    (
        "word_count_band",
        f"NOT ({_QR_TOK} BETWEEN 20 AND 100000)",
        f"NOT ({_QR_TOK_D} BETWEEN 20 AND 100000)",
    ),
    # mean word length in [3, 10]: 10*chars vs n*30 / n*100
    (
        "mean_word_len_band",
        f"NOT ({_QR_WCHARS} * 10 >= {_QR_TOK} * 30 "
        f"AND {_QR_WCHARS} * 10 <= {_QR_TOK} * 100)",
        f"NOT ({_QR_WCHARS} * 10 >= {_QR_TOK_D} * 30 "
        f"AND {_QR_WCHARS} * 10 <= {_QR_TOK_D} * 100)",
    ),
    # >= 80% of tokens contain a lowercase letter
    (
        "alpha_word_ratio",
        f"{_QR_ALPHA} * 10 < {_QR_TOK} * 8",
        f"{_QR_ALPHA_D} * 10 < {_QR_TOK_D} * 8",
    ),
    # <= 20% purely-numeric tokens
    (
        "digit_token_ratio",
        f"{_QR_DIGIT} * 10 > {_QR_TOK} * 2",
        f"{_QR_DIGIT_D} * 10 > {_QR_TOK_D} * 2",
    ),
    # punctuation density < 10% of characters
    (
        "punct_density",
        "(length(text) - length(translate(text, '.,!', ''))) * 10"
        " >= length(text)",
        "(length(text) - length(replace(replace(replace(text, '.', ''),"
        " ',', ''), '!', ''))) * 10 >= length(text)",
    ),
)


def _qr_oracle() -> str:
    branches = [
        f"SELECT '{name}' AS rule, "
        f"CAST(SUM(CASE WHEN {duck} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail, "
        f"CAST((SUM(CASE WHEN {duck} THEN 1 ELSE 0 END) * 1000000) // COUNT(*) "
        f"AS BIGINT) AS fail_ppm "
        f"FROM documents"
        for name, _, duck in _QR_RULES
    ]
    return " UNION ALL ".join(branches)


@query("ext_quality_rules", oracle=_qr_oracle())
def ext_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule battery (Rae et al. 2021's repetition/quality
    filter family, the public method behind most pre-training corpus
    gates): word-count band, mean-word-length band, alphabetic-word
    ratio, numeric-token ratio, punctuation density — evaluated as
    integer cross-multiplies (no ratio floats), reported as a per-rule
    failure census over the corpus. This is the diagnostic you run
    BEFORE committing to a filter config: which rule would remove how
    much of the corpus. The per-document gate (`ext_text_quality`) and
    the end-to-end filter (`ext_corpus_prep_e2e`) consume the same
    predicates.

    Scale: one scan computes every rule's conditional sum map-side (all
    codegen string/array expressions); the output is |rules| rows. The
    UNION-of-aggregates form keeps each branch independently prunable;
    Spark shares the scan via exchange reuse."""
    d = load_table(spark, sf_dir, "documents")
    aggs = []
    for name, sp, _ in _QR_RULES:
        aggs.append(
            F.sum(F.when(F.expr(sp), 1).otherwise(0)).cast("bigint").alias(f"f_{name}")
        )
    wide = d.agg(F.count(F.lit(1)).alias("n_docs"), *aggs)
    stack = ", ".join(f"'{name}', f_{name}" for name, _, _ in _QR_RULES)
    return wide.selectExpr(
        f"stack({len(_QR_RULES)}, {stack}) AS (rule, n_fail)", "n_docs"
    ).selectExpr(
        "rule",
        "CAST(n_fail AS BIGINT) AS n_fail",
        "CAST((n_fail * 1000000) div n_docs AS BIGINT) AS fail_ppm",
    )


# --------------------------------------------------------------------------
# ext_embed_knn_eval — leave-one-out kNN label eval over the embeddings
# --------------------------------------------------------------------------
# Embedding-space governance: before an embedding column is trusted for
# semantic dedup / clustering / retrieval, measure how label-consistent
# its neighborhoods are. For each probe vector, take the 10 nearest
# corpus vectors (leave-one-out: the probe itself excluded), and report
# (a) precision@10 against the probe's own label and (b) the 10-NN
# majority-vote prediction — the classic kNN-classifier eval, which is
# also exactly the quantity SemDeDup-style pipelines sanity-check before
# trusting cosine neighborhoods. Companion to `ext_dedup_recall_eval`
# (the dedup-side governance op); the probe set is a bounded audit
# slice, rotated per run in production.
#
# Scale: probes broadcast (<= 80 vectors even at 100x — the vec_id <
# 2000 bound is absolute); the corpus is scanned ONCE and scored against
# all probes map-side with the unrolled bit-exact cosine; the per-probe
# rank <= k filter plans a WindowGroupLimit partial pass so the exchange
# carries O(probes x k x partitions) rows, never corpus x probes. The
# majority vote runs integer-encoded — max(c*16 + 15 - label) packs
# (count DESC, label ASC) into one BIGINT aggregate, no second window.

_KNNE_K = 10
_KNNE_STEP = 25  # probe stride over vec_id
_KNNE_MAX = 2000  # absolute probe-id ceiling: probe set stays bounded


@query(
    "ext_embed_knn_eval",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, label AS true_label, embedding AS p
      FROM embeddings
      WHERE vec_id % {_KNNE_STEP} = 0 AND vec_id < {_KNNE_MAX}
    ), topk AS (
      SELECT probe_id, true_label, nlabel FROM (
        SELECT probe_id, true_label, e.label AS nlabel,
               ROW_NUMBER() OVER (
                 PARTITION BY probe_id
                 ORDER BY {cosine_unrolled_sql('e.embedding', 'p', dialect='duck')} DESC,
                          e.vec_id ASC) AS rk
        FROM embeddings e, probes WHERE e.vec_id <> probe_id
      ) WHERE rk <= {_KNNE_K}
    ), votes AS (
      SELECT probe_id, true_label, nlabel, COUNT(*) AS c
      FROM topk GROUP BY probe_id, true_label, nlabel
    )
    SELECT probe_id, true_label,
           CAST(SUM(CASE WHEN nlabel = true_label THEN c ELSE 0 END)
                AS BIGINT) AS hits,
           CAST(SUM(CASE WHEN nlabel = true_label THEN c ELSE 0 END)
                * 1000000 // {_KNNE_K} AS BIGINT) AS prec_e6,
           CAST(15 - MAX(c * 16 + 15 - nlabel) % 16 AS BIGINT) AS pred_label,
           (15 - MAX(c * 16 + 15 - nlabel) % 16 = true_label) AS knn_correct
    FROM votes GROUP BY probe_id, true_label
    """,
)
def ext_embed_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 10-NN label evaluation (docstring block above):
    per-probe precision@10, integer-encoded majority-vote prediction
    (count DESC, label ASC tiebreak), and the correct/incorrect flag.
    Labels are 0..9 and counts <= 10, so the vote packs exactly into
    ``c*16 + (15 - label)`` and unpacks with one mod — pure integer
    arithmetic, no second window, identical in both engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(
        (F.col("vec_id") % _KNNE_STEP == 0) & (F.col("vec_id") < _KNNE_MAX)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("p"),
    )
    scored = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "true_label",
            F.col("label").alias("nlabel"),
            "vec_id",
            F.expr(
                cosine_unrolled_sql("embedding", "p", dialect="spark")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNNE_K)
        .select("probe_id", "true_label", "nlabel")
    )
    votes = topk.groupBy("probe_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        votes.groupBy("probe_id", "true_label")
        .agg(
            F.sum(
                F.when(F.col("nlabel") == F.col("true_label"), F.col("c")).otherwise(0)
            ).cast("bigint").alias("hits"),
            F.max(F.expr("c * 16 + 15 - nlabel")).alias("enc"),
        )
        .select(
            "probe_id",
            "true_label",
            "hits",
            F.expr(f"CAST(hits * 1000000 div {_KNNE_K} AS BIGINT)").alias(
                "prec_e6"
            ),
            F.expr("CAST(15 - (enc % 16) AS BIGINT)").alias("pred_label"),
            F.expr("(15 - (enc % 16)) = true_label").alias("knn_correct"),
        )
    )


# --------------------------------------------------------------------------
# ext_embed_norm_stats
# --------------------------------------------------------------------------


@query(
    "ext_embed_norm_stats",
    oracle=f"""
    WITH ex AS (
      SELECT CAST(pos - 1 AS BIGINT) AS dim,
             embedding[pos] AS v
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
    ),
    fx AS (
      SELECT dim, {_VI} AS vi,
             CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS vm
      FROM ex
    ),
    s AS (
      SELECT dim, COUNT(*) AS n, SUM(vi) AS S,
             SUM(vm * vm) AS sq_milli,
             MIN(vi) AS min_micro, MAX(vi) AS max_micro,
             SUM(CASE WHEN vi = 0 THEN 1 ELSE 0 END) AS nz
      FROM fx GROUP BY dim
    )
    SELECT dim, CAST(n AS BIGINT) AS n,
           CAST({_AVG_MICRO.format(div="//")} AS BIGINT) AS mean_micro,
           CAST(sq_milli AS BIGINT) AS sumsq_milli,
           min_micro, max_micro,
           CAST(nz * 10000 // n AS BIGINT) AS zero_bp
    FROM s
    """,
)
def ext_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health audit: mean, energy (exact sum of
    milli-unit squares), min/max, and dead-dimension rate — the QA pass
    an embedding pipeline runs before indexing a new model's output
    (collapsed dimensions, saturated dimensions, and mean drift all show
    up here before they silently wreck ANN recall downstream).

    Determinism: every statistic is fixed-point (micro-unit means via
    the sign-mirrored half-up division, milli-unit squares summed as
    exact BIGINTs) — no float accumulation order anywhere.

    Scale: posexplode is a scan-stage expansion (no shuffle); the
    aggregate is map-side combinable on dim, so the shuffle carries
    dims x partitions rows regardless of corpus size — the same shape
    as `ext_embed_centroids`, whose micro-unit conventions this reuses.
    sumsq_milli stays in BIGINT while rows * 1e6 < 9.2e18 (~9 T
    vectors); past that, promote the square sum to DECIMAL(38, 0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    fx = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.expr(_VI).alias("vi"),
        F.expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)").alias("vm"),
    )
    s = fx.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vi").alias("S"),
        F.sum(F.expr("vm * vm")).alias("sq_milli"),
        F.min("vi").alias("min_micro"),
        F.max("vi").alias("max_micro"),
        F.sum(F.expr("CASE WHEN vi = 0 THEN 1 ELSE 0 END")).alias("nz"),
    )
    return s.select(
        "dim",
        "n",
        F.expr(_AVG_MICRO.format(div="div")).alias("mean_micro"),
        F.col("sq_milli").cast("bigint").alias("sumsq_milli"),
        "min_micro",
        "max_micro",
        F.expr("CAST(nz * 10000 div n AS BIGINT)").alias("zero_bp"),
    )


# --------------------------------------------------------------------------
# ext_sim_ivf_recall_eval
# --------------------------------------------------------------------------


def _ivf_recall_sql(dialect: str) -> str:
    """Measured IVF recall, one SQL text per dialect — the whole
    evaluation (centroid assignment, bucket-restricted search,
    brute-force ground truth, per-probe recall) is a single shared
    query shape, so the Spark plan and the DuckDB oracle cannot drift."""
    div = "div" if dialect == "spark" else "//"
    # duck-only MATERIALIZED on the multi-consumer CTEs (probes x2,
    # assigned x2, brute x2, ivf x2) — oracle-OOM-class hardening, same
    # rationale as _ivf_multiprobe_sql below.
    mat = "MATERIALIZED " if dialect == "duck" else ""
    dot_ec = dot_unrolled_sql("e.embedding", "c.cent", dialect=dialect)
    cos_ep = cosine_unrolled_sql("e.embedding", "pr.p", dialect=dialect)
    cos_ap = cosine_unrolled_sql("a.embedding", "pb.p", dialect=dialect)
    return f"""
    WITH cents AS {mat}(
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < 8
    ),
    probes AS {mat}(
      SELECT vec_id AS probe_id, embedding AS p
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 132
    ),
    assigned AS {mat}(
      SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_ec} DESC, c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    pbuckets AS {mat}(
      SELECT p.probe_id, p.p, a.cent_id AS pbucket
      FROM probes p JOIN assigned a ON a.vec_id = p.probe_id
    ),
    brute AS {mat}(
      SELECT probe_id, vec_id FROM (
        SELECT pr.probe_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                 ORDER BY {cos_ep} DESC, e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN probes pr
        WHERE e.vec_id <> pr.probe_id
      ) t WHERE rn <= 10
    ),
    ivf AS {mat}(
      SELECT probe_id, vec_id FROM (
        SELECT pb.probe_id, a.vec_id,
               ROW_NUMBER() OVER (PARTITION BY pb.probe_id
                 ORDER BY {cos_ap} DESC, a.vec_id ASC) AS rn
        FROM assigned a JOIN pbuckets pb ON a.cent_id = pb.pbucket
        WHERE a.vec_id <> pb.probe_id
      ) t WHERE rn <= 10
    ),
    bcnt AS (
      SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_brute
      FROM brute GROUP BY probe_id
    ),
    icnt AS (
      SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_ivf
      FROM ivf GROUP BY probe_id
    ),
    hits AS (
      SELECT b.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM brute b JOIN ivf i
        ON b.probe_id = i.probe_id AND b.vec_id = i.vec_id
      GROUP BY b.probe_id
    )
    SELECT b.probe_id,
           b.n_brute,
           CAST(COALESCE(i.n_ivf, 0) AS BIGINT) AS n_ivf,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(h.n_hit, 0) * 10000 {div} b.n_brute AS BIGINT)
             AS recall_bp
    FROM bcnt b
    LEFT JOIN icnt i ON b.probe_id = i.probe_id
    LEFT JOIN hits h ON b.probe_id = h.probe_id
    ORDER BY b.probe_id ASC
    """


@query("ext_sim_ivf_recall_eval", oracle=_ivf_recall_sql("duck"))
def ext_sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the IVF ANN index against brute-force ground
    truth — the certification pass `ext_dedup_recall_eval` runs for the
    LSH dedup tier, applied to the similarity tier: 32 probe vectors
    each fetch top-10 two ways (full-corpus exact cosine vs
    1-bucket-of-8 IVF search over the same deterministic centroids as
    `ext_sim_ann_ivf`) and the per-probe overlap IS the recall, in
    integer basis points. An index whose recall silently collapses — the
    exact failure the 100x LSH rehearsal caught in round 4 — now fails a
    hash-checked row instead of a vibe. The entire evaluation (assign,
    search, ground truth, recall) is ONE dialect-parameterized SQL text;
    ranking floats never leave the ORDER BY (unrolled left-associative
    dot products, bit-identical IEEE sequences on both engines; ties
    broken by vec_id).

    Measured honestly: mean recall_bp ~= 2300 (23%) at sf0.1 — a
    single-probe 1-of-8-bucket search over near-isotropic synthetic
    embeddings SHOULD score low (random buckets would give ~12.5%);
    this row is the evidence for why the production ANN paths
    (`ext_sim_lsh_topk`, 32 probes) multi-probe, and the regression
    tripwire if an index change drops recall further. The multi-probe
    claim is itself measured, not prose: see
    `ext_sim_ivf_multiprobe_recall` (same probes, nprobe=3, mean
    recall 57% — per-probe p1/p3 side by side, hash-checked).

    Scale: centroids and probes are broadcast dims by construction
    (8 + 32 rows); assignment is one corpus scan + ROW_NUMBER-over-K
    (WindowGroupLimit prunes to rn=1 before the shuffle); ground truth
    is the bounded-probes brute pass (probes x corpus, map-side scored,
    per-probe top-10 group-limited) — linear in corpus like
    `ext_embed_knn_eval`, run at certification time, never per query;
    the IVF side touches ~1/K of the corpus. Recall arithmetic is
    exact integers."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ivf_recall_sql("spark"))


# --------------------------------------------------------------------------
# ext_sim_ivf_multiprobe_recall
# --------------------------------------------------------------------------

_IVF_NPROBE = 3


def _ivf_multiprobe_sql(dialect: str, nprobe: int = _IVF_NPROBE) -> str:
    """Measured multi-probe IVF recall, one SQL text per dialect.

    Same shared-query-shape discipline as :func:`_ivf_recall_sql`: the
    Spark plan and the DuckDB oracle are the SAME text, so they cannot
    drift. The probe ranks all K centroids once (``pb_ranked``) and the
    bucket search runs twice over the same candidate join — restricted
    to the rank-1 centroid (the `ext_sim_ann_ivf` single-probe path)
    and to the top-``nprobe`` centroids — so the output row carries the
    1-probe and multi-probe recall side by side for the same probe.

    The duck dialect marks the multi-consumer CTEs (``assigned``,
    ``pb_ranked``, ``brute``) ``AS MATERIALIZED``: DuckDB otherwise
    inlines a CTE into every consumer, and with 64-term unrolled dot
    products inside, the twice-inlined plan tree is what blew the
    driver's memory ceiling in a late-window round-6 gate (fake
    tiny-allocation OOM under JVM co-residence). Materializing caps
    the plan at one copy of each heavy expression; Spark keeps the
    plain CTE (its optimizer handles reuse and has no such keyword)."""
    div = "div" if dialect == "spark" else "//"
    mat = "MATERIALIZED " if dialect == "duck" else ""
    dot_ec = dot_unrolled_sql("e.embedding", "c.cent", dialect=dialect)
    dot_pc = dot_unrolled_sql("pr.p", "c.cent", dialect=dialect)
    cos_ep = cosine_unrolled_sql("e.embedding", "pr.p", dialect=dialect)
    cos_ap = cosine_unrolled_sql("a.embedding", "pb.p", dialect=dialect)
    return f"""
    WITH cents AS {mat}(
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < 8
    ),
    probes AS {mat}(
      SELECT vec_id AS probe_id, embedding AS p
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 132
    ),
    assigned AS {mat}(
      SELECT vec_id, embedding, cent_id FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_ec} DESC, c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    pb_ranked AS {mat}(
      SELECT probe_id, p, cent_id, cr FROM (
        SELECT pr.probe_id, pr.p, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                 ORDER BY {dot_pc} DESC, c.cent_id ASC) AS cr
        FROM probes pr CROSS JOIN cents c
      ) t WHERE cr <= {nprobe}
    ),
    brute AS {mat}(
      SELECT probe_id, vec_id FROM (
        SELECT pr.probe_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                 ORDER BY {cos_ep} DESC, e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN probes pr
        WHERE e.vec_id <> pr.probe_id
      ) t WHERE rn <= 10
    ),
    ivf1 AS (
      SELECT probe_id, vec_id FROM (
        SELECT pb.probe_id, a.vec_id,
               ROW_NUMBER() OVER (PARTITION BY pb.probe_id
                 ORDER BY {cos_ap} DESC, a.vec_id ASC) AS rn
        FROM assigned a JOIN pb_ranked pb ON a.cent_id = pb.cent_id
        WHERE pb.cr = 1 AND a.vec_id <> pb.probe_id
      ) t WHERE rn <= 10
    ),
    ivfp AS (
      SELECT probe_id, vec_id FROM (
        SELECT pb.probe_id, a.vec_id,
               ROW_NUMBER() OVER (PARTITION BY pb.probe_id
                 ORDER BY {cos_ap} DESC, a.vec_id ASC) AS rn
        FROM assigned a JOIN pb_ranked pb ON a.cent_id = pb.cent_id
        WHERE a.vec_id <> pb.probe_id
      ) t WHERE rn <= 10
    ),
    bcnt AS (
      SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_brute
      FROM brute GROUP BY probe_id
    ),
    h1 AS (
      SELECT b.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM brute b JOIN ivf1 i
        ON b.probe_id = i.probe_id AND b.vec_id = i.vec_id
      GROUP BY b.probe_id
    ),
    hp AS (
      SELECT b.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM brute b JOIN ivfp i
        ON b.probe_id = i.probe_id AND b.vec_id = i.vec_id
      GROUP BY b.probe_id
    )
    SELECT b.probe_id,
           b.n_brute,
           CAST(COALESCE(h1.n_hit, 0) AS BIGINT) AS n_hit_p1,
           CAST(COALESCE(hp.n_hit, 0) AS BIGINT) AS n_hit_p{nprobe},
           CAST(COALESCE(h1.n_hit, 0) * 10000 {div} b.n_brute AS BIGINT)
             AS recall_bp_p1,
           CAST(COALESCE(hp.n_hit, 0) * 10000 {div} b.n_brute AS BIGINT)
             AS recall_bp_p{nprobe}
    FROM bcnt b
    LEFT JOIN h1 ON b.probe_id = h1.probe_id
    LEFT JOIN hp ON b.probe_id = hp.probe_id
    ORDER BY b.probe_id ASC
    """


@query("ext_sim_ivf_multiprobe_recall", oracle=_ivf_multiprobe_sql("duck"))
def ext_sim_ivf_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED multi-probe IVF recall — the hash-checked closure of the
    `ext_sim_ivf_recall_eval` story. That row certifies the single-probe
    search at ~23% recall and its docstring says "this is why production
    multi-probes"; this operator makes the claim itself a measured,
    regression-gated number instead of prose: the same 32 probes search
    the top-`_IVF_NPROBE` (=3) centroid buckets and the output carries
    per-probe recall at nprobe=1 and nprobe=3 SIDE BY SIDE (the p1
    column is bit-identical to the single-probe eval — pinned by a
    parity property test — because the probe's rank-1 centroid IS its
    assignment bucket under the same unrolled dot ordering).

    Scale: identical shape to the single-probe eval — centroids and
    probes are broadcast dims (8 + 32 rows), assignment is one corpus
    scan + ROW_NUMBER-over-K (WindowGroupLimit prunes rn=1 before the
    shuffle), ground truth is the bounded probes x corpus brute pass —
    except the bucket search touches nprobe/K (3/8) of the corpus
    instead of 1/8: recall is bought with a KNOWN linear candidate
    multiplier, which is exactly the dial (Faiss `nprobe`) a production
    deployment sweeps per corpus. Run at certification time, never per
    query. Recall arithmetic is exact integers; floats never leave the
    ORDER BY."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ivf_multiprobe_sql("spark"))


# --------------------------------------------------------------------------
# ext_embed_outlier_filter — distance-to-centroid z-score curation
# --------------------------------------------------------------------------
# Embedding-side quality filtering (the SemDeDup paper's sibling move:
# prune examples FAR from their class manifold before training): each
# vector's exact integer L2^2 to its OWN label centroid, z-scored against
# the label's distance distribution. Centroids are `ext_embed_centroids`'
# exact micro-unit integers; distance and the (n, S, SS) moments are
# exact wide integers (the stat_ab_ttest discipline), floats enter only
# in the final (d - mean)/std — bit-identical both engines.

_OUT_Z_THRESH_X100 = 200  # |z| > 2.0 flags an outlier


def _outlier_z(cast: str) -> str:
    def c(x: str) -> str:
        return f"CAST({x} AS {cast})"

    mean = f"(CAST({c('S')} AS DOUBLE) / CAST(n AS DOUBLE))"
    var = (
        f"(CAST({c('n')} * {c('SS')} - {c('S')} * {c('S')} AS DOUBLE)"
        f" / CAST({c('n')} * ({c('n')} - 1) AS DOUBLE))"
    )
    return f"((CAST(dist2 AS DOUBLE) - {mean}) / SQRT({var}))"


def _outlier_round4(expr: str) -> str:
    return (
        f"CASE WHEN ({expr}) >= 0 "
        f"THEN CAST(CAST(FLOOR(({expr}) * 10000 + 0.5) AS BIGINT) AS DOUBLE)"
        f" / 10000.0 "
        f"ELSE -(CAST(CAST(FLOOR(-(({expr})) * 10000 + 0.5) AS BIGINT)"
        f" AS DOUBLE) / 10000.0) END"
    )


@query(
    "ext_embed_outlier_filter",
    oracle=f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, label, CAST(pos - 1 AS BIGINT) AS dim, embedding[pos] AS v
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
    ),
    s AS MATERIALIZED (
      SELECT label, dim, SUM({_VI}) AS S, COUNT(*) AS n
      FROM ex GROUP BY label, dim
    ),
    cents AS MATERIALIZED (
      SELECT label, dim,
             CAST({_AVG_MICRO.format(div="//")} AS BIGINT) AS c
      FROM s
    ),
    d AS MATERIALIZED (
      SELECT e.vec_id, e.label,
             CAST(SUM(({_VI} - c.c) * ({_VI} - c.c)) AS BIGINT) AS dist2
      FROM ex e JOIN cents c ON e.label = c.label AND e.dim = c.dim
      GROUP BY e.vec_id, e.label
    ),
    m AS MATERIALIZED (
      SELECT label, COUNT(*) AS n,
             SUM(CAST(dist2 AS HUGEINT)) AS S,
             SUM(CAST(dist2 AS HUGEINT) * CAST(dist2 AS HUGEINT)) AS SS
      FROM d GROUP BY label
    )
    SELECT d.vec_id, d.label, d.dist2,
           {_outlier_round4(_outlier_z('HUGEINT'))} AS z_score,
           (ABS({_outlier_round4(_outlier_z('HUGEINT'))})
             > {_OUT_Z_THRESH_X100} / 100.0) AS is_outlier
    FROM d JOIN m ON d.label = m.label
    """,
)
def ext_embed_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector distance-to-own-centroid z-score with an |z| > 2
    outlier flag (docstring block above) — the curation pass that cuts
    mislabeled / off-manifold examples before contrastive or classifier
    training, and the quantitative companion to `ext_embed_centroids`'
    drift monitoring.

    Scale: posexplode is the zero-shuffle scan-stage expansion; the
    centroid table (labels x 64 dims) broadcasts back onto the exploded
    frame, so the distance is ONE map-combinable (vec_id)-keyed
    aggregate; the per-label moment frame is label-bounded. Two fact
    passes total (centroid build + distance), no window over the fact,
    no self-join."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "vec_id", "label", F.col("dim").cast("bigint").alias("dim"), "v"
    )
    s = ex.groupBy("label", "dim").agg(
        F.expr(f"SUM({_VI})").alias("S"), F.count(F.lit(1)).alias("n")
    )
    cents = s.select(
        "label", "dim", F.expr(_AVG_MICRO.format(div="div")).alias("c")
    )
    d = (
        ex.join(F.broadcast(cents), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.expr(f"CAST(SUM(({_VI} - c) * ({_VI} - c)) AS BIGINT)").alias(
                "dist2"
            )
        )
    )
    m = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dist2").cast("decimal(38,0)")).alias("S"),
        F.sum(
            F.col("dist2").cast("decimal(38,0)")
            * F.col("dist2").cast("decimal(38,0)")
        ).alias("SS"),
    )
    z = _outlier_round4(_outlier_z("DECIMAL(38,0)"))
    return (
        d.join(F.broadcast(m), "label")
        .select(
            "vec_id",
            "label",
            "dist2",
            F.expr(z).alias("z_score"),
            F.expr(
                f"(ABS({z}) > {_OUT_Z_THRESH_X100} / 100.0)"
            ).alias("is_outlier"),
        )
    )


# --------------------------------------------------------------------------
# ext_embed_hard_negatives — contrastive-pair mining off the IVF buckets
# --------------------------------------------------------------------------
# Training-data mining for contrastive/metric learning: the valuable
# negatives are CLOSE vectors with DIFFERENT labels. All-pairs is
# quadratic; this reuses the IVF coarse structure (same K=8 centroids as
# the ANN tier) + the SemDeDup sorted-neighborhood trick: within each
# bucket, rank by projection onto the bucket's own centroid and compare
# only pairs within window W of each other — pair budget N x W, linear.
# Pairs that survive (cross-label, within-window) rank by exact cosine;
# the global top pairs are the mined hard negatives.

_HARDNEG_W = 8
_HARDNEG_TOP = 50


def _hardneg_oracle() -> str:
    from mongodb_cdc_spark.operators.extensions import _IVF_K

    # duck-only string: MATERIALIZED on `cents` (x2), `assigned`,
    # `ranked` (x2 self-join) — oracle-OOM-class hardening.
    return f"""
    WITH cents AS MATERIALIZED (
      SELECT vec_id AS cent_id, embedding AS cent
      FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    assigned AS MATERIALIZED (
      SELECT vec_id, label, embedding, cent_id AS bucket FROM (
        SELECT e.vec_id, e.label, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dot_unrolled_sql('e.embedding', 'c.cent', dialect='duck')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) t WHERE rn = 1
    ),
    ranked AS MATERIALIZED (
      SELECT a.vec_id, a.label, a.embedding, a.bucket,
             ROW_NUMBER() OVER (PARTITION BY a.bucket
               ORDER BY {dot_unrolled_sql('a.embedding', 'c.cent', dialect='duck')} DESC,
                        a.vec_id ASC) AS rnk
      FROM assigned a JOIN cents c ON a.bucket = c.cent_id
    ),
    pairs AS MATERIALIZED (
      SELECT x.vec_id AS a_id, y.vec_id AS b_id,
             x.label AS label_a, y.label AS label_b,
             CAST(x.bucket AS BIGINT) AS bucket,
             {cosine_unrolled_sql('x.embedding', 'y.embedding', dialect='duck')} AS c
      FROM ranked x JOIN ranked y
        ON x.bucket = y.bucket
       AND y.rnk BETWEEN x.rnk + 1 AND x.rnk + {_HARDNEG_W}
      WHERE x.label <> y.label
    )
    SELECT rk, a_id, b_id, label_a, label_b, bucket,
           CAST(FLOOR(c * 1000000) AS BIGINT) AS cos_e6
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY c DESC, a_id ASC, b_id ASC) AS rk FROM pairs)
    WHERE rk <= {_HARDNEG_TOP} ORDER BY rk ASC
    """


@query("ext_embed_hard_negatives", oracle=_hardneg_oracle())
def ext_embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine the top-50 hard negative pairs (docstring block above):
    high-cosine, cross-label, found inside IVF buckets via
    centroid-projection sorted neighborhoods — never an all-pairs join.

    Scale: assignment is the shared broadcast-K map pass
    (`ivf_assignments` shape); the per-bucket rank is a bucket-keyed
    window (bucket-bounded partitions); the pair stage is a rank-banded
    self-join whose output is N x W rows by construction (the
    `ext_semantic_dedup` pair-budget argument); selection is
    TakeOrderedAndProject. Window width W and the projection count are
    the recall knobs — production reruns the mining per index version,
    exactly like the dedup tier's per-corpus W recalibration."""
    from pyspark.sql.window import Window

    from mongodb_cdc_spark.functions.vectors import cosine, dot
    from mongodb_cdc_spark.operators.extensions import _IVF_K

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cent_id",
        dot("embedding", "cent").alias("s"),
    )
    # argmax-by-(s DESC, cent_id ASC) via ONE map-combinable struct-max —
    # the ivf_assignments shape, not a row_number window over N x K rows
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("s"),
                    (-F.col("cent_id")).alias("nc"),
                    F.col("label"),
                    F.col("embedding"),
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.label").alias("label"),
            F.col("m.embedding").alias("embedding"),
            (-F.col("m.nc")).alias("bucket"),
            F.col("m.s").alias("proj"),
        )
    )
    w_rank = Window.partitionBy("bucket").orderBy(
        F.col("proj").desc(), F.col("vec_id").asc()
    )
    ranked = assigned.withColumn("rnk", F.row_number().over(w_rank))
    # rank-banded pairs via the _sem_window_pairs BLOCK join (each left
    # row carries its block id and its successor's; the join is fully
    # equi-keyed on (bucket, blk)) — the naive bucket-only join measured
    # 12x time for 10x data at the 100x rehearsal (each bucket degraded
    # to a filtered cartesian); this form is N x W by construction
    x = ranked.select(
        F.col("bucket"),
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("ea"),
        F.col("rnk").alias("ra"),
    )
    xexp = x.withColumn(
        "blk", F.expr(f"ra div {_HARDNEG_W}")
    ).unionByName(
        x.withColumn("blk", F.expr(f"ra div {_HARDNEG_W} + 1"))
    )
    y = ranked.select(
        F.col("bucket").alias("bucket_y"),
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("eb"),
        F.col("rnk").alias("rb"),
        F.expr(f"(rnk - 1) div {_HARDNEG_W}").alias("yblk"),
    )
    pairs = (
        xexp.join(
            y,
            (xexp.bucket == y.bucket_y)
            & (F.col("blk") == F.col("yblk"))
            & (F.col("rb") > F.col("ra"))
            & (F.col("rb") <= F.col("ra") + _HARDNEG_W),
        )
        .filter(F.col("label_a") != F.col("label_b"))
        .select(
            "a_id", "b_id", "label_a", "label_b",
            F.col("bucket").cast("bigint").alias("bucket"),
            cosine("ea", "eb").alias("c"),
        )
    )
    top = pairs.orderBy(
        F.col("c").desc(), F.col("a_id").asc(), F.col("b_id").asc()
    ).limit(_HARDNEG_TOP)
    w_out = Window.partitionBy(F.lit(1)).orderBy(
        F.col("c").desc(), F.col("a_id").asc(), F.col("b_id").asc()
    )
    return top.select(
        F.row_number().over(w_out).alias("rk"),
        "a_id", "b_id", "label_a", "label_b", "bucket",
        F.floor(F.col("c") * 1000000).cast("bigint").alias("cos_e6"),
    ).orderBy("rk")


# --------------------------------------------------------------------------
# maintenance_pq_refresh — wave algebra for the packed-code store
# --------------------------------------------------------------------------


@query(
    "maintenance_pq_refresh",
    oracle="""
    WITH cut AS (SELECT (MAX(vec_id) * 9) // 10 AS c FROM embeddings)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_codes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
            WHERE vec_id > (SELECT c FROM cut)) AS n_wave,
           CAST(0 AS BIGINT) AS merge_mismatches
    """,
)
def maintenance_pq_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh for the PQ code store, verified against the
    persisted build: encode ONLY the ingest wave (top-decile vec_ids,
    the shared wave stand-in) against the store's literal codebook and
    FIXED centroid version, union with the base encoding, and prove
    merged == persisted row-for-row (``merge_mismatches`` counts
    full-outer-join rows where the packed word or bucket differs — 0 is
    hash-checked).

    The wave algebra here is even stronger than the IVF store's
    (`maintenance_ivf_refresh`): codes are per-vector independent given
    the codebook, and the codebook is LITERAL constants pinned in the
    store's version key (..._m{M}k4_v2) — so refresh is exactly
    additive, and codebook re-training is by construction a new store
    version, never an in-place mutation.

    Scale: steady-state cost is wave-sized encode (one codegen map
    pass) + per-bucket append; nothing shuffles the base."""
    from mongodb_cdc_spark.operators.extensions import (
        _IVF_K,
        ivf_assignments,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cutoff = int(
        e.agg(F.expr("(MAX(vec_id) * 9) div 10").alias("c")).first()["c"]
    )  # bounded 1-row scalar
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )

    def encode(part: DataFrame) -> DataFrame:
        assigned = ivf_assignments(part, cents=cents)
        dists = assigned.selectExpr(
            "vec_id",
            "bucket",
            *[
                f"{_pq2_dist(m, k, 'spark')} AS d{m}_{k}"
                for m in range(_PQ2_M)
                for k in range(4)
            ],
        )
        return dists.selectExpr(
            "vec_id", "bucket", f"CAST({_pq2_packed()} AS BIGINT) AS packed"
        )

    base = encode(e.filter(F.col("vec_id") <= cutoff))
    wave = encode(e.filter(F.col("vec_id") > cutoff))
    # Round 12 (guide §5 / §3.3 "materialise an intermediate to truncate
    # the plan"): the three output aggregates each re-planned the encode
    # chain (22 parquet scans in the before plan, and the giant unrolled
    # PQ-distance projection is big enough that whole-stage codegen FAILS
    # janino compilation and falls back to interpreted eval — paying the
    # failed compile per duplicated arm). Materialize the merged encoding
    # ONCE (narrow: vec_id, bucket, packed) and derive every aggregate
    # from it: encode runs once, the codegen fallback is paid once.
    # n_wave counts merged rows above the cutoff — identical to
    # count(wave) since encode is a 1:1 projection of its input slice.
    merged = base.unionByName(wave).localCheckpoint(eager=True)
    store = spark.read.parquet(pq_store_path(spark, sf_dir)).select(
        "vec_id",
        F.col("bucket").alias("sbucket"),
        F.col("packed").alias("spacked"),
    )
    joined = merged.join(store, "vec_id", "full_outer")
    checks = joined.agg(
        F.sum(
            F.when(
                ~F.col("bucket").eqNullSafe(F.col("sbucket"))
                | ~F.col("packed").eqNullSafe(F.col("spacked")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("merge_mismatches")
    )
    return (
        merged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_codes"),
            F.coalesce(
                F.sum(F.when(F.col("vec_id") > cutoff, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_wave"),
        )
        .crossJoin(checks)
        .select("n_codes", "n_wave", "merge_mismatches")
    )


# --------------------------------------------------------------------------
# ext_embed_quantize_int8 — per-dimension symmetric int8 quantization of
# the embedding corpus, with an exact reconstruction-error audit
# --------------------------------------------------------------------------
# The storage-side companion to the PQ tier: int8 embeddings are the
# standard 4x-compression serving format (Faiss SQ8 / vector-DB int8).
# Everything is exact integer arithmetic so the audit hashes:
#
# * values enter as e6 fixed-point (exact float32 -> double -> floor);
# * the per-dim scale is M_d = max(|v_e6|) over the corpus (an integer
#   max — order-free, engine-independent);
# * code   = ((v_e6 + M_d) * 127) div M_d - 127   in [-127, 127]
#   (the +M_d shift keeps the numerator nonnegative, so Spark's
#   trunc-div and DuckDB's floor-div agree — the ts_theil_sen trick);
# * recon  = ((code + 127) * M_d) div 127 - M_d   (same shift back);
# * the audit emits per-dim n, M_d, total/max |v_e6 - recon| — the
#   quantization-error contract a serving stack certifies before
#   swapping the fp32 column out.

_SQ8_LEVELS = 127


def _sq8_oracle() -> str:
    L = _SQ8_LEVELS
    return f"""
    WITH ex AS MATERIALIZED (
      SELECT CAST(pos - 1 AS BIGINT) AS dim,
             CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * 1000000) AS BIGINT)
               AS v
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
    ),
    scale AS MATERIALIZED (
      SELECT dim, CAST(MAX(ABS(v)) AS BIGINT) AS m FROM ex GROUP BY dim
    ),
    codes AS MATERIALIZED (
      SELECT e.dim, e.v, s.m,
             ((e.v + s.m) * {L}) // s.m - {L} AS code
      FROM ex e JOIN scale s ON e.dim = s.dim
    ),
    recon AS MATERIALIZED (
      SELECT dim, v, m, code,
             ((code + {L}) * m) // {L} - m AS r
      FROM codes
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(m) AS BIGINT) AS scale_e6,
           CAST(MIN(code) AS BIGINT) AS min_code,
           CAST(MAX(code) AS BIGINT) AS max_code,
           CAST(SUM(ABS(v - r)) AS BIGINT) AS total_abs_err_e6,
           CAST(MAX(ABS(v - r)) AS BIGINT) AS max_abs_err_e6
    FROM recon
    GROUP BY dim
    ORDER BY dim
    """


@query("ext_embed_quantize_int8", oracle=_sq8_oracle())
def ext_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dim int8 quantization audit (tier block above):
    64 rows of exact integers — scale, code range, total and max
    reconstruction error per dimension — hash-checked against DuckDB's
    from-scratch requantization. A drifted scale, a wrong shift, or a
    single mis-rounded code breaks the hash; max_code/min_code landing
    outside [-127, 127] is visible in the hashed values themselves.

    Scale: posexplode is the zero-shuffle scan-stage expansion
    (`ext_embed_outlier_filter` shape); the scale table (64 rows)
    broadcasts back onto the exploded frame, so quantize + audit is ONE
    map-combinable dim-keyed aggregate over the fact — two fact passes
    total, no window, no self-join. The production writer emits the
    code column in the same pass it audits."""
    L = _SQ8_LEVELS
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.floor(F.col("val").cast("double") * 1000000)
        .cast("bigint")
        .alias("v"),
    )
    scale = ex.groupBy("dim").agg(
        F.max(F.abs(F.col("v"))).cast("bigint").alias("m")
    )
    codes = ex.join(F.broadcast(scale), "dim").selectExpr(
        "dim",
        "v",
        "m",
        f"((v + m) * {L}) div m - {L} AS code",
    )
    recon = codes.selectExpr(
        "dim", "v", "m", "code", f"((code + {L}) * m) div {L} - m AS r"
    )
    return (
        recon.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("m").cast("bigint").alias("scale_e6"),
            F.min("code").cast("bigint").alias("min_code"),
            F.max("code").cast("bigint").alias("max_code"),
            F.sum(F.abs(F.col("v") - F.col("r")))
            .cast("bigint")
            .alias("total_abs_err_e6"),
            F.max(F.abs(F.col("v") - F.col("r")))
            .cast("bigint")
            .alias("max_abs_err_e6"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# ext_embed_matryoshka_eval — prefix-dimension retrieval-quality eval
# (Matryoshka representation learning serving question: how much of the
# full-dimension ranking survives if ANN serves on the first D' dims?)
# --------------------------------------------------------------------------
# For a panel of probe vectors, rank the corpus by exact cosine twice —
# full 64 dims and the 16-dim prefix — and certify the agreement:
# overlap@10, overlap@20, and the exact sum of |rank_full - rank_prefix|
# over the top-20 intersection. These are the numbers that decide
# whether the serving tier can quantize to prefix dims (4x memory/IO
# cut on every IVF/PQ store) before paying for a rerank stage.

_MAT_PROBES = (0, 1, 2, 3)
_MAT_PREFIX_DIM = 16
_MAT_K = 20


def _matryoshka_sql(dialect: str) -> str:
    from mongodb_cdc_spark.functions.vectors import cosine_unrolled_sql

    if dialect == "spark":
        probes = "SELECT * FROM VALUES {} AS t(pid)".format(
            ", ".join(f"({p})" for p in _MAT_PROBES)
        )
    else:
        probes = "SELECT * FROM (VALUES {}) t(pid)".format(
            ", ".join(f"({p})" for p in _MAT_PROBES)
        )
    mat = "MATERIALIZED " if dialect == "duck" else ""
    cos_full = cosine_unrolled_sql("e.embedding", "pv.p", dialect=dialect)
    cos_pre = cosine_unrolled_sql(
        "e.embedding", "pv.p", dim=_MAT_PREFIX_DIM, dialect=dialect
    )

    def ranked(cos: str, name: str) -> str:
        return f"""
    {name} AS {mat}(
      SELECT pid, doc_id, rk FROM (
        SELECT pv.pid, e.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY pv.pid
                 ORDER BY {cos} DESC, e.vec_id ASC) AS rk
        FROM embeddings e CROSS JOIN pvec pv
        WHERE e.vec_id <> pv.pid
      ) r WHERE rk <= {_MAT_K}
    )"""

    return f"""
    WITH probes AS {mat}({probes}),
    pvec AS {mat}(
      SELECT p.pid, e.embedding AS p
      FROM embeddings e JOIN probes p ON e.vec_id = p.pid
    ),{ranked(cos_full, 'full_rank')},{ranked(cos_pre, 'pre_rank')},
    j AS {mat}(
      SELECT COALESCE(f.pid, q.pid) AS pid,
             f.rk AS frk, q.rk AS prk
      FROM full_rank f
      FULL OUTER JOIN pre_rank q
        ON f.pid = q.pid AND f.doc_id = q.doc_id
    )
    SELECT CAST(pid AS BIGINT) AS probe_id,
           CAST(SUM(CASE WHEN frk <= 10 AND prk <= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_10,
           CAST(SUM(CASE WHEN frk IS NOT NULL AND prk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_20,
           CAST(COALESCE(SUM(CASE WHEN frk IS NOT NULL AND prk IS NOT NULL
                         THEN ABS(frk - prk) END), 0) AS BIGINT)
             AS rank_drift_sum
    FROM j
    GROUP BY pid
    ORDER BY probe_id ASC
    """


@query("ext_embed_matryoshka_eval", oracle=_matryoshka_sql("duck"))
def ext_embed_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension ranking agreement per probe (tier block above):
    top-20 by full-dim exact cosine vs top-20 by
    16-dim prefix cosine, certified as overlap@10,
    overlap@20, and the exact rank-drift sum over the intersection —
    hash-checked end-to-end (one cosine bit on either ranking moves a
    rank and breaks the hash).

    Scale: each ranking is one corpus scan with the probe panel
    broadcast (TakeOrdered per probe, never a global sort); the prefix
    pass reads the same rows but arithmetically touches only
    16 components — on a columnar fixed-width layout
    (the PQ/int8 stores this repo maintains) that is a real 4x I/O cut,
    which is exactly the trade this eval certifies before a deployment
    flips ANN serving to prefix dims."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_matryoshka_sql("spark"))
