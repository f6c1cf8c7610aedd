"""Bloom-filter membership tier: constant-memory dedup gating.

Every other dedup state family in the engine (URL seen-set, md5 hash
store, MinHash band store, pHash sig store, semantic rank store) grows
linearly with the corpus — at 100 TB each is a distributed table the
gate must JOIN against. A Bloom filter is the one membership structure
whose memory is FIXED at build time: m bits sized once for the target
item count, packed into m/32 int64-held words, broadcastable to every
executor at any corpus scale (m = 2^33 bits is a 1 GiB bitmap holding
~600 M items at 1 % FP with k = 4). The price is a measured,
tunable false-positive rate and no deletion — exactly the trade
Dolma-style pipelines take for paragraph/document dedup.

Geometry shared by every key in the tier (gate, store, refresh,
stream MUST agree, like the decontamination tier's 24/8 grams):

* item key    = md5(text) — content fingerprint, 32 hex chars;
* k = 4 positions = disjoint 4-hex slices [1..4],[5..8],[9..12],
  [13..16] of that md5, each cast to a 16-bit int and taken mod m
  (m is a power of two <= 2^16, so the mod is exactly uniform);
* packing     = word_idx = pos >> 5, mask bit = pos & 31 — 32 bits
  per BIGINT-held word, so masks stay positive and shift/OR algebra
  is identical in Spark and DuckDB.

Replay safety comes from the algebra itself: bitwise OR is
associative, commutative, and IDEMPOTENT, so re-applying a batch's
bits cannot change the bitmap — the only state family in the engine
whose exactly-once story needs no dedup of the state feed at all.

Cited parity: the reference (a CDC replicator, mongodb-cdc-program.js)
has no text/dedup tier — SURVEY.md §2A marks the whole curation
surface "explicitly absent"; this tier extends the engine's
LLM-pipeline scope per the build contract, with the reference's
resume-state discipline (js:93-117) applied to the streaming arm.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import new_stage, publish_store
from mongodb_cdc_spark.registry import query

# The two arms of the eval key: a well-sized filter (2^16 bits — FP
# near zero at fixture scale) and a deliberately tight one (2^11 bits —
# saturates as the corpus grows, making the sizing failure mode a
# MEASURED, hash-pinned number instead of a doc caveat).
_BLOOM_M_WIDE = 65536
_BLOOM_M_TIGHT = 2048
_BLOOM_K = 4

_CUT_SQL = "(MAX(doc_id) * 9) // 10"  # DuckDB; Spark uses `div`


def _positions_spark(m: int) -> F.Column:
    """Array of the k = 4 bloom positions of md5(text) for modulus m."""
    h = F.md5(F.col("text"))
    return F.array(
        *[
            (
                F.conv(F.substring(h, 1 + 4 * i, 4), 16, 10).cast("long")
                % F.lit(m)
            )
            for i in range(_BLOOM_K)
        ]
    )


def _positions_sql(m: int, text: str = "text") -> str:
    """DuckDB list of the same k positions (same slices, same mod)."""
    parts = ", ".join(
        f"(CAST(('0x' || substring(md5({text}), {1 + 4 * i}, 4)) AS BIGINT)"
        f" % {m})"
        for i in range(_BLOOM_K)
    )
    return f"[{parts}]"


_EXT_DEDUP_BLOOM_ORACLE = f"""
WITH cut AS MATERIALIZED (
  SELECT {_CUT_SQL} AS c FROM documents
),
arms AS (SELECT * FROM (VALUES ({_BLOOM_M_WIDE}), ({_BLOOM_M_TIGHT})) t(m)),
pos AS MATERIALIZED (
  SELECT a.m, d.doc_id, d.source,
         (d.doc_id <= (SELECT c FROM cut)) AS is_base,
         u.pos
  FROM documents d
  CROSS JOIN arms a
  CROSS JOIN UNNEST(
    CASE WHEN a.m = {_BLOOM_M_WIDE}
         THEN {_positions_sql(_BLOOM_M_WIDE, "d.text")}
         ELSE {_positions_sql(_BLOOM_M_TIGHT, "d.text")} END
  ) AS u(pos)
),
base_bits AS MATERIALIZED (
  SELECT DISTINCT m, pos FROM pos WHERE is_base
),
base_md5 AS MATERIALIZED (
  SELECT DISTINCT md5(text) AS h FROM documents
  WHERE doc_id <= (SELECT c FROM cut)
),
probe AS MATERIALIZED (
  SELECT p.m, p.doc_id, p.source,
         COUNT(DISTINCT p.pos) AS n_pos,
         COUNT(DISTINCT CASE WHEN b.pos IS NOT NULL THEN p.pos END)
           AS n_hit
  FROM pos p
  LEFT JOIN base_bits b ON b.m = p.m AND b.pos = p.pos
  WHERE NOT p.is_base
  GROUP BY p.m, p.doc_id, p.source
),
verdict AS (
  SELECT pr.m, pr.doc_id, pr.source,
         (pr.n_hit = pr.n_pos) AS flagged,
         (md5(d.text) IN (SELECT h FROM base_md5)) AS exact_dup
  FROM probe pr JOIN documents d ON d.doc_id = pr.doc_id
),
fills AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS bits_set
  FROM base_bits GROUP BY m
)
SELECT v.m, v.source,
       CAST(COUNT(*) AS BIGINT) AS probed,
       CAST(SUM(CASE WHEN v.flagged THEN 1 ELSE 0 END) AS BIGINT)
         AS bloom_flagged,
       CAST(SUM(CASE WHEN v.exact_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS exact_dups,
       CAST(SUM(CASE WHEN v.flagged AND NOT v.exact_dup THEN 1 ELSE 0 END)
            AS BIGINT) AS false_pos,
       f.bits_set
FROM verdict v JOIN fills f ON f.m = v.m
GROUP BY v.m, v.source, f.bits_set
ORDER BY v.m ASC, v.source ASC
"""


@query("ext_dedup_bloom", oracle=_EXT_DEDUP_BLOOM_ORACLE)
def ext_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gate the wave split (doc_id > 90th-percentile cut) against
    a filter built from the base split, at BOTH arm sizes, and account
    for every outcome: per (m, source) — probes, bloom hits, EXACT
    duplicates (the md5 ground truth), and false positives (bloom hit,
    no exact dup), plus the arm's fill (distinct bits set by the base).
    The FP column turns the filter-sizing trade into a hash-pinned
    measurement: the tight 2^11 arm visibly saturates as the corpus
    grows while the 2^16 arm stays near-exact — same data, same hash
    family, only m differs.

    Plan: positions are a pure codegen map (md5 + 3 slices per arm,
    exploded); the base bit set is one distinct aggregate on (m, pos)
    keys; the probe is ONE left join on those narrow keys followed by a
    per-doc count — nothing corpus-quadratic, no Python. Scale: the
    distinct (m, pos) set is bounded by 2 * m rows (here <= 132 k)
    REGARDLESS of corpus size — at 100 TB this side broadcasts while
    every linear seen-store join shuffles; that boundedness is the
    entire point of the tier."""
    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])

    def arm(m: int) -> DataFrame:
        return d.select(
            F.lit(m).cast("int").alias("m"),
            "doc_id",
            "source",
            (F.col("doc_id") <= cut).alias("is_base"),
            F.explode(_positions_spark(m)).alias("pos"),
        )

    pos = arm(_BLOOM_M_WIDE).unionByName(arm(_BLOOM_M_TIGHT))
    base_bits = (
        pos.filter("is_base").select("m", "pos").distinct()
    )
    base_md5 = (
        d.filter(F.col("doc_id") <= cut)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    probe = (
        pos.filter(~F.col("is_base"))
        .join(
            F.broadcast(base_bits.withColumn("hit", F.lit(1))),
            ["m", "pos"],
            "left",
        )
        .groupBy("m", "doc_id", "source")
        .agg(
            F.countDistinct("pos").alias("n_pos"),
            F.countDistinct(
                F.when(F.col("hit").isNotNull(), F.col("pos"))
            ).alias("n_hit"),
        )
    )
    verdict = (
        probe.join(
            d.select("doc_id", F.md5("text").alias("h")), "doc_id"
        )
        .join(
            F.broadcast(base_md5.withColumn("xd", F.lit(1))), "h", "left"
        )
        .select(
            "m",
            "source",
            (F.col("n_hit") == F.col("n_pos")).alias("flagged"),
            F.col("xd").isNotNull().alias("exact_dup"),
        )
    )
    fills = base_bits.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("bits_set")
    )
    return (
        verdict.groupBy("m", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("probed"),
            F.sum(F.col("flagged").cast("int"))
            .cast("bigint")
            .alias("bloom_flagged"),
            F.sum(F.col("exact_dup").cast("int"))
            .cast("bigint")
            .alias("exact_dups"),
            F.sum((F.col("flagged") & ~F.col("exact_dup")).cast("int"))
            .cast("bigint")
            .alias("false_pos"),
        )
        .join(F.broadcast(fills), "m")
        .select(
            "m",
            "source",
            "probed",
            "bloom_flagged",
            "exact_dups",
            "false_pos",
            "bits_set",
        )
        .orderBy("m", "source")
    )


def bloom_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, stage-then-rename) the packed base-split bloom
    store at m = 2^16: one row per NON-ZERO 32-bit word —
    (word BIGINT, mask BIGINT), mask = OR of (1 << (pos & 31)) over
    base positions in the word. <= m/32 rows by construction; the
    artifact a standing ingest broadcasts."""
    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"bloom_{sf_name}_v1")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        d = load_table(spark, sf_dir, "documents")
        cut = int(
            d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0]
        )
        words = _pack_words(
            d.filter(F.col("doc_id") <= cut).select(
                F.explode(_positions_spark(_BLOOM_M_WIDE)).alias("pos")
            )
        )
        stage = new_stage(path)
        words.write.mode("overwrite").parquet(stage)
        publish_store(stage, path)
    return path


def _pack_words(pos_df: DataFrame) -> DataFrame:
    """(pos) rows -> packed (word, mask) rows via one bit_or aggregate.
    SQL-expression shifts: the function-form shiftleft only takes a
    literal shift amount, the expression form takes a column."""
    return (
        pos_df.select(
            F.shiftright("pos", 5).cast("bigint").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )


_PACK_WORDS_SQL = """
  SELECT (pos >> 5) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS mask
  FROM {src} GROUP BY (pos >> 5)
"""


_BLOOM_STORE_ORACLE = f"""
WITH cut AS MATERIALIZED (
  SELECT {_CUT_SQL} AS c FROM documents
),
pos AS MATERIALIZED (
  SELECT DISTINCT u.pos
  FROM documents d
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "d.text")}) AS u(pos)
  WHERE d.doc_id <= (SELECT c FROM cut)
),
words AS MATERIALIZED ({_PACK_WORDS_SQL.format(src="pos")})
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM words) AS n_words,
  (SELECT CAST(SUM(bit_count(mask)) AS BIGINT) FROM words) AS bits_set,
  (SELECT CAST(SUM(word * 4294967296 + mask) AS BIGINT) FROM words)
    AS words_checksum,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
   WHERE doc_id <= (SELECT c FROM cut)) AS n_items
"""


@query("maintenance_bloom_store", oracle=_BLOOM_STORE_ORACLE)
def maintenance_bloom_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persist the packed base-split bloom store (`bloom_store_path`)
    and read back a full-bitmap audit hash-checked against DuckDB's
    from-scratch pack: non-zero word count, total bits set (popcount),
    an exact word*2^32+mask SUM checksum — one flipped bit anywhere in
    the bitmap breaks it — and the inserted item count. Scale: the
    audit reads <= m/32 store rows; corpus text is read once at
    build."""
    store = spark.read.parquet(bloom_store_path(spark, sf_dir))
    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    audit = store.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.bit_count("mask")).cast("bigint").alias("bits_set"),
        F.sum(
            F.col("word") * F.lit(4294967296).cast("bigint")
            + F.col("mask")
        )
        .cast("bigint")
        .alias("words_checksum"),
    )
    items = d.filter(F.col("doc_id") <= cut).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items")
    )
    return audit.crossJoin(F.broadcast(items)).select(
        "n_words", "bits_set", "words_checksum", "n_items"
    )


_BLOOM_REFRESH_ORACLE = f"""
WITH cut AS MATERIALIZED (
  SELECT {_CUT_SQL} AS c FROM documents
),
base_pos AS MATERIALIZED (
  SELECT DISTINCT u.pos
  FROM documents d
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "d.text")}) AS u(pos)
  WHERE d.doc_id <= (SELECT c FROM cut)
),
wave_pos AS MATERIALIZED (
  SELECT DISTINCT u.pos
  FROM documents d
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "d.text")}) AS u(pos)
  WHERE d.doc_id > (SELECT c FROM cut)
),
base_w AS MATERIALIZED ({_PACK_WORDS_SQL.format(src="base_pos")}),
wave_w AS MATERIALIZED ({_PACK_WORDS_SQL.format(src="wave_pos")}),
merged AS MATERIALIZED (
  SELECT COALESCE(b.word, w.word) AS word,
         (COALESCE(b.mask, 0) | COALESCE(w.mask, 0)) AS mask
  FROM base_w b FULL OUTER JOIN wave_w w ON b.word = w.word
),
all_pos AS MATERIALIZED (
  SELECT DISTINCT u.pos
  FROM documents d
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "d.text")}) AS u(pos)
),
full_w AS MATERIALIZED ({_PACK_WORDS_SQL.format(src="all_pos")})
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM base_w) AS n_base_words,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM wave_w) AS n_wave_words,
  (SELECT CAST(SUM(bit_count(mask)) AS BIGINT) FROM merged)
    AS merged_bits,
  CAST(0 AS BIGINT) AS merge_mismatches
"""


@query("maintenance_bloom_refresh", oracle=_BLOOM_REFRESH_ORACLE)
def maintenance_bloom_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental bloom refresh, verified against the full rebuild:
    the wave split's bits OR-fold into the base words per word
    (full-outer + coalesce | — the fold algebra), and the merged bitmap
    must equal the from-scratch pack of ALL documents word for word;
    ``merge_mismatches`` is a REAL full-outer (word, mask) mismatch
    count, hash-checked at 0. OR's idempotence means a re-applied wave
    is a no-op — the refresh needs no applied-wave bookkeeping at all,
    unlike every linear state family. Scale: steady-state refresh
    hashes NEW text only; both join sides are <= m/32 rows."""
    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    pos_of = lambda df: df.select(  # noqa: E731
        F.explode(_positions_spark(_BLOOM_M_WIDE)).alias("pos")
    )
    base_w = _pack_words(pos_of(d.filter(F.col("doc_id") <= cut)))
    wave_w = _pack_words(pos_of(d.filter(F.col("doc_id") > cut)))
    merged = (
        base_w.withColumnRenamed("mask", "bm")
        .join(wave_w.withColumnRenamed("mask", "wm"), "word", "full_outer")
        .select(
            "word",
            (
                F.coalesce("bm", F.lit(0)).bitwiseOR(
                    F.coalesce("wm", F.lit(0))
                )
            ).alias("mask"),
        )
    )
    full_w = _pack_words(pos_of(d))
    mism = (
        merged.join(
            full_w.withColumnRenamed("mask", "fm"), "word", "full_outer"
        )
        .filter(
            F.col("mask").isNull()
            | F.col("fm").isNull()
            | (F.col("mask") != F.col("fm"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("merge_mismatches"))
    )
    return (
        base_w.agg(F.count(F.lit(1)).cast("bigint").alias("n_base_words"))
        .crossJoin(
            F.broadcast(
                wave_w.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_wave_words")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                merged.agg(
                    F.sum(F.bit_count("mask"))
                    .cast("bigint")
                    .alias("merged_bits")
                )
            )
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "n_base_words", "n_wave_words", "merged_bits",
            "merge_mismatches",
        )
    )


def bloom_gate_batch_applier(store_path: str, target: str, state: str):
    """The bloom gate's per-micro-batch function, module-level so the
    restart/replay contract is directly testable (the
    `url_gate_batch_applier` discipline): probe the batch's positions
    against the persisted base bitmap ∪ STRICTLY-earlier committed
    batch bits ∪ same-batch smaller-doc_id bits, emit verdicts, commit
    the batch's packed bits — both writes idempotent per-batch
    overwrites, and the state commit is additionally idempotent by
    OR-algebra even if a replay raced a partial write to visibility."""
    from mongodb_cdc_spark.operators.curation import (
        fold_state_paths,
        maybe_fold_state,
    )

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        # the batch frame lives in the micro-batch session clone; run
        # state reads there
        s = bdf.sparkSession
        maybe_fold_state(s, state, batch_id)
        pos = bdf.select(
            "doc_id", F.explode(_positions_spark(_BLOOM_M_WIDE)).alias("pos")
        ).localCheckpoint(eager=True)
        prior_w = s.read.parquet(store_path)
        earlier = fold_state_paths(state, batch_id)
        if earlier:
            prior_w = (
                prior_w.unionByName(s.read.parquet(*earlier))
                .groupBy("word")
                .agg(F.bit_or("mask").alias("mask"))
            )
        prior_hit = (
            pos.join(
                F.broadcast(prior_w),
                F.shiftright("pos", 5).cast("bigint") == F.col("word"),
                "left",
            )
            .select(
                "doc_id",
                "pos",
                F.expr(
                    "(shiftright(mask, CAST(pos % 32 AS INT)) & 1) = 1"
                ).alias("hit"),
            )
        )
        same_batch = (
            pos.alias("p")
            .join(
                pos.alias("q"),
                (F.col("q.pos") == F.col("p.pos"))
                & (F.col("q.doc_id") < F.col("p.doc_id")),
                "left_semi",
            )
            .select("doc_id", "pos", F.lit(True).alias("hit"))
        )
        verdict = (
            prior_hit.filter(F.col("hit"))
            .unionByName(same_batch)
            .select("doc_id", "pos")
            .distinct()
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        n_pos = (
            pos.select("doc_id", "pos")
            .distinct()
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_pos"))
        )
        from mongodb_cdc_spark.operators._util import run_parallel

        # verdict write and state-bits commit are independent
        # projections of the checkpointed positions — overlap them
        # (guide §2.6); replay semantics unchanged
        def t_verdict():
            (
                n_pos.join(verdict, "doc_id", "left")
                .select(
                    "doc_id",
                    (
                        F.coalesce("n_hit", F.lit(0)) == F.col("n_pos")
                    ).alias("bloom_flagged"),
                )
                .write.mode("overwrite")
                .parquet(f"{target}/batch={batch_id}")
            )

        def t_bits():
            _pack_words(pos.select("pos")).write.mode("overwrite").parquet(
                f"{state}/batch={batch_id}"
            )

        run_parallel(t_verdict, t_bits)

    return apply_batch


_STREAM_BLOOM_ORACLE = f"""
WITH cut AS MATERIALIZED (
  SELECT {_CUT_SQL} AS c FROM documents
),
span AS MATERIALIZED (
  SELECT (MAX(doc_id) - (SELECT c FROM cut) + 4) // 4 AS s FROM documents
),
wave AS MATERIALIZED (
  SELECT doc_id, text,
         (doc_id - (SELECT c FROM cut) - 1) // (SELECT s FROM span)
           AS batch
  FROM documents WHERE doc_id > (SELECT c FROM cut)
),
base_pos AS MATERIALIZED (
  SELECT DISTINCT u.pos
  FROM documents d
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "d.text")}) AS u(pos)
  WHERE d.doc_id <= (SELECT c FROM cut)
),
wave_pos AS MATERIALIZED (
  SELECT w.doc_id, w.batch, u.pos
  FROM wave w
  CROSS JOIN UNNEST({_positions_sql(_BLOOM_M_WIDE, "w.text")}) AS u(pos)
),
hits AS MATERIALIZED (
  SELECT p.doc_id,
         COUNT(DISTINCT p.pos) AS n_pos,
         COUNT(DISTINCT CASE WHEN
             p.pos IN (SELECT pos FROM base_pos)
             OR EXISTS (
               SELECT 1 FROM wave_pos q
               WHERE q.pos = p.pos
                 AND (q.batch < p.batch
                      OR (q.batch = p.batch AND q.doc_id < p.doc_id))
             )
           THEN p.pos END) AS n_hit
  FROM wave_pos p
  GROUP BY p.doc_id
)
SELECT w.doc_id, (h.n_hit = h.n_pos) AS bloom_flagged
FROM wave w JOIN hits h ON h.doc_id = w.doc_id
ORDER BY w.doc_id ASC
"""


@query("stream_bloom_dedup_ingest", oracle=_STREAM_BLOOM_ORACLE)
def stream_bloom_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bloom ingest gate — the SEQUENTIAL semantics of a
    standing bloom dedup: drain the doc_id-ordered wave feed through
    foreachBatch; a document is flagged iff ALL its k positions were
    already set when it arrived — by the base-split store, by an
    earlier batch, or by a smaller-doc_id document of the SAME batch
    (the in-batch arm: within a micro-batch the gate processes docs in
    doc_id order, so a doc's bits count against its same-batch
    successors exactly as an earlier batch's would). Hash-checked
    against DuckDB's from-scratch sequential recomputation under the
    deterministic batch assignment (batch is a pure function of doc_id,
    see the wave-feed builder).

    State discipline: each batch commits its position set packed to
    (word, mask) under ``state/batch=N`` (idempotent overwrite); reads
    take the base store plus STRICTLY-earlier commits — the r9 replay
    lesson. OR's idempotence adds a second, algebraic safety net: even
    a replayed commit re-ORs identical bits. Scale: per batch, one
    codegen md5+slice pass over batch text, one join against <= m/32
    packed words + earlier-batch bits, one same-batch self-join on
    narrow (pos) keys bounded by batch size; the base side is the
    broadcastable fixed-size bitmap — zero base text read per wave."""
    from mongodb_cdc_spark.operators.curation import _url_wave_feed
    from mongodb_cdc_spark.streaming.pipeline import (
        new_scratch_dir,
        run_supervised,
    )

    d = load_table(spark, sf_dir, "documents")
    cut = int(d.agg(F.expr("(MAX(doc_id) * 9) div 10")).collect()[0][0])
    feed = _url_wave_feed(spark, sf_dir, cut)
    wave_schema = d.schema
    target = new_scratch_dir("bloomgate_target")
    state = new_scratch_dir("bloomgate_state")
    apply_batch = bloom_gate_batch_applier(
        bloom_store_path(spark, sf_dir), target, state
    )

    def start_query():
        stream = (
            spark.readStream.schema(wave_schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "wave_*.parquet")
            .parquet(feed)
        )
        return (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", new_scratch_dir("bloomgate_ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    run_supervised(start_query, max_restarts=2, restart_delay_s=1.0)
    return (
        spark.read.parquet(target)
        .select("doc_id", "bloom_flagged")
        .orderBy("doc_id")
    )
