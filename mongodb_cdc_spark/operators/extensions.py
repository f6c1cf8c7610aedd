"""North-star LLM-data-pipeline operators (SURVEY.md §2B "North-star
extensions" + the training-data operations a 100 TB corpus pipeline
needs): text analysis, exact/near deduplication, similarity search,
multimodal join.

Scale design notes:

* Text ops are pure codegen expressions over the scan — they add no
  shuffle at all.
* Exact dedup groups on a 128-bit content hash: the shuffle carries
  (hash, doc_id), never the text payload.
* MinHash/SimHash near-dup generate candidate PAIRS via band-bucket
  equi-joins — the classic LSH trick that turns an O(n²) all-pairs
  problem into |buckets| keyed joins. Hot buckets (boilerplate shingles)
  are the skew risk; AQE skew-join splitting handles moderate cases, and
  band hashes can be salted if a bucket degenerates.
* Brute-force cosine top-k broadcasts the probe (one row) — the scan
  stays embarrassingly parallel, TakeOrderedAndProject keeps per-partition
  heaps. The IVF variant is the scale path: cluster-assign once, then
  search only the probe's bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_cdc_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    fingerprint_sql,
    marker_hits,
    marker_hits_sql,
    normalized,
    normalized_sql,
    tokens,
    tokens_sql,
)
from mongodb_cdc_spark.functions.vectors import cosine, cosine_unrolled_sql, dot
from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import avg2, avg2_sql, round2_sql
from mongodb_cdc_spark.registry import query

# ---------------------------------------------------------------- text ----


@query(
    "ext_text_wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest({tokens_sql('text')}) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 50
    """,
)
def ext_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-50 words (count DESC, word ASC — total order, so the
    limit set is deterministic). explode(tokens) partial-aggregates
    map-side; only (word, count) pairs shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(50)
    )


@query(
    "ext_text_lang_stats",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           {avg2_sql('n_chars', 'avg_chars')[1]}
    FROM documents
    GROUP BY lang
    """,
)
def ext_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts + mean length."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), avg2("n_chars", "avg_chars")
    )


def _langid_pred() -> F.Column:
    """argmax over per-language marker scores; deterministic tie-break by
    language code order; no hits at all -> 'und'."""
    scored = None
    for lang in sorted(LANG_MARKERS):
        s = marker_hits(lang)
        pair = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        scored = pair if scored is None else F.when(
            (pair.getField("score")) > scored.getField("score"), pair
        ).otherwise(scored)
    return F.when(scored.getField("score") > 0, scored.getField("lang")).otherwise(
        F.lit("und")
    )


def _langid_pred_sql() -> str:
    langs = sorted(LANG_MARKERS)
    expr = f"'{langs[0]}'"
    best = marker_hits_sql(langs[0])
    # mirror the Spark fold: later languages win only on strictly greater score
    for lang in langs[1:]:
        s = marker_hits_sql(lang)
        expr = f"(CASE WHEN {s} > {best} THEN '{lang}' ELSE {expr} END)"
        best = f"greatest({s}, {best})"
    return f"(CASE WHEN {best} > 0 THEN {expr} ELSE 'und' END)"


@query(
    "ext_text_langid",
    oracle=f"""
    SELECT lang AS actual_lang, {_langid_pred_sql()} AS predicted_lang,
           COUNT(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def ext_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-word hit scoring + argmax, 'und' when
    nothing matches) cross-tabbed against the labeled lang column — the
    shape of an n-gram language classifier, as pure codegen expressions."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("actual_lang"), _langid_pred().alias("predicted_lang"))
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ext_text_quality",
    oracle=f"""
    SELECT doc_id,
           len({tokens_sql('text')}) AS n_tokens,
           (length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', ''))) AS n_punct,
           {round2_sql(f"CAST(length(text) AS DOUBLE) / len({tokens_sql('text')})", 'avg_token_len')[1]},
           (CASE WHEN len({tokens_sql('text')}) BETWEEN 5 AND 2000
                 AND (length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')))
                     * 10 < length(text)
                 THEN 1 ELSE 0 END) AS quality_pass
    FROM documents
    """,
)
def ext_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features: token count, punctuation count, average
    token length, and a pass/fail gate (length band + punctuation density
    < 10%) — the standard pre-training corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text"))
    n_punct = F.length("text") - F.length(
        F.translate(F.col("text"), ".,!", "")
    )
    avg_tok = F.expr(
        "CAST(CAST(FLOOR((CAST(length(text) AS DOUBLE) / "
        "size(filter(split(text, ' '), t -> t != ''))) * 100 + 0.5) AS BIGINT) "
        "AS DOUBLE) / 100.0"
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        avg_tok.alias("avg_token_len"),
        F.when(
            n_tokens.between(5, 2000) & (n_punct * 10 < F.length("text")), 1
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


@query(
    "ext_text_tokens",
    oracle=f"""
    SELECT doc_id,
           len({tokens_sql('text')}) AS n_ws_tokens,
           len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), t -> t <> '')) AS n_word_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def ext_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and regex word tokens
    (the BPE-ish pre-tokenizer split), plus character count."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.size(
            F.filter(F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda t: t != "")
        ).alias("n_word_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "ext_text_fingerprint",
    oracle=f"""
    SELECT {fingerprint_sql('text')} AS fp,
           MIN(doc_id) AS first_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def ext_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit content fingerprint over normalized text (lowercase,
    whitespace-collapsed md5 prefix); grouping surfaces collision sets —
    the container-level dedup key for a crawl corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("first_doc_id"), F.count(F.lit(1)).alias("n_docs")
    )


# --------------------------------------------------------------- dedup ----


@query(
    "ext_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group on md5(text), keep min(doc_id) per group
    (deterministic keeper). The shuffle carries 16-byte hashes, not
    documents — at 100 TB that is the difference between shuffling
    hashes (~GBs) and shuffling the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


@query(
    "ext_dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang,
             CASE WHEN len({tokens_sql('text')}) >= 2
                  THEN list_distinct(list_transform(
                         generate_series(1, len({tokens_sql('text')}) - 1),
                         i -> {tokens_sql('text')}[i] || ' ' || {tokens_sql('text')}[i+1]))
                  ELSE [] END AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(FLOOR(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / nullif(len(list_distinct(list_concat(a.shingles, b.shingles))), 0)
             * 1000000 + 0.5) AS BIGINT) AS jaccard_e6
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    """,
)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram-shingle Jaccard similarity over candidate pairs
    (adjacent doc_ids within a language — a stand-in pair generator; in
    production the pair source is the MinHash/SimHash candidate stream
    below). Jaccard emitted as an e6-scaled BIGINT: a single division of
    exact set cardinalities, deterministic in both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    shingles = F.when(
        F.size(toks) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", "lang", shingles.alias("shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(
        F.array_distinct(F.concat(F.col("a.shingles"), F.col("b.shingles")))
    )
    jac = inter.cast("double") / F.nullif(union, F.lit(0))
    return a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1)
        & (F.col("a.lang") == F.col("b.lang")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.floor(jac * 1000000 + 0.5).cast("bigint").alias("jaccard_e6"),
    )


_MINHASH_SEEDS = 8
_MINHASH_BANDS = 4  # 2 hashes per band
_MAX_BUCKET = 64  # LSH degenerate-bucket cap (boilerplate shingle sets)


@query("ext_dedup_near_minhash")  # rows-only: xxhash64 has no DuckDB twin
def ext_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs, hand-rolled from
    built-ins (no Spark ML pipeline, no UDFs):

    shingle -> 8 seeded xxhash64 min-hashes per doc -> 4 bands of 2 ->
    band-bucket equi-join -> distinct (a < b) pairs.

    Docs sharing any band collide; with 8 hashes / 4 bands the collision
    probability curve is steep around ~0.6 Jaccard. The join is keyed on
    (band_idx, band_hash): that is the LSH trick that replaces O(n²)
    all-pairs with keyed shuffles. Verified structurally (pair symmetry /
    self-exclusion) in tests; no DuckDB oracle because xxhash64 is
    Spark-specific.

    Two scale guards (the difference between 17 s and 0.7 s at sf0.1, and
    between feasible and quadratic at 100 TB):

    * exact-duplicate groups collapse to one representative BEFORE
      hashing — identical texts share every band, so a group of k exact
      copies alone would emit k² /2 pairs that `ext_dedup_exact` already
      finds for free;
    * degenerate buckets (> _MAX_BUCKET members — boilerplate shingle
      sets) are dropped, the standard LSH cap. The cap is observable in
      the `n_capped_buckets` column of tests, not silent."""
    d = load_table(spark, sf_dir, "documents")
    reps = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.any_value("text").alias("text")
    )
    tok = reps.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    mins = tok.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(s), F.col("tok"))).alias(f"mh{s}")
            for s in range(_MINHASH_SEEDS)
        ]
    )
    bands = mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                        ).alias("h"),
                    )
                    for b in range(_MINHASH_BANDS)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.h")
    ok_buckets = (
        bands.groupBy("band", "h")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter((F.col("sz") > 1) & (F.col("sz") <= _MAX_BUCKET))
        .select("band", "h")
    )
    bands = bands.join(ok_buckets, ["band", "h"], "left_semi")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query("ext_dedup_simhash")  # rows-only: xxhash64 has no DuckDB twin
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature per doc (bit-wise majority vote
    over token hashes, computed as 64 conditional-sum aggregates — one
    shuffle of 64 small ints per doc), then candidate pairs via 16-bit
    band join with Hamming distance <= 3 (bit_count(xor)).

    Per-doc signatures + banded pair join: same LSH scale shape as
    MinHash, cheaper signatures, Hamming verify instead of Jaccard."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = bit_sums.select(
        "doc_id",
        F.expr(
            " + ".join(
                f"(CASE WHEN b{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END)"
                for b in range(64)
            )
        ).alias("simhash"),
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("h"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "simhash", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 3)


# ---------------------------------------------------- similarity search ----


@query(
    "ext_sim_cosine_topk",
    oracle=f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROW_NUMBER() OVER (ORDER BY {cosine_unrolled_sql('embedding', 'p', dialect='duck')} DESC,
                              vec_id ASC) AS rank
    FROM embeddings, probe
    WHERE vec_id <> 0
    ORDER BY rank
    LIMIT 10
    """,
)
def ext_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 around probe vec_id=0 (ids + rank only;
    no floats hashed). The probe is a broadcast single row; similarity is
    the unrolled bit-exact expression (functions/vectors.py), so rank
    order is identical across engines; vec_id tiebreak closes rank ties.
    This is the baseline ANN path — `ext_sim_ann_ivf` is the scale path."""
    e = load_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("p"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.expr(cosine_unrolled_sql("embedding", "p")).alias("cos"),
        )
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("vec_id", "rank")
    )


@query(
    "ext_embed_neardup_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(FLOOR({cosine_unrolled_sql('a.embedding', 'b.embedding', dialect='duck')} * 1000000) AS BIGINT)
             AS cos_e6,
           ({cosine_unrolled_sql('a.embedding', 'b.embedding', dialect='duck')} > 0.5) AS is_neardup
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def ext_embed_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection over candidate pairs
    (adjacent ids as the stand-in pair generator). Because the cosine
    expression is bit-exact cross-engine, even its e6-scaled floor and the
    threshold flag hash-match exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = F.expr(cosine_unrolled_sql("a.embedding", "b.embedding"))
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.floor(cos * 1000000).cast("bigint").alias("cos_e6"),
        (cos > 0.5).alias("is_neardup"),
    )


_IVF_K = 8


@query("ext_sim_ann_ivf")  # rows-only: multi-stage argmin has no clean SQL twin
def ext_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic seed centroids (vec_id < 8), assign
    every vector to its nearest centroid (broadcast 8 rows, argmin via one
    window), then search ONLY the probe's bucket for top-10 by cosine.

    The scale story: assignment is a broadcast map-side pass (no shuffle
    of embeddings); search touches 1/K of the corpus. Recall vs the
    brute-force baseline is measured in tests by comparing against
    `ext_sim_cosine_topk`."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cent_id",
        dot("embedding", "cent").alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("bucket"))
    )
    probe = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("p"), F.col("bucket").alias("probe_bucket")
    )
    cands = assigned.join(
        F.broadcast(probe),
        (F.col("bucket") == F.col("probe_bucket")) & (F.col("vec_id") != 0),
    )
    w2 = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cands.select("vec_id", "bucket", cosine("embedding", "p").alias("cos"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 10)
        .select("vec_id", "bucket", "rank")
    )


# ----------------------------------------------------------- multimodal ----


@query(
    "ext_multimodal_join",
    oracle=f"""
    SELECT lang, label, COUNT(*) AS n,
           {avg2_sql('n_chars', 'avg_chars')[1]}
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang, label
    """,
)
def ext_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified multimodal view: text table ⋈ embedding table on doc id,
    per-(lang, label) stats. Both sides co-shuffle on the id (or the
    embedding side broadcasts when it is the small modality)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(F.count(F.lit(1)).alias("n"), avg2("n_chars", "avg_chars"))
    )


@query(
    "ext_embed_quantize",
    oracle=f"""
    SELECT vec_id,
           list_transform(embedding,
             x -> CAST(GREATEST(-127, LEAST(127,
                  CAST(FLOOR(CAST(x AS DOUBLE) * 127 + 0.5) AS BIGINT))) AS INT)
           ) AS q8,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def ext_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (the storage-side prep for ANN at
    scale: 4x smaller vectors, SIMD-friendly dot products downstream).
    Symmetric scale-127 with explicit FLOOR(x*127+0.5) rounding and
    saturation — the whole transform is a per-element expression, exact
    in both engines (float32 -> double widening is lossless)."""
    e = load_table(spark, sf_dir, "embeddings")
    q8 = F.transform(
        F.col("embedding"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") * 127 + 0.5).cast("bigint"),
            ),
        ).cast("int"),
    )
    return e.select("vec_id", q8.alias("q8"), F.size("embedding").alias("dim"))


@query(
    "ext_text_ngrams",
    oracle=f"""
    SELECT lang, gram, n FROM (
      SELECT lang, gram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, gram ASC) AS rk
      FROM (
        SELECT lang,
               unnest(list_transform(
                 generate_series(1, length(text) - 2),
                 i -> substring(text, CAST(i AS INT), 3))) AS gram
        FROM documents
      )
      GROUP BY lang, gram
    ) WHERE rk <= 10
    """,
)
def ext_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 character trigrams per language — the feature extraction
    under real n-gram language ID. Trigram explosion happens in the scan
    stage (sequence + transform, pure codegen); only (lang, gram, count)
    partials shuffle. Total order (count DESC, gram ASC) makes the top-10
    set deterministic."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "gram", "n")
    )


@query("ext_dedup_cluster")  # rows-only: iterative fixpoint, no single-SQL twin
def ext_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the union
    of exact-duplicate pairs and MinHash candidate pairs, via iterative
    min-label propagation to a fixpoint.

    This is the operator that turns pairwise dedup signals into the
    per-document keep/drop decision a corpus pipeline actually needs
    (keep cluster representative = min doc_id). Each iteration is one
    join + one min-aggregate, both keyed on doc_id — the classic
    large-graph CC-on-MapReduce shape; iterations are O(log diameter) and
    near-dup graphs are shallow (star-like), so 4-6 rounds close. Spark
    caching holds the frontier; convergence is checked with a count.
    Labels are deterministic (min over a deterministic edge set).
    Verified by property tests: label <= doc_id, endpoints of every edge
    share a label, representatives label themselves."""
    d = load_table(spark, sf_dir, "documents")
    exact_pairs = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_a"), F.collect_set("doc_id").alias("members"))
        .select("doc_a", F.explode("members").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    near_pairs = ext_dedup_near_minhash(spark, sf_dir)
    edges = exact_pairs.unionByName(near_pairs).distinct()
    # undirected: propagate labels both ways
    sym = edges.unionByName(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = d.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(8):  # log2(diameter) bound; dedup graphs are shallow
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut lineage per round
        if changed == 0:
            break
    return labels


@query(
    "ext_data_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
    FROM (
      SELECT doc_id,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split-seed-1'), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
      )
    )
    GROUP BY split
    """,
)
def ext_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by hashing the
    document id with a named seed — the reproducible-holdout primitive of
    every training-data pipeline. Hash bucketing beats rand(): stable
    across runs, engines, and reshuffles; changing the seed string
    re-splits the corpus reproducibly. The first 8 md5 hex chars give a
    uniform 32-bit bucket; both engines parse hex identically."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-1"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
    )
