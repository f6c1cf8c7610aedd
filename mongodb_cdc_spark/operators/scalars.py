"""Scalar function operators (SURVEY.md §2B "Scalar functions").

The reference has no scalar function library — its per-document transforms
are field projections (js:160-184) and `JSON.stringify` comparisons
(js:469); `fn_json` is the engine formulation of its dynamic-document
escape hatch (§1.2: open attributes ride a JSON string column).

All of these stay inside whole-stage codegen (built-in functions, no
Python) — per-row scalar work is exactly what Tungsten compiles into the
scan loop, so at 100 TB these cost no more than the scan itself.

Determinism notes are per-operator; general rules in `_util`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.operators._util import round2, round2_sql
from mongodb_cdc_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           length(p_name) AS name_len,
           (p_name LIKE '%a%') AS has_a
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper / substring / concat / length / LIKE over `part` (1-based
    substring in both engines)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@query(
    "fn_string_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_len,
           (regexp_matches(text, '[0-9]')) AS has_digit
    FROM documents
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface over documents: extract / global replace / match.
    Patterns stay in the character-class + quantifier subset where Java
    and RE2-family engines agree (no lookaround, no engine-specific
    escapes). Spark's regexp_replace is global by default; DuckDB needs
    the 'g' flag."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("devoweled_len"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           (epoch_us(date_trunc('month', o_orderdate)) // 1000000) AS month_start_epoch,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year / month / date_trunc / datediff over `orders`. Truncated month
    start is emitted as an epoch BIGINT (timestamp-output discipline);
    datediff runs on DATE in both engines (day-count semantics match).
    days_to_1999 is cast to BIGINT: it goes NEGATIVE for post-1999 dates,
    and pandas hashes a negative int32 differently from the same value as
    int64 (unsigned view of the source width) — the one integer-width
    case a pandas-based hasher can distinguish."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.to_unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
        .cast("bigint")
        .alias("month_start_epoch"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_1999"),
    )


@query(
    "fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(abs(l_discount - 0.05) * 100 AS DOUBLE) AS disc_delta_pct,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           {round2_sql('l_quantity * l_quantity', 'qty_squared')[1]}
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs / floor / ceil / square over `lineitem`. The square is written
    as x*x (one IEEE multiply — bit-identical) rather than pow(x, 2),
    whose libm implementations may differ in the last ulp across engines;
    floor/ceil are cast to BIGINT because DuckDB returns DOUBLE and Spark
    BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.abs(F.col("l_discount") - 0.05) * 100).cast("double").alias("disc_delta_pct"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        round2("l_quantity * l_quantity", "qty_squared"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-document escape hatch (SURVEY.md §1.2): open attributes
    live in the `props` JSON string (the engine's stand-in for ragged BSON
    documents, js:459-469); `get_json_object` extracts server-side with no
    Python involved. Integer payloads sum exactly — no FP discipline
    needed, but the oracle's SUM must be cast back to BIGINT: DuckDB
    widens integer SUM to HUGEINT, which its pandas bridge renders as
    float64 and the driver then hashes 99111.0 against Spark's 99111."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_array",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           {round2_sql('embedding[1] * 100', 'first_x100')[1]},
           {round2_sql('embedding[64] * 100', 'last_x100')[1]}
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface over the embedding column (NS multimodal
    grounding): size + element_at (1-based in both engines). float32 ->
    double widening is exact, so the fixed-point round is cross-engine
    stable."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round2("element_at(embedding, 1) * 100", "first_x100"),
        round2("element_at(embedding, 64) * 100", "last_x100"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           2 AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build a map, read a key back, count keys. The
    oracle computes the same scalars directly (DuckDB's MAP type isn't
    part of the contract surface)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("id"), F.col("event_id").cast("string")
    )
    return ev.select(
        "event_id",
        m.getItem("type").alias("type_from_map"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 150 THEN 'high'
                WHEN value > 75 THEN 'mid'
                ELSE 'low' END AS value_band,
           coalesce(nullif(event_type, 'error'), 'n/a') AS type_or_na
    FROM events
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif — the classification idiom of the
    reference's diff routine (js:466-470: missing-in-source /
    missing-in-target / value-mismatch)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 150, "high")
        .when(F.col("value") > 75, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("n/a")).alias(
            "type_or_na"
        ),
    )


@query(
    "fn_cast_decimal",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(18,0))
                * CAST(0.01 AS DECIMAL(3,2))
                * CAST(1.05 AS DECIMAL(3,2))
                * 10000 AS BIGINT) AS with_tax_e4
    FROM orders
    """,
)
def fn_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType arithmetic: price -> exact cents -> DECIMAL, multiplied
    by exact decimal literals (multiplication is exact, engines only differ
    in declared scale), surfaced as a scaled BIGINT. The double->decimal
    entry goes through FLOOR fixed-point (never a raw decimal cast — see
    _util module docs), and the output leaves decimal-typed columns out of
    the hash (engine scale rules differ)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(18,0))"
            " * CAST(0.01 AS DECIMAL(3,2))"
            " * CAST(1.05 AS DECIMAL(3,2))"
            " * 10000 AS BIGINT)"
        ).alias("with_tax_e4"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           (user_id & 255) AS low_byte,
           (user_id | 4096) AS with_flag,
           xor(user_id, event_id) AS mixed,
           (user_id << 2) AS shifted
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface (and/or/xor/shift) — integer-exact by nature."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("mixed"),
        F.shiftleft("user_id", 2).alias("shifted"),
    )


@query(
    "fn_hashes",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256
    FROM documents
    """,
)
def fn_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface: md5 + sha256 hex digests (identical
    across engines — the foundation under dedup keys, fingerprints, and
    deterministic sampling)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           (epoch_us(o_orderdate + INTERVAL 60 DAY) // 1000000) AS due_epoch,
           (epoch_us(o_orderdate + INTERVAL 3 MONTH) // 1000000) AS quarter_epoch,
           (epoch_us(date_trunc('year', o_orderdate) + INTERVAL 1 YEAR) // 1000000) AS next_year_epoch
    FROM orders
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: day/month/year addition (calendar-aware month
    semantics agree across engines for timestamp inputs; outputs follow
    the epoch-BIGINT discipline).

    Trap found while building the oracle: DuckDB interval EQUALITY uses
    30-day months, so `+ INTERVAL 90 DAY` and `+ INTERVAL 3 MONTH` on the
    same column are "equal" to its CSE pass and collapse into ONE of the
    two expressions (order-dependent result). The day offset here is 60
    so no interval constant in the query compares equal to another."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_unix_timestamp(F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("bigint")
        .alias("due_epoch"),
        F.to_unix_timestamp(F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS"))
        .cast("bigint")
        .alias("quarter_epoch"),
        F.to_unix_timestamp(
            F.date_trunc("year", "o_orderdate") + F.expr("INTERVAL 1 YEAR")
        )
        .cast("bigint")
        .alias("next_year_epoch"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
           json_extract_string(props, '$.k') AS k_str,
           CAST(NULL AS BIGINT) AS missing_k
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark >= 4.0) — the engine's native answer to ragged BSON
    documents (SURVEY.md §1.2): `parse_json` builds the binary
    semi-structured value once, then `variant_get` extracts typed fields
    by path WITHOUT re-parsing the JSON text per access — at 100 TB the
    parse-once/extract-many split is the difference between one string
    parse per row and one per extraction (`fn_json`'s get_json_object
    re-parses each call). `try_variant_get` on an absent path yields
    NULL instead of raising — the schema-drift posture a CDC consumer
    needs. The oracle states the same typed extractions over DuckDB's
    JSON functions."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_big"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.absent", "bigint").alias("missing_k"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT p_partkey,
           {'brand': p_brand, 'size': p_size}.brand AS brand_out,
           {'brand': p_brand, 'size': p_size}.size + 1 AS size_plus,
           ({'a': p_brand, 'b': p_size} = {'a': p_brand, 'b': p_size})
             AS self_eq,
           ({'a': p_brand, 'b': p_size} = {'a': p_brand, 'b': p_size + 1})
             AS shifted_eq
    FROM part
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT surface: construction, field access, arithmetic on an
    accessed field, and whole-struct equality (field-wise, null-safe per
    field on both engines) — the typed-record escape hatch the dynamic
    document model maps onto (SURVEY §1.2: nested BSON docs become
    StructType columns). Pure codegen expressions; structs never reach
    the hashed output (the driver hasher cannot hash them) — only
    scalars extracted from them."""
    part = load_table(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
    a = F.struct(F.col("p_brand").alias("a"), F.col("p_size").alias("b"))
    a2 = F.struct(
        F.col("p_brand").alias("a"), (F.col("p_size") + 1).alias("b")
    )
    return part.select(
        "p_partkey",
        s.getField("brand").alias("brand_out"),
        (s.getField("size") + 1).alias("size_plus"),
        (a == a).alias("self_eq"),
        (a == a2).alias("shifted_eq"),
    )


# --------------------------------------------------------------------------
# fn_array_hof
# --------------------------------------------------------------------------


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(x * 1000) AS BIGINT))) AS BIGINT)
             AS sum_milli,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(x * x * 1000) AS BIGINT))) AS BIGINT)
             AS sq_milli
    FROM embeddings
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — lambda `filter` / `transform` /
    `aggregate` / `zip_with` over the embedding vectors, the Catalyst
    tier that evaluates per-element logic INSIDE codegen instead of
    exploding (no row multiplication, no shuffle, no Python).

    Exactness: every per-element lambda lands in integer milli-units via
    FLOOR before any summation (float32 -> double widening is exact;
    x*x and x*1000 are single IEEE ops), so the fold order cannot
    matter. The Spark side deliberately exercises `zip_with` for the
    squared term (pairing the vector with itself) and `aggregate` for
    the fold; the oracle expresses the identical semantics through
    DuckDB's list_transform/list_sum — same elements, same integers.

    Scale: a pure map-stage projection over 64-wide arrays; the HOF
    form is the 100 TB answer to per-element work (explode would 64x
    the row count through every downstream exchange)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0D))").alias("n_pos"),
        F.expr(
            "aggregate(transform(embedding, "
            "x -> CAST(FLOOR(x * 1000) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("sum_milli"),
        F.expr(
            "aggregate(zip_with(embedding, embedding, "
            "(x, y) -> CAST(FLOOR(x * y * 1000) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("sq_milli"),
    )


# --------------------------------------------------------------------------
# fn_try_arith
# --------------------------------------------------------------------------


@query(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
             / NULLIF(CAST(FLOOR(l_quantity) AS BIGINT) - 30, 0) AS unit_or_null,
           CASE WHEN CAST(FLOOR(l_quantity) AS BIGINT) - 30 = 0 THEN 1 ELSE 0 END
             AS div_zero_flag
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (the ANSI-mode survival surface): Spark 4
    runs with ANSI SQL enabled, where a division by zero THROWS and
    kills the job — `try_divide` is the per-expression opt-out that
    yields NULL instead, and this operator proves it agrees with the
    oracle's explicit NULLIF-guarded division on a denominator
    engineered to hit zero (quantity == 30 rows). The companion flag
    column counts exactly which rows would have killed an unguarded
    ANSI query.

    Determinism: the division is DOUBLE-typed on both engines
    (BIGINT/BIGINT promotes to double in DuckDB's `/`; try_divide
    returns double) — identical IEEE op on identical operands. Scale:
    pure map-stage projection; the lesson it encodes (guard every
    user-supplied denominator under ANSI mode) is a correctness rule,
    not a plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    denom = F.floor("l_quantity").cast("bigint") - 30
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "try_divide(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) "
            "AS DOUBLE), CAST(CAST(FLOOR(l_quantity) AS BIGINT) - 30 AS DOUBLE))"
        ).alias("unit_or_null"),
        F.when(denom == 0, 1).otherwise(0).cast("bigint").alias("div_zero_flag"),
    )


# --------------------------------------------------------------------------
# fn_url
# --------------------------------------------------------------------------


@query(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (the crawl-pipeline scalar tier): documents
    get deterministic synthetic URLs, parsed back into host / path /
    query-parameter with Spark's BUILT-IN `parse_url` (JVM-side,
    codegen); the oracle extracts the identical components with anchored
    regexes — cross-validating Spark's URL semantics against a
    first-principles grammar on every row.

    At 100 TB this is the canonicalization preamble of web-corpus dedup
    (URL host/path keys feed `ext_dedup_*`); parse_url stays in codegen
    where a Python urlparse UDF would be the classic 100x slow path."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# --------------------------------------------------------------------------
# fn_collation_ci
# --------------------------------------------------------------------------


@query(
    "fn_collation_ci",
    oracle="""
    WITH mixed AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                  ELSE LOWER(c_mktsegment) END AS seg_mixed
      FROM customer
    )
    SELECT LOWER(seg_mixed) AS seg_ci,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT seg_mixed) AS BIGINT) AS n_raw_spellings
    FROM mixed
    GROUP BY LOWER(seg_mixed)
    """,
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive COLLATION (Spark 4's engine-level collation
    support): a deliberately case-mangled segment column is grouped
    under ``COLLATE UTF8_LCASE`` — the collation does the folding inside
    the GROUP BY, no manual LOWER in the grouping key — and the oracle
    states the same partition via explicit LOWER (DuckDB has no
    per-expression collations), proving the collated grouping equals
    the canonical-form grouping while `n_raw_spellings = 2` per group
    shows the raw values really were mixed.

    At scale collations matter because they fold in CODEGEN during hash
    aggregation — one pass — where the pre-Spark-4 idiom (LOWER
    everywhere, or worse a Python normalizer) doubles string
    materialization on every grouped pipeline."""
    from mongodb_cdc_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
    WITH mixed AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                  ELSE LOWER(c_mktsegment) END AS seg_mixed
      FROM customer
    )
    SELECT LOWER(seg_ci_grp) AS seg_ci,
           n,
           n_raw_spellings
    FROM (
      SELECT MIN(seg_mixed) AS seg_ci_grp,
             COUNT(*) AS n,
             CAST(COUNT(DISTINCT seg_mixed COLLATE UTF8_BINARY) AS BIGINT)
               AS n_raw_spellings
      FROM (SELECT c_custkey,
                   seg_mixed COLLATE UTF8_LCASE AS seg_mixed FROM mixed)
      GROUP BY seg_mixed
    )
    """)


# --------------------------------------------------------------------------
# fn_edit_distance — Levenshtein scalar parity
# --------------------------------------------------------------------------


@query(
    "fn_edit_distance",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'small steel widget') AS BIGINT)
             AS dist,
           CAST(levenshtein(p_name, p_brand) AS BIGINT) AS dist_brand,
           (levenshtein(p_name, 'small steel widget') <= 10) AS near_probe
    FROM part
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance as a first-class scalar (both engines
    ship the identical classic DP — pure integer, no collation or float
    divergence to defend against): distance of every part name to a
    probe string, to a second column, and a <=10 nearness band — the
    primitive under fuzzy entity matching (`ext_fuzzy_block_match`
    blocks FIRST precisely because this scalar is O(len^2) per pair;
    this key is the scalar-correctness contract that blocking scheme
    rests on).

    Scale: a scan-stage projection; the only caution is quadratic cost
    in string length — production clamps operand length (names here are
    bounded) and never runs it cross-product (the blocked matcher is
    the join-side discipline)."""
    p = load_table(spark, sf_dir, "part")
    probe = F.lit("small steel widget")
    return p.select(
        "p_partkey",
        "p_name",
        F.levenshtein("p_name", probe).cast("bigint").alias("dist"),
        F.levenshtein("p_name", "p_brand").cast("bigint").alias("dist_brand"),
        (F.levenshtein("p_name", probe) <= 10).alias("near_probe"),
    )
