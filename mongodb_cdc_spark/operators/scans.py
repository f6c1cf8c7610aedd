"""Scan operators (SURVEY.md §2B "Scans / sources / sinks", batch side).

The reference's scan is a MongoDB change-stream cursor (js:248
``sourceCollection.watch(...)``); its batch analog here is a parquet
relation scan that Catalyst can push filters/projections into. The
streaming change-feed source lives in
:mod:`mongodb_cdc_spark.sources.changefeed`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongodb_cdc_spark.io import load_table
from mongodb_cdc_spark.registry import query
from mongodb_cdc_spark.operators._util import new_stage, publish_store


@query("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full relation scan of `lineitem` (all columns pass through; the
    ms-precision l_shipdate is exactly representable in both engines)."""
    return load_table(spark, sf_dir, "lineitem")


# --------------------------------------------------------------------------
# Format-ingestion scans: CSV / JSON / ORC
# --------------------------------------------------------------------------
# The engine must ingest more than parquet (raw corpus drops arrive as
# CSV/JSONL; ORC is the other columnar survivor). Each operator writes a
# deterministic copy of a driver table in the target format ONCE (cached
# in scratch, content a pure function of the input), reads it back with
# an EXPLICIT schema (inference is nondeterministic surface, not engine
# surface), and reduces to a fixed-point aggregate that the DuckDB
# oracle computes from the PARQUET original — cross-FORMAT parity: any
# value the round-trip corrupted breaks the hash.

import os as _os

_SUM_CENTS = "CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
_FMT_ORACLE = f"""
SELECT l_returnflag, COUNT(*) AS n, {_SUM_CENTS} AS price_cents
FROM lineitem GROUP BY l_returnflag
"""

_EV_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(SUM(epoch_ns(ts) // 1000000000) AS BIGINT) AS ts_epoch_sum
FROM events GROUP BY event_type
"""


def _fmt_cache_dir(sf_dir: str, fmt: str, table: str) -> str:
    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    return _os.path.join(scratch_root(), f"fmt_{fmt}_{table}_{sf_name}_v1")


def _staged_write(path: str, write_fn) -> None:
    """Populate a shared-scratch cache dir atomically: write into a
    sibling stage dir, then os.rename() into place — the same
    stage-then-commit discipline as the multimodal blob cache and the
    signature store. Two concurrent cold-starting sessions cannot
    interleave writes into the final path; the rename loser keeps the
    winner's identical content."""
    if _os.path.exists(_os.path.join(path, "_SUCCESS")):
        return
    stage = new_stage(path)
    write_fn(stage)
    publish_store(stage, path)


def _roundtrip(spark: SparkSession, sf_dir: str, table: str, fmt: str, **wopts):
    src = load_table(spark, sf_dir, table)
    path = _fmt_cache_dir(sf_dir, fmt, table)
    _staged_write(
        path,
        lambda p: src.write.mode("overwrite").format(fmt).options(**wopts).save(p),
    )
    return path, src.schema


@query("scan_csv", oracle=_FMT_ORACLE)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion: lineitem round-tripped through headered CSV with an
    explicit schema (timestampFormat pinned — CSV has no types, so the
    schema IS the contract) and reduced to fixed-point aggregates the
    oracle computes from the parquet original. At 100 TB, CSV splits by
    newline so the scan parallelizes like parquet minus pushdown: project
    early, convert to columnar at the first materialization."""
    from pyspark.sql import functions as F

    fmt = "yyyy-MM-dd HH:mm:ss"
    path, schema = _roundtrip(
        spark, sf_dir, "lineitem", "csv", header="true", timestampFormat=fmt
    )
    df = (
        spark.read.format("csv")
        .option("header", "true")
        .option("timestampFormat", fmt)
        .schema(schema)
        .load(path)
    )
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(_SUM_CENTS).alias("price_cents"),
    )


@query("scan_json", oracle=_EV_ORACLE)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingestion: events round-tripped through newline-delimited
    JSON (the raw-corpus interchange format) with an explicit schema;
    timestamps survive as ISO strings and are summed as epoch seconds so
    any tz/precision drift in the round-trip breaks the hash. JSONL
    splits by line at scale; schema-on-read with an EXPLICIT schema keeps
    the scan deterministic (inference samples)."""
    from pyspark.sql import functions as F

    path, schema = _roundtrip(spark, sf_dir, "events", "json")
    df = spark.read.format("json").schema(schema).load(path)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
        F.sum(F.expr("CAST(to_unix_timestamp(ts) AS BIGINT)"))
        .cast("bigint")
        .alias("ts_epoch_sum"),
    )


@query("scan_orc", oracle=_FMT_ORACLE)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion: the other production columnar format, with the same
    pushdown/pruning contract as parquet (predicate pushdown + column
    projection reach the ORC reader). Same cross-format parity check."""
    from pyspark.sql import functions as F

    path, _ = _roundtrip(spark, sf_dir, "lineitem", "orc")
    df = spark.read.format("orc").load(path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(_SUM_CENTS).alias("price_cents"),
    )


# --------------------------------------------------------------------------
# Partition-pruned scan: directory layout as the first-tier index
# --------------------------------------------------------------------------

_PRUNE_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
  AND CAST(ts AS DATE) < DATE '2024-01-15'
GROUP BY event_type
"""


@query("scan_partitioned_pruned", oracle=_PRUNE_ORACLE)
def scan_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: `events` written ONCE partitioned by
    `event_date=<day>` directories (cached in scratch, content a pure
    function of the input), then read with a date-range predicate on the
    partition column. The filter never touches row data — Catalyst
    resolves it against the directory listing, so the scan OPENS only
    7 of 30 day-directories (plan shows it as PartitionFilters, pinned
    in tests/test_plans.py). This is THE first-line mechanism at 100 TB:
    a date-partitioned event log makes every time-bounded query cost
    proportional to the window, not the table. The oracle computes the
    same aggregate from the unpartitioned parquet original, so a row
    lost or duplicated by the partitioned rewrite breaks the hash."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"part_events_{sf_name}_v1")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .withColumn("event_date", F.to_date("ts").cast("string"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    df = spark.read.parquet(path).filter(
        (F.col("event_date") >= "2024-01-08") & (F.col("event_date") < "2024-01-15")
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    )


# --------------------------------------------------------------------------
# Schema-evolution scan: mergeSchema across parquet file generations
# --------------------------------------------------------------------------

_MERGE_ORACLE = """
SELECT CASE WHEN event_id % 2 = 0 THEN '__legacy__' ELSE event_type END
         AS event_type_eff,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1
"""


@query("scan_schema_merge", oracle=_MERGE_ORACLE)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: a dataset written in two generations — an
    old writer without `event_type` (even event_ids) and a new writer
    with it (odd event_ids) — read back as ONE relation with
    `mergeSchema=true`, old-generation rows null-extended. This is the
    file-level half of schema drift (the CDC-level half is
    `cdc_schema_drift`): real 100 TB tables accrete columns over years
    of writers and re-writing history is not an option. mergeSchema
    reconciles footers at planning time (cost ~ #files metadata, zero
    row work); the scan itself stays columnar with pushdown intact.
    The oracle derives the same generational split from the original
    table, so a row mis-assigned or a column mis-aligned breaks the
    hash."""
    from pyspark.sql import functions as F

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"schema_gens_{sf_name}_v1")
    e = load_table(spark, sf_dir, "events")
    if not _os.path.exists(_os.path.join(path, "gen=1", "_SUCCESS")):
        (
            e.filter(F.col("event_id") % 2 == 0)
            .select("event_id", "user_id", "value")
            .write.mode("overwrite")
            .parquet(_os.path.join(path, "gen=0"))
        )
        (
            e.filter(F.col("event_id") % 2 == 1)
            .select("event_id", "user_id", "value", "event_type")
            .write.mode("overwrite")
            .parquet(_os.path.join(path, "gen=1"))
        )
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return df.groupBy(
        F.coalesce("event_type", F.lit("__legacy__")).alias("event_type_eff")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    )


# --------------------------------------------------------------------------
# scan_corrupt_records
# --------------------------------------------------------------------------


@query(
    "scan_corrupt_records",
    oracle="""
    SELECT
      CAST(COUNT(*) FILTER (WHERE doc_id % 10 <> 3) AS BIGINT) AS n_good,
      CAST(COUNT(*) FILTER (WHERE doc_id % 10 = 3) AS BIGINT) AS n_corrupt,
      CAST(SUM(n_chars) FILTER (WHERE doc_id % 10 <> 3) AS BIGINT)
        AS good_chars
    FROM documents
    """,
)
def scan_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record ingestion (the production JSONL reality): a
    JSONL dump of `documents` with every doc_id % 10 == 3 line
    DETERMINISTICALLY truncated mid-object is read back in PERMISSIVE
    mode with an explicit `_corrupt_record` column — good rows parse,
    bad rows land whole in the corrupt column instead of killing the
    job (FAILFAST) or vanishing silently (DROPMALFORMED). The result
    counts both populations and checksums the good rows; the oracle
    states the expected split relationally from the clean table, so the
    gate certifies that PERMISSIVE recovered EXACTLY the uncorrupted
    rows — no more, no fewer.

    Scale: corruption handling is per-line and schema-driven — no retry
    loops, no driver involvement; the corrupt column is the quarantine
    channel a 100 TB raw-crawl ingest routes to a dead-letter sink
    (the streaming twin is sink dead-lettering, streams.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    d = load_table(spark, sf_dir, "documents")
    path = _fmt_cache_dir(sf_dir, "jsonl_corrupt", "documents")
    line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
    truncated = F.substring(line, F.lit(1), F.length(line) - 1)
    corrupted = d.select(
        F.when(F.col("doc_id") % 10 == 3, truncated)
        .otherwise(line)
        .alias("value")
    )
    _staged_write(
        path,
        lambda p: corrupted.write.mode("overwrite").format("text").save(p),
    )
    schema = StructType(
        [
            StructField("doc_id", d.schema["doc_id"].dataType),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", d.schema["n_chars"].dataType),
            StructField("_corrupt_record", StringType()),
        ]
    )
    # SPARK-21610: corrupt-column queries need materialization. A bare
    # .cache() here leaks one cached relation per invocation into executor
    # storage memory (223-operator sweeps, bench loops never unpersist it);
    # instead stage the parsed rows through a scratch parquet ONCE per
    # sf_dir — same materialization guarantee, zero storage-memory residue,
    # and repeat invocations are a plain parquet scan.
    parsed = path + "_parsed"
    _staged_write(
        parsed,
        lambda p: spark.read.format("json")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .load(path)
        .write.mode("overwrite")
        .parquet(p),
    )
    read = spark.read.parquet(parsed)
    return read.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count(F.col("_corrupt_record")).cast("bigint").alias("n_corrupt"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("n_chars"))
        )
        .cast("bigint")
        .alias("good_chars"),
    )


# --------------------------------------------------------------------------
# Raw-text and XML ingestion
# --------------------------------------------------------------------------

# \r included: Spark's text reader treats CR as a line terminator too,
# so an unflattened carriage return would split one exported line in two
_TEXT_CLEAN_SPARK = "regexp_replace(text, '[\\n\\t\\r]', ' ')"
_TEXT_CLEAN_DUCK = r"regexp_replace(text, '[\n\t\r]', ' ', 'g')"


@query(
    "scan_text",
    oracle=f"""
    SELECT lang, COUNT(*) AS n,
           CAST(SUM(length({_TEXT_CLEAN_DUCK})) AS BIGINT) AS chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents GROUP BY lang
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw line-oriented text ingestion — the format every crawl dump and
    log shipper ultimately speaks. `documents` is exported once as
    tab-separated ``doc_id \\t lang \\t text`` lines (embedded newlines/
    tabs flattened to spaces — the line protocol's framing contract),
    read back through the `text` source, parsed with split(), and
    reduced to per-lang parity aggregates the oracle computes from the
    parquet original after the SAME flattening: any row lost or mangled
    in the line round-trip breaks the hash.

    Scale: text splits by newline exactly like CSV/JSONL, so a 100 TB
    raw-text corpus scans fully parallel; parse-then-project happens in
    codegen, and the first materialization should land columnar
    (the `ext_shuffle_shards` writer is the companion step)."""
    from pyspark.sql import functions as F

    path = _fmt_cache_dir(sf_dir, "text", "documents")
    d = load_table(spark, sf_dir, "documents")
    line = F.concat_ws(
        "\t",
        F.col("doc_id").cast("string"),
        F.col("lang"),
        F.expr(_TEXT_CLEAN_SPARK),
    )
    _staged_write(
        path,
        lambda p: d.select(line.alias("value"))
        .write.mode("overwrite")
        .format("text")
        .save(p),
    )
    raw = spark.read.format("text").load(path)
    parts = F.split(F.col("value"), "\t", 3)
    parsed = raw.select(
        F.element_at(parts, 1).cast("bigint").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).cast("bigint").alias("chars"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


@query(
    "scan_xml",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents,
           CAST(SUM(length(c_name)) AS BIGINT) AS name_chars
    FROM customer GROUP BY c_mktsegment
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion via Spark 4's built-in XML source (spark-xml merged
    into sql/core): `customer` round-trips through ``<customer>`` row
    elements with an EXPLICIT schema (XML is schema-on-read like CSV —
    inference is demo surface, the schema is the contract) and reduces
    to fixed-point aggregates the oracle computes from the parquet
    original; entity-escaping round-trip fidelity is pinned by the
    name-length checksum.

    Scale: the XML source splits files on rowTag boundaries, so many
    medium files parallelize; one giant document does NOT split —
    production feeds either many files or a pre-split stage, exactly as
    for JSON with multiline=true."""
    from pyspark.sql import functions as F

    path = _fmt_cache_dir(sf_dir, "xml", "customer")
    src = load_table(spark, sf_dir, "customer")
    _staged_write(
        path,
        lambda p: src.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "customer")
        .save(p),
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(src.schema)
        .load(path)
    )
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(FLOOR(c_acctbal * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("acctbal_cents"),
        F.sum(F.length("c_name")).cast("bigint").alias("name_chars"),
    )


@query("scan_compressed_jsonl", oracle=_EV_ORACLE)
def scan_compressed_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSONL ingestion — the shape most raw corpus drops
    actually arrive in. The load-bearing scale fact: **gzip is not
    splittable**, so one .json.gz file = one task no matter its size;
    the writer side therefore shards into many medium files (8 here,
    standing in for the thousands a real drop has) so the scan's
    parallelism survives the codec. The alternatives ladder, cheapest
    first: many gzip shards (this operator), zstd/bzip2 (splittable-ish
    frames), or a one-time decompress-to-columnar landing pass. Parity
    is the same fixed-point events aggregate as `scan_json`, so a row
    lost to codec/framing issues breaks the hash."""
    from pyspark.sql import functions as F

    path = _fmt_cache_dir(sf_dir, "jsonl_gz", "events")
    src = load_table(spark, sf_dir, "events")
    _staged_write(
        path,
        lambda p: src.repartition(8)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .format("json")
        .save(p),
    )
    df = spark.read.format("json").schema(src.schema).load(path)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
        F.sum(F.expr("CAST(to_unix_timestamp(ts) AS BIGINT)"))
        .cast("bigint")
        .alias("ts_epoch_sum"),
    )


# --------------------------------------------------------------------------
# sink_dynamic_partition_overwrite
# --------------------------------------------------------------------------


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN 2 * CAST(FLOOR(value * 100) AS BIGINT)
                         ELSE CAST(FLOOR(value * 100) AS BIGINT) END)
             AS BIGINT) AS cents
    FROM events
    GROUP BY event_type
    """,
)
def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition overwrite — the partition-backfill idiom: a
    table partitioned by event_type gets ONE partition's data restated
    (clicks re-priced to double cents) by a second write in
    partitionOverwriteMode=dynamic, which replaces exactly the
    partitions present in the incoming frame and leaves every other
    partition's files untouched. The static default would TRUNCATE the
    whole table first — the classic lost-data foot-gun this mode exists
    to fix; the read-back aggregate proves both halves (clicks restated,
    everything else intact).

    Scale: this is how 100 TB tables take daily corrections — rewrite
    one partition's worth of files, never the table; the overwrite is
    a metadata swap per touched partition, concurrent readers of other
    partitions are unaffected, and re-running the backfill is
    idempotent (same partition replaced with the same content).

    The two-write sequence runs once per sf_dir into a staged dir
    (stage-then-rename, the shared-scratch discipline); repeat
    invocations scan the committed result."""
    import os as _os

    from pyspark.sql import functions as F

    from mongodb_cdc_spark.sources.changefeed import scratch_root

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
    )
    sf_name = _os.path.basename(_os.path.normpath(sf_dir))
    path = _os.path.join(scratch_root(), f"dpo_events_{sf_name}_v1")

    def write_both(p: str) -> None:
        e.write.mode("overwrite").partitionBy("event_type").parquet(p)
        restated = e.filter(F.col("event_type") == "click").withColumn(
            "cents", F.expr("cents * CAST(2 AS BIGINT)")
        )
        (
            restated.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_type")
            .parquet(p)
        )

    _staged_write(path, write_both)
    return (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
