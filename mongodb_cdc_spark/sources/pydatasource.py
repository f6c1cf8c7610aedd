"""Jar-free change-feed connector via Spark 4's Python Data Source API.

The reference's production source is a MongoDB driver cursor
(js:120-146 ``connectToMongoDB`` + js:248 ``watch(pipeline, options)``).
The MongoDB Spark connector jar cannot ship in this environment, so the
connector *seam* is exercised with a real, registrable
``pyspark.sql.datasource.DataSource`` implementation instead of a
config-only stub: everything a wire connector must do — enumerate
splits, serve Arrow batches, accept predicate pushdown, expose resumable
stream offsets — runs through the genuine V2 plumbing, with the
file-backed change log standing in for the wire protocol.

Reference parity, piece by piece:

* **R1 (change-stream scan, js:248)** — ``reader()`` plans one
  ``InputPartition`` per log file (≅ one cursor per shard, md:220-223);
  ``simpleStreamReader()`` exposes monotone file-index offsets, the
  resume-token analog (js:93-117): restart from the last committed
  offset replays nothing already committed.
* **R2 ($match pushdown, js:221-223)** — ``pushFilters`` consumes
  ``EqualTo``/``In`` predicates on ``operationType`` so the
  insert/update filter executes INSIDE the source (rows never reach
  Spark), exactly like the server-side ``$match`` executing inside
  mongod. Unsupported predicates are handed back for Spark to apply.
* **R5 (micro-batching)** — the stream reader serves one file per
  micro-batch; Structured Streaming owns triggers and commits.

Batch reads yield **Arrow RecordBatches** (the vectorized path — the
Python worker never loops rows); the stream reader yields tuples (its
per-batch volume is one file).

At 100 TB the partition count comes from the source's natural splits
(shards / oplog ranges); each executor task runs one ``read(partition)``
with its own connection. Nothing here is driver-bottlenecked: the
driver only lists splits and tracks offsets.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from mongodb_cdc_spark.sources.changefeed import EVENT_SCHEMA

FORMAT_NAME = "mongo_changefeed_py"


def _log_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


@dataclass
class _FilePartition(InputPartition):
    file: str


class ChangefeedBatchReader(DataSourceReader):
    """One partition per log file; operationType predicates pushed into
    the Arrow-level scan (R2)."""

    def __init__(self, options):
        self._path = options["path"]
        self._optypes: list[str] | None = None  # None = no pushed filter

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("operationType",):
                self._optypes = [f.value]
            elif isinstance(f, In) and f.attribute == ("operationType",):
                self._optypes = list(f.value)
            else:
                yield f  # unsupported -> Spark applies it post-scan

    def partitions(self):
        return [_FilePartition(f) for f in _log_files(self._path)]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        table = pq.read_table(partition.file)
        if self._optypes is not None:
            mask = pc.is_in(
                table.column("operationType"), value_set=pa.array(self._optypes)
            )
            table = table.filter(mask)
        # Align the timestamp column with what Spark derives from the
        # declared StructType (µs-UTC) — the raw parquet footer says ns.
        # Only that column is re-cast: a whole-schema cast trips over
        # nested nullability flags the data never exercises.
        want = {f.name: f.type for f in to_arrow_schema(EVENT_SCHEMA)}
        i = table.schema.get_field_index("clusterTime")
        table = table.set_column(
            i, "clusterTime", table.column("clusterTime").cast(want["clusterTime"])
        )
        yield from table.to_batches(max_chunksize=65536)


class ChangefeedStreamReader(SimpleDataSourceStreamReader):
    """Resumable micro-batch reader: offset = index of the next unread
    log file (the resume-token analog, js:93-117). One file per batch
    keeps micro-batches bounded like the reference's batchSize cap."""

    def __init__(self, options):
        self._path = options["path"]

    def initialOffset(self):
        return {"file_idx": 0}

    def read(self, start: dict):
        files = _log_files(self._path)
        i = start["file_idx"]
        if i >= len(files):
            return iter([]), start
        return self._rows(files[i]), {"file_idx": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _log_files(self._path)
        out = []
        for i in range(start["file_idx"], end["file_idx"]):
            out.extend(self._rows(files[i]))
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint log (R8 is native)

    @staticmethod
    def _rows(file: str):
        # Spark's prefetch cache copy.copy()s this iterator between
        # batches — a list iterator is copyable, a generator is not.
        from datetime import timezone

        import pyarrow.parquet as pq

        def _utc(ts):
            # Row-path conversion wants tz-AWARE stamps (the parquet
            # column is naive-UTC by engine convention).
            if getattr(ts, "tzinfo", None) is None:
                if hasattr(ts, "tz_localize"):
                    return ts.tz_localize("UTC")
                return ts.replace(tzinfo=timezone.utc)
            return ts

        return iter(
            [
                (
                    row["_id"],
                    row["operationType"],
                    _utc(row["clusterTime"]),
                    (row["documentKey"]["_id"],),
                    (
                        row["fullDocument"]["_id"],
                        row["fullDocument"]["event_type"],
                        row["fullDocument"]["value"],
                        row["fullDocument"]["props"],
                    ),
                )
                for row in pq.read_table(file).to_pylist()
            ]
        )


@dataclass
class _StagedFile(WriterCommitMessage):
    """Per-task commit message: one staged parquet part (picklable)."""

    file: str
    n_rows: int


class ChangefeedUpsertWriter(DataSourceStreamWriter):
    """Two-phase-commit micro-batch sink — the ``bulkWrite`` + checkpoint
    analog (js:188-199 unordered bulk apply, js:272-278 commit):

    * **task side** (``write``): each partition streams its rows into a
      parquet part under ``.staging/`` — the unordered parallel write,
      one writer per partition like one bulk op batch per shard.
    * **driver side** (``commit``): staged parts are renamed into
      ``batch=<id>/`` and a ``_commits/<id>.json`` manifest is written
      LAST — the atomicity point. A replayed batchId whose manifest
      already exists discards its staged parts and commits nothing:
      at-least-once delivery + idempotent commit = exactly-once effect
      (R9, js:114-115), the same contract the parquet upsert target
      implements JVM-side (streaming/upsert.py).
    * **abort**: staged parts are deleted; nothing uncommitted is ever
      visible to readers (``read_committed`` lists manifests, not dirs).
    """

    def __init__(self, options):
        self._path = options["path"]

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        staging = os.path.join(self._path, ".staging")
        os.makedirs(staging, exist_ok=True)
        file = os.path.join(staging, f"part-{uuid.uuid4().hex}.parquet")
        if rows:
            names = list(rows[0].__fields__)
            cols = {n: [r[i] for r in rows] for i, n in enumerate(names)}
            pq.write_table(pa.table(cols), file)
        return _StagedFile(file=file, n_rows=len(rows))

    def commit(self, messages, batchId: int) -> None:
        import json

        commits = os.path.join(self._path, "_commits")
        os.makedirs(commits, exist_ok=True)
        manifest = os.path.join(commits, f"{batchId}.json")
        parts = [m for m in messages if m is not None and m.n_rows > 0]
        if os.path.exists(manifest):  # replayed batch: idempotent no-op
            for m in parts:
                if os.path.exists(m.file):
                    os.remove(m.file)
            return
        batch_dir = os.path.join(self._path, f"batch={batchId}")
        os.makedirs(batch_dir, exist_ok=True)
        final = []
        for m in parts:
            dst = os.path.join(batch_dir, os.path.basename(m.file))
            os.rename(m.file, dst)
            final.append({"file": dst, "n_rows": m.n_rows})
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "files": final}, f)
        os.rename(tmp, manifest)  # atomic visibility point

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


def read_committed(spark, path: str):
    """Read ONLY committed batches of a ChangefeedUpsertWriter target
    (manifest-listed files; staged or aborted parts are invisible)."""
    import json

    commits = os.path.join(path, "_commits")
    files: list[str] = []
    if os.path.isdir(commits):
        for mf in sorted(os.listdir(commits)):
            if mf.endswith(".json"):
                with open(os.path.join(commits, mf)) as f:
                    files.extend(e["file"] for e in json.load(f)["files"])
    if not files:
        return spark.createDataFrame([], "token string")
    return spark.read.parquet(*files)


class ChangefeedPyDataSource(DataSource):
    """``spark.read.format("mongo_changefeed_py")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema):
        return ChangefeedBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return ChangefeedStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return ChangefeedUpsertWriter(self.options)


def register(spark) -> None:
    """Idempotent format registration (latest registration wins).

    Also applies the engine runtime confs: a driver-built vanilla session
    lacks ``spark.sql.python.filterPushdown.enabled``, without which
    Spark refuses to plan a reader that declares ``pushFilters``."""
    from mongodb_cdc_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    spark.dataSource.register(ChangefeedPyDataSource)
