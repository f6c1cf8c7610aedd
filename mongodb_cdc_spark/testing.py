"""Differential-test harness: Spark result vs DuckDB oracle.

Local mirror of the driver's correctness gate (row-count + schema +
order-insensitive value comparison at a given scale factor), so every
operator is verified here BEFORE the driver sees it. This generalizes the
reference's own correctness story — runtime reconciliation by diffing the
two sides (js:399-475) — into the test suite.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from mongodb_cdc_spark.io import TABLE_NAMES
from mongodb_cdc_spark.registry import ORACLES, QUERIES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the ten driver tables registered as views,
    matching the driver's pre-registration."""
    con = duckdb.connect()
    # Cap the oracle's worker-thread fan-out: DuckDB defaults to one
    # thread per core (32 here), and spawning them while a Spark JVM
    # holds hundreds of threads can hit the container pid ceiling —
    # surfacing as a spurious tiny-allocation OutOfMemoryException on
    # the heaviest oracles (observed round 5 on the BPE/IVF evals). The
    # oracle inputs are sf0.01-sized; 8 threads is plenty.
    con.execute("SET threads = 8")
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        # Spark-written replicas (tools/sf1_rehearsal.py) are DIRECTORIES
        # of part files; the driver's testdata are single files. Glob the
        # dir case so the same oracles run on both layouts.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v):
    """Canonicalize a cell value for cross-engine multiset comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if isinstance(v, int):
        return v
    return str(v)


@dataclass
class ParityReport:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    column_mismatch: tuple[list[str], list[str]] | None = None
    sample_diff: list = field(default_factory=list)

    def __str__(self) -> str:
        if self.ok:
            return f"{self.key}: OK ({self.spark_rows} rows)"
        msg = [f"{self.key}: MISMATCH spark={self.spark_rows} oracle={self.oracle_rows}"]
        if self.column_mismatch:
            msg.append(f"  columns spark={self.column_mismatch[0]} oracle={self.column_mismatch[1]}")
        for side, row in self.sample_diff:
            msg.append(f"  only-in-{side}: {row}")
        return "\n".join(msg)


@dataclass
class StrictReport:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    err: str | None = None

    def __str__(self) -> str:
        tag = "OK" if self.ok else f"FAIL ({self.err})"
        return f"{self.key}: {tag} spark={self.spark_rows} oracle={self.oracle_rows}"


def driver_strict_compare(
    spark: SparkSession,
    key: str,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
) -> StrictReport:
    """Emulate the DRIVER's hash comparison, which is stricter than
    :func:`compare_query`: both sides go through pandas (Spark ``toPandas``,
    DuckDB ``.df()``), columns are sorted by name, and rows are hashed
    dtype-sensitively with ``pd.util.hash_pandas_object``. This reproduces
    the two round-1 failure modes `compare_query` was blind to:

    * dtype drift — DuckDB HUGEINT -> pandas float64 hashes differently
      from Spark's int64 even when every value is equal (fn_json r1);
    * unhashable cells — ArrayType output arrives as numpy.ndarray and
      raises ``TypeError: unhashable type`` inside the driver's hasher
      (agg_collect_sorted / agg_approx_quantiles r1).
    """
    import pandas as pd

    own_con = con is None
    con = con or duckdb_connect(sf_dir)
    try:
        sdf = QUERIES[key](spark, sf_dir).toPandas()
        odf = con.execute(ORACLES[key]).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            return StrictReport(
                key, False, len(sdf), len(odf),
                err=f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
            )
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        # Datetime unit drift (Spark toPandas -> ns, DuckDB .df() -> us) is
        # NOT flagged by the real driver (scan_parquet was green in r1 with a
        # raw DATE column), so normalize both sides to ns before hashing.
        for df in (sdf, odf):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64"):
                    df[c] = df[c].astype("datetime64[ns]")
        if len(sdf) != len(odf):
            return StrictReport(key, False, len(sdf), len(odf), err="row count")
        try:
            sh = sorted(pd.util.hash_pandas_object(sdf, index=False).tolist())
            oh = sorted(pd.util.hash_pandas_object(odf, index=False).tolist())
        except TypeError as exc:  # the driver records this as a crash
            return StrictReport(key, False, len(sdf), len(odf), err=f"hasher crash: {exc}")
        if sh != oh:
            dt = {
                c: (str(sdf[c].dtype), str(odf[c].dtype))
                for c in sdf.columns
                if str(sdf[c].dtype) != str(odf[c].dtype)
            }
            return StrictReport(
                key, False, len(sdf), len(odf),
                err=f"hash mismatch; dtype drift={dt or 'none (value diff)'}",
            )
        return StrictReport(key, True, len(sdf), len(odf))
    finally:
        if own_con:
            con.close()


def compare_query(
    spark: SparkSession,
    key: str,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
) -> ParityReport:
    """Run QUERIES[key] on Spark and ORACLES[key] on DuckDB; compare as
    column-name-sorted multisets of canonicalized rows."""
    own_con = con is None
    con = con or duckdb_connect(sf_dir)
    try:
        sdf = QUERIES[key](spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(row) for row in sdf.collect()]

        cur = con.execute(ORACLES[key])
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()

        if sorted(s_cols) != sorted(o_cols):
            return ParityReport(
                key, False, len(s_rows), len(o_rows),
                column_mismatch=(sorted(s_cols), sorted(o_cols)),
            )

        s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        s_set: dict = {}
        for r in s_rows:
            t = tuple(_canon(r[i]) for i in s_order)
            s_set[t] = s_set.get(t, 0) + 1
        o_set: dict = {}
        for r in o_rows:
            t = tuple(_canon(r[i]) for i in o_order)
            o_set[t] = o_set.get(t, 0) + 1

        if s_set == o_set:
            return ParityReport(key, True, len(s_rows), len(o_rows))

        diff = []
        for t in list(s_set):
            if o_set.get(t, 0) != s_set[t] and len(diff) < 3:
                diff.append(("spark", t))
        for t in list(o_set):
            if s_set.get(t, 0) != o_set[t] and len(diff) < 6:
                diff.append(("oracle", t))
        return ParityReport(key, False, len(s_rows), len(o_rows), sample_diff=diff)
    finally:
        if own_con:
            con.close()
