"""Shared determinism helpers for exact-oracle operators (SURVEY.md §2B
"FP discipline").

Why not ``round()`` / ``CAST(.. AS DECIMAL)``: engines disagree on rare
rows. Spark casts double->decimal through Java BigDecimal's shortest
string representation (double-rounding), DuckDB through its own scaled
conversion; at sf0.01 this already produced a one-cent mismatch in a
60k-row sum. The only portable formulation is explicit integer
arithmetic spelled out identically on both sides:

* per-row fixed-point: ``FLOOR(x * 10000)`` — the multiply is a single
  IEEE-754 op (bit-identical in both engines), FLOOR is exact, and floor
  has no rounding ties.
* exact BIGINT sums (associative -> independent of partial-agg order).
* final half-up rounding as ``(S + 50) DIV 100`` — no library rounding
  rule involved.

Each helper returns a (spark_sql, duckdb_sql) pair from one template; the
only dialect difference is integer division (``div`` vs ``//``). Outputs
are DOUBLE (``cents / 100.0`` — exact for any |cents| < 2^52).

Scale bound: |x| * 10000 must stay below 2^53 per row (|x| < 9e11) and the
scaled BIGINT sum below 2^63 (~9.2e14 in value units) — comfortably true
for this schema even at SF 1000; beyond that, swap BIGINT for DECIMAL(38,0)
accumulators.
"""

from __future__ import annotations

import glob as _glob
import os as _os
import shutil as _shutil
import time as _time
import uuid as _uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 10000  # 4 implicit fractional digits of working precision


_STAGE_STALE_S = 3600  # a live concurrent build is minutes old, not hours


def new_stage(path: str) -> str:
    """Per-session-unique stage directory beside ``path`` for
    stage-then-rename store builds. A FIXED shared stage dir
    (``path + ".stage"``) lets two concurrent sessions building the same
    store interleave their overwrite writes inside the stage before
    either renames, so the rename winner can publish a mixed/partial
    store; the uuid suffix keeps each session's stage private while
    :func:`publish_store` keeps final-path atomicity.

    A build that crashes between write and publish leaks its uuid stage
    dir; retries never reuse the name, so scratch would grow unboundedly
    across crashed sessions. Reclaim here: any ``path.stage-*`` sibling
    whose mtime is older than an hour cannot be a live concurrent build
    and is removed before this build starts."""
    for old in _glob.glob(f"{path}.stage-*"):
        try:
            if _time.time() - _os.path.getmtime(old) > _STAGE_STALE_S:
                _shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass  # concurrent janitor already removed it
    return f"{path}.stage-{_uuid.uuid4().hex[:8]}"


def publish_store(stage: str, path: str) -> None:
    """Atomically publish ``stage`` as ``path`` via rename. On a lost
    race the winner's store has identical content (stores are pure
    functions of the fixture), so drop our stage dir instead of leaving
    it on disk permanently. A rename failure with NO winner on disk
    (permissions, stale mount) is a genuine error — swallowing it would
    hand the caller a path that does not exist and surface later as a
    confusing parquet-read failure — so it re-raises."""
    try:
        _os.rename(stage, path)
    except OSError:
        _shutil.rmtree(stage, ignore_errors=True)
        if not _os.path.exists(path):
            raise


def run_parallel(*thunks):
    """Run independent Spark actions concurrently from driver threads
    (optimization guide §2.6 "overlap independent jobs"). Actions are
    only sequential because driver code calls them sequentially; inside
    a foreachBatch micro-batch the per-gate state commits, the verdict
    write, and the per-gate fold compactions are independent jobs on
    batch-sized data whose scheduling/commit latency — not compute —
    dominates, so running them from a small thread pool collapses the
    batch wall from the SUM of the actions to their MAX. Results return
    in thunk order; the first raised exception propagates (after all
    threads finish, so no action is left mid-flight).

    Scale note: this changes scheduling only — each job's plan, its
    shuffle layout, and every committed file's content are identical to
    the sequential form; concurrent jobs share the executors FIFO, which
    is exactly the back-fill behaviour the guide describes."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def _round_cents(S: str, div: str) -> str:
    """Half-up rounding of a scale-4 integer ``S`` to cents, sign-symmetric.

    Written with positive-only division so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree.
    """
    return (
        f"CAST((CASE WHEN {S} >= 0 THEN ({S} + 50) {div} 100 "
        f"ELSE -((-({S}) + 50) {div} 100) END) AS DOUBLE) / 100.0"
    )


def sum2_sql(expr: str, alias: str) -> tuple[str, str]:
    """Deterministic SUM(expr) rounded to 2 decimals, as (spark, duckdb) SQL."""
    S = f"SUM(CAST(FLOOR(({expr}) * {_SCALE}) AS BIGINT))"
    return tuple(
        f"{_round_cents(S, div)} AS {alias}" for div in ("div", "//")
    )  # type: ignore[return-value]


def avg2_sql(expr: str, alias: str) -> tuple[str, str]:
    """Deterministic AVG(expr) rounded to 2 decimals, as (spark, duckdb) SQL.

    avg = S / (10000 * n); half-up to cents in integer domain:
    cents = (2*S + 100*n) DIV (200*n) for S >= 0 (mirrored for S < 0).
    """
    out = []
    for div in ("div", "//"):
        S = f"SUM(CAST(FLOOR(({expr}) * {_SCALE}) AS BIGINT))"
        n = "COUNT(*)"
        pos = f"(2 * ({S}) + 100 * {n}) {div} (200 * {n})"
        neg = f"-((-2 * ({S}) + 100 * {n}) {div} (200 * {n}))"
        out.append(
            f"CAST((CASE WHEN {S} >= 0 THEN {pos} ELSE {neg} END) AS DOUBLE)"
            f" / 100.0 AS {alias}"
        )
    return tuple(out)  # type: ignore[return-value]


def round2_sql(expr: str, alias: str) -> tuple[str, str]:
    """Deterministic per-row round-to-2-decimals (half-up for positives),
    as (spark, duckdb) SQL: ``FLOOR(x*100 + 0.5) / 100.0`` — identical
    IEEE ops in both engines, no library rounding."""
    s = (
        f"CAST(CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT) AS DOUBLE)"
        f" / 100.0 AS {alias}"
    )
    return (s, s)


def sum2(expr: str, alias: str) -> Column:
    """Spark Column for :func:`sum2_sql` (use inside ``.agg``)."""
    return F.expr(sum2_sql(expr, alias)[0].rsplit(" AS ", 1)[0]).alias(alias)


def avg2(expr: str, alias: str) -> Column:
    """Spark Column for :func:`avg2_sql` (use inside ``.agg``)."""
    return F.expr(avg2_sql(expr, alias)[0].rsplit(" AS ", 1)[0]).alias(alias)


def round2(expr: str, alias: str) -> Column:
    """Spark Column for :func:`round2_sql`."""
    return F.expr(round2_sql(expr, alias)[0].rsplit(" AS ", 1)[0]).alias(alias)


def epoch_s(col: Column | str, alias: str) -> Column:
    """Timestamp -> epoch seconds BIGINT (floor), safe to hash cross-engine
    (Spark sees µs precision, DuckDB ns; floor-to-second is stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_unix_timestamp(c).cast("bigint").alias(alias)


def oracle_epoch(expr: str, alias: str) -> str:
    """DuckDB SQL twin of :func:`epoch_s`. ``epoch_ns(..) // 1e9`` stays in
    integer domain — ``date_part('epoch', ..)`` would return fractional
    DOUBLE seconds on ns timestamps."""
    return f"(epoch_ns({expr}) // 1000000000) AS {alias}"
