"""Plan assertions (SURVEY.md §4).

The reference's performance posture is pushdown + batching (js:221-223
server-side $match, js:25 bulk batching); on Spark the equivalents are
Catalyst behaviors — filter/limit pushdown into the parquet scan,
broadcast joins for dims, TakeOrderedAndProject for top-k, whole-stage
codegen everywhere hot. These helpers make those properties ASSERTABLE in
tests, so a regression in plan shape (a filter that stopped pushing, a
join that fell off the broadcast path) fails CI rather than shipping a
100x slowdown to the 100 TB cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE where applicable)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters line in plan:\n{plan}"
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}"
    )


def assert_read_schema_only(df: DataFrame, *columns: str) -> None:
    """Assert column pruning: the parquet ReadSchema contains exactly the
    expected columns (a scan reading all columns for a 2-column projection
    is a plan bug)."""
    plan = formatted_plan(df)
    lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert lines, f"no ReadSchema in plan:\n{plan}"
    schema_line = lines[0]
    for c in columns:
        assert c in schema_line, f"column {c} missing from ReadSchema: {schema_line}"
    got = schema_line.split("struct<", 1)[-1]
    n_fields = got.count(":")
    assert n_fields == len(columns), (
        f"ReadSchema has {n_fields} fields, expected {len(columns)}: {schema_line}"
    )
