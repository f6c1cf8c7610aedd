"""Engine operator modules. Importing via :func:`load` registers every
operator into :mod:`mongodb_cdc_spark.registry`."""

from __future__ import annotations

import importlib

MODULES = (
    "scans",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sorts",
    "setops",
    "scalars",
    "cdc",
    "timewindows",
    "extensions",
    "multimodal",
    "reshape",
    "streams",
    "subqueries",
    "udfs",
    "textpipe",
    "maintenance",
    "statistics",
    "quality",
    "benchmarks",
    "benchmarks2",
    "timeseries",
    "graphs",
    "curation",
    "bloom",
    "forget",
)

_loaded = False


def load() -> None:
    global _loaded
    if _loaded:
        return
    for m in MODULES:
        importlib.import_module(f"mongodb_cdc_spark.operators.{m}")
    _loaded = True
