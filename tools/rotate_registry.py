"""Rotation invariant checker for DRIVER_KEY_PRIORITY (registry.py).

History: this tool mechanically GENERATED the round-7 rotation from the
round-6 overflow window (see git history). From round 8 on, rotations
are applied directly in registry.py per the FROZEN ADDITION RULE
documented above the tuple; this tool now only CHECKS the invariants
that rule implies, so a hand-applied rotation can't silently violate
them:

  1. every priority key is a registered operator (no typos / removals);
  2. no duplicates;
  3. every gate miss from the latest CORRECTNESS_r*.json sits inside
     the first 10 positions (misses get re-fronted);
  4. the priority front does not exceed the ~50-key driver budget by
     construction-relevant amounts is NOT asserted — keys behind the
     live window are already-green re-coverage by design.

Run:    python tools/rotate_registry.py --check
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.registry import (  # noqa: E402
    DRIVER_KEY_PRIORITY,
    QUERIES,
    load_all_operators,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_misses() -> list[str]:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        return []
    rows = json.load(open(files[-1]))
    misses = []
    for k, r in rows.items():
        ok = r.get("rows_match") and r.get("schema_match") and (
            r.get("hash_match") is not False
        ) and not r.get("err")
        if not ok:
            misses.append(k)
    return misses


def main() -> int:
    load_all_operators()
    errs = []
    seen = set()
    for k in DRIVER_KEY_PRIORITY:
        if k in seen:
            errs.append(f"duplicate priority key: {k}")
        seen.add(k)
        if k not in QUERIES:
            errs.append(f"priority key not registered: {k}")
    front = list(DRIVER_KEY_PRIORITY[:10])
    for m in _latest_misses():
        if m not in front:
            errs.append(
                f"latest-round gate miss `{m}` is not re-fronted "
                f"(must sit in the first 10 positions)"
            )
    if errs:
        for e in errs:
            print("FAIL:", e)
        return 1
    print(
        f"OK: {len(DRIVER_KEY_PRIORITY)} priority keys, all registered, "
        f"no duplicates, latest misses fronted"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
