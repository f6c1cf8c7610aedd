"""Pre-commit behavior-freeze check: gate-sim every registered key whose
implementing file changed since a git ref (default HEAD).

The round-4 lesson, generalized (VERDICT r4, item 5): an operator with a
green driver row must never be committed with changed behavior unless it is
re-verified — a stale green row is worse than no row. This wrapper makes
that a one-liner in the dev loop:

    python tools/gate_changed_keys.py              # vs HEAD, sf0.01 + sf0.1
    python tools/gate_changed_keys.py --ref HEAD~3 # vs an older ref
    python tools/gate_changed_keys.py --sf /root/testdata/sf0.01  # one SF

Mechanics: each registered callable's ``__code__.co_filename`` names the
module that implements it; any key whose file appears in
``git diff --name-only <ref>`` (plus registry.py itself, which would mean
oracle edits — those are caught by the full sim instead) is re-run through
``driver_gate_sim.py --hostile`` at sf0.01 and sf0.1. Exit non-zero on any
failure. No changed operator files -> exit 0 immediately.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def changed_files(ref: str) -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    staged = subprocess.run(
        ["git", "diff", "--name-only", "--cached", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return {ln.strip() for ln in (out + staged).splitlines() if ln.strip()}


def keys_for_files(files: set[str]) -> list[str]:
    from mongodb_cdc_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    abs_changed = {os.path.join(REPO, f) for f in files}
    hit = []
    for key, fn in QUERIES.items():
        target = fn
        while hasattr(target, "__wrapped__"):
            target = target.__wrapped__
        src = getattr(getattr(target, "__code__", None), "co_filename", "")
        if src in abs_changed:
            hit.append(key)
    return hit


def main() -> int:
    ref = "HEAD"
    if "--ref" in sys.argv:
        ref = sys.argv[sys.argv.index("--ref") + 1]
    sfs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if "--sf" in sys.argv:
        sfs = [sys.argv[sys.argv.index("--sf") + 1]]

    files = changed_files(ref)
    op_files = {f for f in files if f.startswith("mongodb_cdc_spark/")}
    if not op_files:
        print(f"no package files changed vs {ref}; nothing to gate")
        return 0
    keys = keys_for_files(op_files)
    if "mongodb_cdc_spark/registry.py" in op_files:
        print("note: registry.py changed (oracle edits?) — keys implemented "
              "there are not auto-detected; run the full gate sim if oracles "
              "were touched")
    if not keys:
        print(f"changed package files {sorted(op_files)} implement no "
              "registered keys; nothing to gate")
        return 0
    print(f"gating {len(keys)} changed key(s) vs {ref}: {keys}")
    rc = 0
    for sf in sfs:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "driver_gate_sim.py"),
             sf, "--hostile", "--keys", ",".join(keys)],
            cwd=REPO,
        )
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
