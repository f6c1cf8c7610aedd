"""Round-7 rotation generator for DRIVER_KEY_PRIORITY (registry.py).

The external CORRECTNESS gate walks ``queries()`` in insertion order and
only reaches the first ~50 keys, so each round fronts the keys that need
driver rows. Round 6 completed full-registry coverage and then grew the
registry past its closed 50-key window; per the ROUND-6 ADDITION RULE
frozen in registry.py, the ROUND-7 window fronts:

  positions 1..M:  any round-6-window keys that MISSED the r6 gate
                   (computed from CORRECTNESS_r06.json if present:
                   window keys with no row or a failed row; normally
                   M = 0)
  next:            the round-6 OVERFLOW additions, in addition order
                   (the contiguous block between the ROUND-6 OVERFLOW
                   comment and the already-driver-green comment —
                   read mechanically from the live tuple)
  last 3:          three fresh cross-round canaries from distinct
                   tiers, never previously canaried (r5 used
                   agg_hash_groupby / cdc_apply_upsert /
                   ext_dedup_exact; r6 used win_latest_per_key /
                   stream_dedup_keys / udf_pandas_scalar)
  then:            every remaining key (already driver-green), in the
                   prior order.

Run:    python tools/rotate_registry.py          # print the new tuple body
        python tools/rotate_registry.py --check  # verify invariants only

The output REPLACES the tuple body in registry.py at ROUND-7 START
(rotate at round start: the round-6 driver gate read the round-6
ordering at round end). After pasting, re-run the full gate sim — the
rotation must never change results, only order. Keys added DURING round
7 follow the same rule: insert before the canaries while the window
stays <= 50, overflow past them into the round-8 window.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.registry import DRIVER_KEY_PRIORITY  # noqa: E402

# The round-6 overflow block is contiguous in the live tuple: it starts
# at the first overflow key and ends before the first already-green key.
OVERFLOW_FIRST = "maintenance_pq_store"
ALREADY_GREEN_FIRST = "agg_filtered_distinct"

# The 50-key round-6 window (positions 1-50 of the round-6 ordering):
# used only to compute gate misses from CORRECTNESS_r06.json.
R6_WINDOW_LEN = 50

# Fresh canaries: untouched since their early-round green rows, three
# distinct tiers (joins / aggregates / scalar functions); never
# previously used as canaries.
CANARIES = ("join_broadcast_dims", "agg_rollup", "fn_json")

CORRECTNESS_R06 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CORRECTNESS_r06.json",
)


def _r6_misses(cur: list[str]) -> list[str]:
    """Round-6 window keys lacking a green row in CORRECTNESS_r06.json.
    Before the r6 gate runs this is (conservatively) empty — the tool is
    meant to run at round-7 start, after the file exists."""
    if not os.path.exists(CORRECTNESS_R06):
        return []
    rows = json.load(open(CORRECTNESS_R06))
    window = cur[:R6_WINDOW_LEN]
    misses = []
    for k in window:
        r = rows.get(k)
        ok = bool(r) and r.get("rows_match") and r.get("schema_match") and (
            r.get("hash_match") is not False
        ) and not r.get("err")
        if not ok:
            misses.append(k)
    return misses


def rotated() -> list[str]:
    cur = list(DRIVER_KEY_PRIORITY)
    i_over = cur.index(OVERFLOW_FIRST)
    i_green = cur.index(ALREADY_GREEN_FIRST)
    assert i_over < i_green, "overflow block must precede the green block"
    overflow = cur[i_over:i_green]
    misses = [k for k in _r6_misses(cur) if k not in overflow]
    window = misses + overflow + list(CANARIES)
    assert len(window) <= 50, (
        f"round-7 window is {len(window)} keys; the gate only reads ~50 — "
        "split across rounds instead"
    )
    fronted = set(window)
    rest = [k for k in cur if k not in fronted]
    new = window + rest
    # DRIVER_KEY_PRIORITY is a priority PREFIX: canaries may be drawn
    # from the implicit remainder (keys registered but not yet in the
    # tuple), so the union — not set(cur) alone — is the invariant.
    assert len(new) == len(set(new)) == len(set(cur) | set(CANARIES)), (
        "rotation lost or duplicated keys"
    )
    from mongodb_cdc_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    for c in CANARIES:
        assert c in QUERIES, f"canary {c} is not a registered key"
    assert tuple(new[len(window) - 3 : len(window)]) == CANARIES, (
        "canaries must close the window"
    )
    return new, len(window), len(misses), len(overflow)


def main() -> int:
    new, wlen, n_miss, n_over = rotated()
    if "--check" in sys.argv:
        print(
            f"rotation ok: {len(new)} keys, window {wlen} "
            f"({n_miss} r6 misses + {n_over} overflow additions + 3 "
            f"canaries), {len(new) - wlen} already-green behind"
        )
        return 0
    print("DRIVER_KEY_PRIORITY: tuple[str, ...] = (")
    print("    # --- round-7 window: r6 gate misses, then the round-6")
    print("    #     overflow additions in addition order ---")
    for i, k in enumerate(new):
        if i == wlen - 3:
            print("    # --- cross-round canaries at the window's end;")
            print("    #     round-7 additions insert BEFORE these ---")
        elif i == wlen:
            print("    # --- already driver-green, prior order ---")
        print(f'    "{k}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
