"""Round-6 rotation generator for DRIVER_KEY_PRIORITY (registry.py).

The external CORRECTNESS gate walks ``queries()`` in insertion order and
only reaches the first ~50 keys, so each round fronts the keys that need
driver rows. This tool mechanically produces the ROUND-6 ordering from
the live round-5 tuple, following the ROUND-6 WINDOW comment frozen in
registry.py at round-5 close:

  positions 1-13:  the frozen never-driver-checked tail
                   (ext_dedup_verify_jaccard .. agg_skyline_pareto)
  positions 14-29: the 16 round-5 additions, in addition order
                   (ext_dedup_cluster_from_store ..
                    ext_semantic_dedup_from_store)
  positions 30-37: the 8 TPC-H queries whose plans were rewritten in
                   round 5 (q2 q11 q13 q15 q17 q18 q21 q22) — their r4
                   driver rows predate the rewrites and must be
                   re-proved
  positions 38-40: three untouched cross-round canaries from distinct
                   tiers (windows / streaming / UDF), at the window's
                   end. Round-6 additions, if any, are inserted BEFORE
                   the canaries so the canaries stay at the end of the
                   live gate window.
  positions 41+:   every remaining key (already driver-green), in the
                   prior order.

Run:    python tools/rotate_registry.py          # print the new tuple body
        python tools/rotate_registry.py --check  # verify invariants only

The output REPLACES the tuple body in registry.py at round-6 start
(rotate at round START: the round-5 driver gate read the round-5
ordering at round end). After pasting, re-run the full gate sim — the
rotation must never change results, only order.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.registry import DRIVER_KEY_PRIORITY  # noqa: E402

# Frozen 13-key never-driver-checked tail (round-5 positions 51-63).
FROZEN_TAIL = (
    "ext_dedup_verify_jaccard",
    "scan_compressed_jsonl",
    "ext_semantic_window_recall",
    "ext_token_budget_fill",
    "ext_source_cap",
    "ext_embed_knn_eval",
    "stat_ab_ttest",
    "ts_changepoint_cusum",
    "stat_benford_digits",
    "stream_static_enrich",
    "join_asof_nearest",
    "stat_ks_drift",
    "agg_skyline_pareto",
)
R5_ADDITIONS_FIRST = "ext_dedup_cluster_from_store"  # tuple-tail block start
# Round-5 plan rewrites whose r4 driver rows are stale (numeric order).
CHANGED_TPCH = (
    "sql_tpch_q2",
    "sql_tpch_q11",
    "sql_tpch_q13",
    "sql_tpch_q15",
    "sql_tpch_q17",
    "sql_tpch_q18",
    "sql_tpch_q21",
    "sql_tpch_q22",
)
# Fresh canaries: untouched since their r1/r2 green rows, three distinct
# tiers (windows / streaming / UDF); never previously used as canaries.
CANARIES = ("win_latest_per_key", "stream_dedup_keys", "udf_pandas_scalar")


def rotated() -> list[str]:
    cur = list(DRIVER_KEY_PRIORITY)
    i_adds = cur.index(R5_ADDITIONS_FIRST)
    r5_adds = cur[i_adds:]  # 16 round-5 additions, in addition order
    window = list(FROZEN_TAIL) + r5_adds + list(CHANGED_TPCH) + list(CANARIES)
    fronted = set(window)
    rest = [k for k in cur if k not in fronted]
    new = window + rest
    assert len(new) == len(set(new)) == len(set(cur) | set(CANARIES)), (
        "rotation lost or duplicated keys"
    )
    assert len(r5_adds) == 16, f"expected 16 round-5 additions, got {len(r5_adds)}"
    assert len(window) == 40, f"window is {len(window)}, expected 40"
    assert tuple(new[37:40]) == CANARIES, "canaries must close the window"
    return new


def main() -> int:
    new = rotated()
    if "--check" in sys.argv:
        print(
            f"rotation ok: {len(new)} keys, window 1-13 frozen tail, "
            f"14-29 round-5 additions, 30-37 rewritten TPC-H, "
            f"38-40 canaries, 41+ already-green ({len(new) - 40} keys)"
        )
        return 0
    print("DRIVER_KEY_PRIORITY: tuple[str, ...] = (")
    print("    # --- round-6 window: 13-key frozen never-checked tail ---")
    for i, k in enumerate(new):
        if i == 13:
            print("    # --- 16 round-5 additions, in addition order ---")
        elif i == 29:
            print("    # --- 8 round-5-rewritten TPC-H queries (stale r4 rows) ---")
        elif i == 37:
            print("    # --- cross-round canaries at the window's end;")
            print("    #     round-6 additions insert BEFORE these ---")
        elif i == 40:
            print("    # --- already driver-green (full coverage at r6) ---")
        print(f'    "{k}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
