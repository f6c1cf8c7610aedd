#!/usr/bin/env python
"""Prune one-run scratch artifacts (round-9 hygiene).

`new_scratch_dir` mints a fresh `<prefix>_<12-hex-uuid>` directory per
streaming run (checkpoints, per-run sinks, DLQ targets). They are
transient by construction — nothing ever reads another run's uuid dir —
but across rounds they accumulate (round-9 start: 1,165 dirs of the
.scratch listing's 1,018 entries... after round 8), growing directory
listings and disk. Persistent STORES (signature/gate/postings/IVF/PQ/
edge, replicas, changelog/feed caches) use deterministic names without
the uuid suffix and are never touched.

Deletes only directories matching `^.*_[0-9a-f]{12}$` whose mtime is
older than --age-hours (default 6). Run at round close or any time no
Spark session is mid-run. A standing deployment runs the same policy as
a cron beside its checkpoints retention.

Usage: python tools/scratch_janitor.py [--age-hours N] [--dry-run]
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_spark.sources.changefeed import scratch_root  # noqa: E402

UUID_DIR = re.compile(r"^.+_[0-9a-f]{12}$")
# a store build that crashed between write and publish leaves its
# private stage dir behind (`<store>.stage-<8-hex>`); new_stage reclaims
# stale siblings of the SAME store on the next build, but a store never
# rebuilt again would keep its orphan forever — sweep them here too
STAGE_DIR = re.compile(r"^.+\.stage-[0-9a-f]{8}$")


def main() -> None:
    age_h = 6.0
    for a in sys.argv[1:]:
        if a.startswith("--age-hours"):
            age_h = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1]
            )
    dry = "--dry-run" in sys.argv
    root = scratch_root()
    cutoff = time.time() - age_h * 3600
    n, freed = 0, 0
    for name in os.listdir(root):
        if not (UUID_DIR.match(name) or STAGE_DIR.match(name)):
            continue
        path = os.path.join(root, name)
        if not os.path.isdir(path):
            continue
        try:
            if os.path.getmtime(path) >= cutoff:
                continue
        except OSError:
            continue
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _dn, fn in os.walk(path)
            for f in fn
        )
        if not dry:
            shutil.rmtree(path, ignore_errors=True)
        n += 1
        freed += size
    print(
        f"{'would prune' if dry else 'pruned'} {n} one-run dirs, "
        f"{freed / 1e6:.1f} MB (age > {age_h:g} h)"
    )


if __name__ == "__main__":
    main()
