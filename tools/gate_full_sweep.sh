#!/bin/bash
# Full-registry hostile gate sweep, chunked into fresh 40-key processes.
#
# One process cannot walk all 260+ keys: every toPandas() leaves
# short-lived JVM serve threads behind, and ~125 keys in, thread creation
# hits the container pid limit (std::system_error "Resource temporarily
# unavailable" — see driver_gate_sim.py --skip). CHUNK=40 stays near the
# real gate's ~50-key window while keeping JVM peak thread count clear
# of the pid ceiling (the streaming-tier chunk is the heaviest; 50-key
# chunks sat right ON the cliff, hence 40).
#
# A failing chunk prints its FAIL lines and is retried ONCE in a fresh
# process (streaming e2e keys can flake under load); a repeat failure is
# real and fails the sweep.
#
# Usage: tools/gate_full_sweep.sh [sf_dir]   (default /root/testdata/sf0.01)
# Exit: non-zero if any chunk still has failures after one retry.
set -u
SF="${1:-/root/testdata/sf0.01}"
cd "$(dirname "$0")/.."
TOTAL=$(python - <<'EOF'
import sys; sys.path.insert(0, ".")
import __spark_entry__ as e
print(len(e.queries()))
EOF
)
CHUNK=40
rc=0
passed=0

run_chunk() { # $1=skip -> sets CHUNK_OUT, returns 0 if all pass
    CHUNK_OUT=$(python tools/driver_gate_sim.py "$SF" --hostile \
        --skip "$1" --first "$CHUNK" 2>/dev/null)
    echo "$CHUNK_OUT" | tail -1 | grep -qE '^([0-9]+)/\1 pass'
}

for ((skip=0; skip<TOTAL; skip+=CHUNK)); do
    # settle: let the previous chunk's JVM fully tear down its thread
    # pools before the next one forks — overlapping shutdown/startup is
    # what exhausts the shared pid budget
    sleep 15
    if run_chunk "$skip"; then
        echo "chunk skip=$skip: $(echo "$CHUNK_OUT" | tail -1)"
    else
        echo "chunk skip=$skip FAILED (tail below), retrying once:"
        echo "$CHUNK_OUT" | grep -E "FAIL"
        echo "$CHUNK_OUT" | tail -3
        sleep 60
        if run_chunk "$skip"; then
            echo "chunk skip=$skip retry: $(echo "$CHUNK_OUT" | tail -1)"
        else
            echo "chunk skip=$skip retry FAILED:"
            echo "$CHUNK_OUT" | grep -E "FAIL"
            echo "$CHUNK_OUT" | tail -3
            rc=1
        fi
    fi
    n=$(echo "$CHUNK_OUT" | tail -1 | sed -n 's#^\([0-9]*\)/.*#\1#p')
    passed=$((passed + ${n:-0}))
done
echo "TOTAL: $passed/$TOTAL pass at $SF"
exit $rc
