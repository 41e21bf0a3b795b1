#!/bin/bash
# Round-3 perf session: serialized TPU experiments (one process at a time,
# per the tunnel discipline).  Run from repo root; writes /tmp/r3_perf.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_perf.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1700 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" | tee -a "$LOG"
}

# 1. scan-vs-unroll matrix on the quantized 6B (full forward incl. head)
run BITS=8 CTX=256                      python scripts/exp_unroll.py
run BITS=8 CTX=2048 INDEX=1984 KV=int8  python scripts/exp_unroll.py
run BITS=4 CTX=2048 INDEX=1984 KV=int8  python scripts/exp_unroll.py

# 2. vision tower device-time profile (BN-folded serving path)
run STEPS=16 python scripts/exp_profile_vision.py

echo DONE | tee -a "$LOG"
