#!/usr/bin/env bash
# Release-gate runner (VERDICT r4 item 7): runs the gate suites and
# appends a timestamped pass/fail record per gate to GATES.log at the
# repo root, so gate status is a committed artifact instead of a human
# checklist (the r3 red-HEAD incident is what unenforced gates rot
# into).
#
# Usage:
#   scripts/run_gates.sh            # fast suite + slow gates (+ tpu if chip)
#   scripts/run_gates.sh --fast     # fast suite only (~10 min on 1 core)
#   scripts/run_gates.sh --full     # also FIDELITY_FULL (~87 min fp32/1core)
#
# Each line of GATES.log:  <utc-iso> <commit> <gate> <PASS|FAIL> <secs>s
set -u
cd "$(dirname "$0")/.."
LOG=GATES.log
COMMIT=$(git rev-parse --short HEAD 2>/dev/null || echo nogit)
MODE="${1:-default}"

run_gate() {
  local name="$1"; shift
  local t0=$(date +%s)
  echo "=== gate: $name ($*)" >&2
  if "$@" > "/tmp/gate_${name}.log" 2>&1; then
    local st=PASS
  else
    local st=FAIL
  fi
  local dt=$(( $(date +%s) - t0 ))
  echo "$(date -u +%Y-%m-%dT%H:%M:%SZ) ${COMMIT} ${name} ${st} ${dt}s" | tee -a "$LOG"
  [ "$st" = FAIL ] && { echo "--- tail of /tmp/gate_${name}.log:" >&2; tail -30 "/tmp/gate_${name}.log" >&2; }
  [ "$st" = PASS ]
}

overall=0
run_gate fast python -m pytest tests/ -q || overall=1

if [ "$MODE" != "--fast" ]; then
  run_gate slow python -m pytest tests/ -q -m slow || overall=1
  # on-chip kernel bit-checks, only when a TPU is actually reachable
  if python - <<'EOF' >/dev/null 2>&1
import jax; assert jax.devices()[0].platform != "cpu"
EOF
  then
    run_gate tpu env TPU_TESTS=1 python -m pytest tests/ -q -m tpu || overall=1
  else
    echo "$(date -u +%Y-%m-%dT%H:%M:%SZ) ${COMMIT} tpu SKIP(no-chip) 0s" | tee -a "$LOG"
  fi
fi

if [ "$MODE" = "--full" ]; then
  run_gate fidelity_full env FIDELITY_FULL=1 \
    python -m pytest tests/test_full_pipeline_fidelity.py -q -m slow || overall=1
fi

exit $overall
