"""On-chip boundary-kernel parity gate (``pytest -m tpu``, TPU_TESTS=1).

The default suite runs on the forced-CPU backend where
``boundary_fused_stacked`` always takes its ``_boundary_ref`` fallback —
a regression in ``_boundary_kernel`` or its BlockSpec wiring would stay
green (ADVICE r4).  This test runs the full ``scripts/
check_boundary_kernel.py`` case matrix (kernel vs the unfused reference,
all adapter/o_bias/w_in combinations) on the real chip and asserts every
reported relative error, so the on-chip verify sweep catches kernel
drift automatically.
"""

import os
import re
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("TPU_TESTS"),
        reason="on-chip boundary-kernel gate: set TPU_TESTS=1 (needs the "
               "real TPU, ~2 min of compiles)",
    ),
]

# kernel vs _boundary_ref run the SAME W4A8 math, but 1-ulp bf16
# differences in intermediates (u, adapter inputs) land on activation-
# quantization decision boundaries and flip individual int8 levels, so
# per-element drift is bf16-ulp-scale, not bit-zero: measured 6.3e-3 to
# 1.0e-2 across the case matrix (2026-08, v5e).  2e-2 catches structural
# regressions (wrong block, wrong scale row) which show up as >=1e-1.
REL_TOL = 2e-2


def test_boundary_kernel_case_matrix_on_chip():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inherited = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + inherited if inherited else "")
    script = os.path.join(repo, "scripts", "check_boundary_kernel.py")
    out = subprocess.run(
        [sys.executable, script], env=env, text=True,
        capture_output=True, timeout=1200,
    )
    assert out.returncode == 0, f"check failed:\n{out.stdout}\n{out.stderr}"
    assert "done" in out.stdout
    case_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith("[")]
    # 5 cases x {mid, last}
    assert len(case_lines) == 10, out.stdout
    for ln in case_lines:
        errs = [float(t) for t in re.findall(r"\d\.\d+e[+-]\d+", ln)]
        assert errs, ln
        assert max(errs) <= REL_TOL, f"kernel drift: {ln}"
