"""On-chip decode-layer kernel parity gates (``pytest -m tpu``,
TPU_TESTS=1).

The default suite runs on the forced-CPU backend where both
``decode_layer_fused`` (whole-layer launch) and
``decode_all_layers_fused`` (all-layers megakernel) take their XLA
reference fallbacks — a regression in the Pallas bodies or their
BlockSpec wiring would stay green.  These tests run the full case
matrices of ``scripts/check_declayer_kernel.py`` and
``scripts/check_alllayer_kernel.py`` (kernel vs unfused oracle across
int4/int8 weights x bf16/int8 KV x adapter variants) on the real chip
and assert every reported relative error.
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
        reason="on-chip decode-layer kernel gates: set TPU_TESTS=1 (needs "
               "the real TPU, several minutes of Mosaic compiles)",
    ),
]

# same rationale as tests/test_boundary_tpu.py: identical W4A8 math, but
# bf16-ulp intermediate differences land on activation-quantization
# decision boundaries, so per-element drift is quantization-step-scale.
# The all-layers check chains 3 layers of epilogues, compounding it.
REL_TOL_LAYER = 2e-2
REL_TOL_STACK = 6e-2


def _run_check(script_name, timeout):
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inherited = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + inherited if inherited else "")
    script = os.path.join(repo, "scripts", script_name)
    out = subprocess.run(
        [sys.executable, script], env=env, text=True,
        capture_output=True, timeout=timeout,
    )
    assert out.returncode == 0, f"check failed:\n{out.stdout}\n{out.stderr}"
    assert "done" in out.stdout
    return [ln for ln in out.stdout.splitlines() if ln.startswith("[")]


def test_declayer_kernel_case_matrix_on_chip():
    case_lines = _run_check("check_declayer_kernel.py", 2400)
    assert len(case_lines) == 8, "\n".join(case_lines)
    for ln in case_lines:
        errs = [float(t) for t in re.findall(r"\d\.\d+e[+-]\d+", ln)]
        assert errs, ln
        assert max(errs) <= REL_TOL_LAYER, f"kernel drift: {ln}"


def test_alllayer_megakernel_case_matrix_on_chip():
    case_lines = _run_check("check_alllayer_kernel.py", 2400)
    assert len(case_lines) == 5, "\n".join(case_lines)
    for ln in case_lines:
        errs = [float(t) for t in re.findall(r"\d\.\d+e[+-]\d+", ln)]
        assert errs, ln
        assert max(errs) <= REL_TOL_STACK, f"megakernel drift: {ln}"
