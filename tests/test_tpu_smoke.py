"""On-chip smoke tests (``pytest -m tpu``, requires ``TPU_TESTS=1``).

The rest of the suite runs on the forced-CPU backend (conftest.py), where
the Pallas kernels take their XLA fallback paths — a Mosaic-breaking
kernel change lands green on CPU and only explodes in benches.  This
marker closes that hole: one subprocess (the suite's own process is
pinned to CPU, and the axon TPU is single-client) runs the hot kernels on
the real chip and compares them against their XLA references:

* flash attention forward AND backward vs the XLA path,
* int8 / int4 stacked matmul kernels vs the dequantized reference,
* one unrolled quantized decode step (cache write + static-slice read),
* one adapter train step (loss finite, grads flow through the int8 dx
  kernel).

Budget: a few minutes (dominated by TPU compiles).  Run explicitly:

    TPU_TESTS=1 python -m pytest -m tpu -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("TPU_TESTS"),
        reason="on-chip smoke: set TPU_TESTS=1 (needs the real TPU, "
               "~3 min of compiles)",
    ),
]

SMOKE = r"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform != "cpu", jax.devices()

# ---- flash attention fwd + bwd vs XLA ----
from magma_tpu.ops.attention import xla_attention
from magma_tpu.ops.flash_attention import flash_attention

q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 4, 128), jnp.float32)
k = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 4, 128), jnp.float32)
v = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 4, 128), jnp.float32)
kv_len = jnp.array([256, 190], jnp.int32)


def loss_flash(q, k, v):
    o = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16), scale=0.0883883,
                        causal=True, kv_len=kv_len)
    return jnp.sum(o.astype(jnp.float32) ** 2)


def loss_xla(q, k, v):
    o = xla_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16), scale=0.0883883,
                      causal=True, kv_len=kv_len)
    return jnp.sum(o.astype(jnp.float32) ** 2)


lf, gf = jax.jit(jax.value_and_grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
lx, gx = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
assert abs(float(lf) - float(lx)) / abs(float(lx)) < 2e-2, (lf, lx)
for a, b in zip(gf, gx):
    d = float(jnp.max(jnp.abs(a - b)))
    s = float(jnp.max(jnp.abs(b))) + 1e-6
    assert d / s < 6e-2, (d, s)
print("flash fwd+bwd ok", flush=True)

# ---- int8 / int4 stacked matmuls vs dequant reference ----
from magma_tpu.ops.quant import (dequantize_int4, int4_matmul_stacked,
                                 int8_matmul_stacked, quantize_int4,
                                 quantize_int8)

w = jax.random.normal(jax.random.PRNGKey(3), (2, 1024, 512)) * 0.02
x = jax.random.normal(jax.random.PRNGKey(4), (8, 1024), jnp.bfloat16)
q8 = quantize_int8(w)
for li in range(2):
    ref = x.astype(jnp.float32) @ (
        q8["q"][li].astype(jnp.float32) * q8["s"][li][None]
    )
    out = jax.jit(int8_matmul_stacked, static_argnames=())(
        x, q8["q"], q8["s"], li
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
q4 = jax.lax.map(quantize_int4, w)
for li in range(2):
    ref = x.astype(jnp.float32) @ dequantize_int4(q4["q4"][li], q4["s4"][li])
    out = int4_matmul_stacked(x, q4["q4"], q4["s4"], li)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
print("int8/int4 stacked matmul ok", flush=True)

# ---- one unrolled quantized decode step vs the scan path ----
import dataclasses

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec

cfg = gptj.GPTJConfig.gptj_6b(
    n_layers=2, param_dtype=jnp.bfloat16,
    mlp_adapter=AdapterSpec("normal", 4), remat=False,
)
params = gptj.quantize_lm_params(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
)
emb = (jax.random.normal(jax.random.PRNGKey(5), (1, 1, cfg.d_model))
       * 0.02).astype(jnp.bfloat16)
outs = {}
for unroll in (False, True):
    c = dataclasses.replace(cfg, decode_unroll=unroll)
    cache = gptj.init_kv_cache(c, 1, 128)
    logits, cache2 = jax.jit(
        lambda p, e, cache, c=c: gptj.forward(
            c, p, e, cache=cache, cache_index=jnp.int32(64), remat=False
        )
    )(params, emb, cache)
    outs[unroll] = np.asarray(logits[:, -1], np.float32)
    assert np.isfinite(outs[unroll]).all()
# unroll and scan schedule bf16 reductions differently; logits agree to
# bf16 noise and the greedy decision is identical (token-identity over
# whole generations is asserted separately in /tmp-style verify drives)
np.testing.assert_allclose(outs[True], outs[False], atol=0.05, rtol=0.1)
assert outs[True].argmax(-1).tolist() == outs[False].argmax(-1).tolist()
print("unrolled decode step ok", flush=True)

# ---- one adapter train step: loss finite, grads flow through int8 dx ----
# training layout: fuse_out_proj=False keeps o/fc_out separately
# differentiable (the fused dual-output serving kernel has no VJP)
params = gptj.quantize_lm_params(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0)),
    fuse_out_proj=False,
)


def loss_fn(p, emb):
    logits, _ = gptj.forward(cfg, p, emb, remat=False)
    return jnp.mean(logits.astype(jnp.float32) ** 2) * 1e-3


emb_t = (jax.random.normal(jax.random.PRNGKey(6), (1, 32, cfg.d_model))
         * 0.02).astype(jnp.bfloat16)
ad = params["blocks"]["adapter_mlp"]


def ad_loss(a, frozen, e):  # frozen params as ARGS (closure-constant trap)
    p = {**frozen, "blocks": {**frozen["blocks"], "adapter_mlp": a}}
    return loss_fn(p, e)


g = jax.jit(jax.grad(ad_loss))(ad, params, emb_t)
gn = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
               for l in jax.tree_util.tree_leaves(g)))
assert np.isfinite(gn) and gn > 0, gn
print("train-step grads ok", flush=True)
print("TPU SMOKE OK", flush=True)
"""


def test_tpu_smoke():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    # prepend the repo root but KEEP the original entries — the TPU
    # plugin registers via a sitecustomize on the inherited PYTHONPATH
    repo = os.path.dirname(os.path.dirname(__file__))
    inherited = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + inherited if inherited else "")
    for attempt in range(2):
        out = subprocess.run(
            [sys.executable, "-c", SMOKE], env=env, text=True,
            capture_output=True, timeout=900,
        )
        if out.returncode == 0:
            break
        # the tunneled single-client TPU occasionally reports a transient
        # FAILED_PRECONDITION on the first D2H fetch right after another
        # process released the chip (seen once in the r5 gate run;
        # standalone rerun passed) — retry once before declaring failure
        if "FAILED_PRECONDITION" not in out.stderr or attempt:
            break
        import time

        time.sleep(10)
    assert out.returncode == 0, f"smoke failed:\n{out.stdout}\n{out.stderr}"
    assert "TPU SMOKE OK" in out.stdout
