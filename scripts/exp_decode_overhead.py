"""Experiment: decompose int8 b=1 decode step time (VERDICT r1 follow-up).

Roofline: qkv 50MB + o 17MB + fc_in 67MB + fc_out 67MB int8 per layer
= ~201MB -> ~245us/layer at 819 GB/s; x28 + head 0.2GB = ~7.15 ms/token.
Measured ~10.4 ms/token.  This isolates: (a) the 4 stacked int8 matmuls
alone, (b) + LN/rotary/residual small ops, (c) full block incl. attention
and cache write.  64 iterations inside one jit; divide by 64.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.quant import int8_matmul_stacked

STEPS = 64
B = int(os.environ.get("B", "1"))

lm_cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                                 mlp_adapter=AdapterSpec("normal", 4),
                                 remat=False, attention_impl="flash")
params = jax.jit(lambda k: gptj.quantize_lm_params(
    gptj.init_params(k, lm_cfg)))(jax.random.PRNGKey(0))
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()
print("init ok", flush=True)

blocks = params["blocks"]
qkv, o = blocks["attn"]["qkv"], blocks["attn"]["o"]
fc_in = blocks["mlp"]["fc_in"]["kernel"]
fc_out = blocks["mlp"]["fc_out"]["kernel"]


def bench(fn, label, reps=3):
    f = jax.jit(fn)
    x0 = jnp.ones((B, 1, 4096), jnp.bfloat16)
    out = f(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(x0)
        float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS
    print(f"[{label}] {t*1e3:.2f} ms/tok", flush=True)
    return t


# (a) matmuls only, scanning layers
def mm_only(x0):
    def step(i, x):
        def layer(carry, idx):
            u = carry.reshape(B, 4096)
            f = int8_matmul_stacked(u, qkv["q"], qkv["s"], idx,
                                    out_dtype=jnp.bfloat16)
            a = int8_matmul_stacked(f[:, :4096], o["q"], o["s"], idx,
                                    out_dtype=jnp.bfloat16)
            m = int8_matmul_stacked(u, fc_in["q"], fc_in["s"], idx,
                                    out_dtype=jnp.bfloat16)
            m = int8_matmul_stacked(m, fc_out["q"], fc_out["s"], idx,
                                    out_dtype=jnp.bfloat16)
            return (carry + (a + m).reshape(B, 1, 4096)).astype(carry.dtype), None
        x, _ = jax.lax.scan(layer, x, jnp.arange(lm_cfg.n_layers))
        return x
    return jax.lax.fori_loop(0, STEPS, step, x0)


# (b) matmuls + head
def mm_head(x0):
    def step(i, x):
        x = mm_body(x)
        logits = gptj.lm_head(lm_cfg, params, x)
        return (x + logits[..., :1] * 0).astype(x.dtype)
    def mm_body(x):
        def layer(carry, idx):
            u = carry.reshape(B, 4096)
            f = int8_matmul_stacked(u, qkv["q"], qkv["s"], idx,
                                    out_dtype=jnp.bfloat16)
            a = int8_matmul_stacked(f[:, :4096], o["q"], o["s"], idx,
                                    out_dtype=jnp.bfloat16)
            m = int8_matmul_stacked(u, fc_in["q"], fc_in["s"], idx,
                                    out_dtype=jnp.bfloat16)
            m = int8_matmul_stacked(m, fc_out["q"], fc_out["s"], idx,
                                    out_dtype=jnp.bfloat16)
            return (carry + (a + m).reshape(B, 1, 4096)).astype(carry.dtype), None
        x, _ = jax.lax.scan(layer, x, jnp.arange(lm_cfg.n_layers))
        return x
    return jax.lax.fori_loop(0, STEPS, step, x0)


# (c) the real decode forward (cache + sampling excluded): one token step
cache = gptj.init_kv_cache(lm_cfg, B, 256)


def full_fwd(x0):
    def step(i, carry):
        x, cache_c = carry
        logits, new_cache = gptj.forward(
            lm_cfg, params, x, cache=cache_c, cache_index=jnp.int32(128),
            remat=False,
        )
        return (x + logits[..., :1].astype(x.dtype) * 0, new_cache)
    out, _ = jax.lax.fori_loop(0, STEPS, step, (x0, cache))
    return out


bench(mm_only, "4 matmuls x 28 layers")
bench(mm_head, "+ lm_head")
bench(full_fwd, "full fwd (ctx 256, incl. cache write)")
