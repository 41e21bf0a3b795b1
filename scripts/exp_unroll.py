"""Experiment: unrolled s==1 decode + fused in_proj + bf16 adapters
(VERDICT r2 item 1).  Measures ms/token of the full decode forward
(cache read/write included, sampling/head excluded unless HEAD=1) for
scan-vs-unrolled layer loops on the quantized 6B.

Env: BITS=4|8 (default 4), CTX (default 256), B (default 1), STEPS=64,
KV=bf16|int8 (cache dtype), INDEX (decode cache position, default
CTX//2 — set near CTX to mimic long-context serving).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import jax
import jax.numpy as jnp

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec

STEPS = int(os.environ.get("STEPS", "64"))
B = int(os.environ.get("B", "1"))
CTX = int(os.environ.get("CTX", "256"))
BITS = int(os.environ.get("BITS", "4"))
HEAD = os.environ.get("HEAD", "1") == "1"
KV = os.environ.get("KV", "bf16")
INDEX = int(os.environ.get("INDEX", "0")) or None  # None -> CTX // 2

base_cfg = gptj.GPTJConfig.gptj_6b(
    param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
    remat=False, attention_impl="flash", kv_cache_dtype=KV,
)
print(f"init 6B + quantize int{BITS}...", flush=True)
t0 = time.time()
params = jax.jit(lambda k: gptj.init_params(k, base_cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
quant = (gptj.quantize_lm_params_int4 if BITS == 4
         else gptj.quantize_lm_params)
params = quant(params)
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()
print(f"init+quant done in {time.time() - t0:.1f}s", flush=True)


def bench(cfg, label, reps=3):
    cache = gptj.init_kv_cache(cfg, B, CTX)

    def run(p, x0, cache):  # params as jit ARG (closure-constant trap)
        def step(i, carry):
            x, c = carry
            if HEAD:
                logits, c = gptj.forward(
                    cfg, p, x, cache=c,
                    cache_index=jnp.int32(INDEX or CTX // 2), remat=False,
                )
                x = x + logits[..., :1].astype(x.dtype) * 1e-30
            else:
                h, c = gptj.forward(
                    cfg, p, x, cache=c,
                    cache_index=jnp.int32(INDEX or CTX // 2), remat=False,
                    return_hidden=True,
                )
                x = x + h[..., :1] * 1e-30
            return (x, c)
        out, _ = jax.lax.fori_loop(
            0, STEPS, step, (x0, cache)
        )
        return out

    f = jax.jit(run)
    x0 = jnp.ones((B, 1, 4096), jnp.bfloat16)
    t0 = time.time()
    jax.block_until_ready(f(params, x0, cache))
    print(f"[{label}] compile+run {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(params, x0, cache)
        float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS
    print(f"[{label}] {t*1e3:.2f} ms/tok -> {B/t:.1f} tok/s", flush=True)
    jax.clear_caches()
    return t


bench(dataclasses.replace(base_cfg, decode_unroll=False), "scan   ")
bench(dataclasses.replace(base_cfg, decode_unroll=True), "unroll ")
