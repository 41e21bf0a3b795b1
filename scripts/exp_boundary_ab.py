"""A/B the boundary-fused decode path vs the 3-launch path in-process.

Times the jitted [fori_loop of STEPS decode forwards] with and without
blocks["bvecs"] (whose presence gates gptj._run_decode_boundary), on the
same quantized params, plus a generate_tokens end-to-end timing for both.

Env: STEPS (default 32), CTX (default 256), B (default 1).
Run: python scripts/exp_boundary_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import generate_tokens

STEPS = int(os.environ.get("STEPS", "32"))
CTX = int(os.environ.get("CTX", "256"))
B = int(os.environ.get("B", "1"))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    cfg = gptj.GPTJConfig.gptj_6b(
        param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
        remat=False, attention_impl="flash",
    )
    print("init 6B + int4...", flush=True)
    params = jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params["wte"])
    params = gptj.quantize_lm_params_int4(params)
    jax.block_until_ready(params["blocks"]["attn"]["in_proj"]["q4"])

    cache = gptj.init_kv_cache(cfg, B, CTX)
    x0 = jnp.ones((B, 1, 4096), jnp.bfloat16) * 0.01

    @jax.jit
    def loop(p, x0, cache):
        def step(i, carry):
            x, c = carry
            logits, c = gptj.forward(
                cfg, p, x, cache=c, cache_index=jnp.int32(CTX // 2),
                remat=False)
            return (x + logits[..., :1].astype(x.dtype) * 1e-30, c)
        out, _ = jax.lax.fori_loop(0, STEPS, step, (x0, cache))
        return out

    prompt = jnp.ones((B, 149, 4096), jnp.bfloat16) * 0.01

    def bench_loop(tag, p):
        t0 = time.time()
        # scalar fetch = real sync; block_until_ready does not truly wait
        # on the tunneled transport (see bench.py)
        float(loop(p, x0, cache).astype(jnp.float32).sum())
        print(f"  [{tag} loop] compile+run {time.time()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(loop(p, x0, cache).astype(jnp.float32).sum())
            ts.append(time.time() - t0)
        t = sorted(ts)[1] / STEPS * 1e3
        print(f"  [{tag} loop] {t:.2f} ms/tok", flush=True)

    def bench_gen(tag, p):
        def run(seed):
            toks, steps = generate_tokens(
                cfg, p, prompt, jax.random.PRNGKey(seed), max_steps=64,
                temperature=0.0, top_k=0, top_p=0.0, eos_token=-1)
            assert int(steps) == 64  # scalar fetch = real sync
            return toks
        t0 = time.time()
        run(0)
        print(f"  [{tag} gen] compile+run {time.time()-t0:.0f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.time()
            run(i)
            ts.append(time.time() - t0)
        t = sorted(ts)[1]
        print(f"  [{tag} gen] p50 {t:.3f}s -> {B*64/t:.1f} tok/s", flush=True)

    bench_loop("boundary", params)
    bench_gen("boundary", params)
    bv = params["blocks"].pop("bvecs")
    jax.clear_caches()
    bench_loop("3-launch", params)
    bench_gen("3-launch", params)
    params["blocks"]["bvecs"] = bv


if __name__ == "__main__":
    main()
