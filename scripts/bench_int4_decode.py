"""Focused bench: 6B int4 decode throughput (the boundary-kernel path).

Subset of bench.py stage (c): init the 6B LM, quantize to int4, measure
greedy decode tok/s at b=1 and b=8 for a 149-token prompt.

Run: python scripts/bench_int4_decode.py
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    lm_cfg = gptj.GPTJConfig.gptj_6b(
        param_dtype=jnp.bfloat16,
        mlp_adapter=AdapterSpec("normal", 4),
        remat=False, attention_impl="flash",
    )
    print("init 6B...", flush=True)
    t0 = time.time()
    lm_params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(lm_params["wte"])
    print(f"init {time.time()-t0:.0f}s; quantizing int4...", flush=True)
    lm_params = gptj.quantize_lm_params_int4(lm_params)
    jax.block_until_ready(lm_params["blocks"]["attn"]["in_proj"]["q4"])
    if os.environ.get("OLD_PATH"):  # A/B: force the pre-boundary 3-launch path
        lm_params["blocks"].pop("bvecs")
        print("(old 3-launch path)", flush=True)

    prompt = jax.random.normal(
        jax.random.PRNGKey(1), (1, 149, 4096), jnp.bfloat16) * 0.02
    max_steps = int(os.environ.get("BENCH_STEPS", "64"))
    batches = tuple(
        int(x) for x in os.environ.get("BENCH_BATCHES", "1,8").split(","))
    for b in batches:
        pb = jnp.broadcast_to(prompt, (b, *prompt.shape[1:]))
        jax.clear_caches()

        def run(seed):
            toks, steps = generate_tokens(
                lm_cfg, lm_params, pb, jax.random.PRNGKey(seed),
                max_steps=max_steps, temperature=0.0, top_k=0, top_p=0.0,
                eos_token=-1)
            jax.block_until_ready(toks)
            assert int(steps) == max_steps
            return toks

        t0 = time.time()
        run(0)
        print(f"[int4 b={b}] compile+run {time.time()-t0:.0f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.time()
            run(i)
            ts.append(time.time() - t0)
        t = sorted(ts)[1]
        print(f"[int4 b={b}] p50 {t:.3f}s -> {b*max_steps/t:.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
