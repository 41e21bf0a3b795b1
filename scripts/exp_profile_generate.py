"""Profile generate_tokens vs the bare decode-forward loop, same weights.

The bare unrolled forward (head incl.) runs at ~6.9 ms/tok int4 but
bench.py's generate measures ~7.7 ms/tok + prefill — this captures both
under the device profiler with identical params to find where the extra
~0.8 ms/token goes (sampling machinery, lax.cond wrapper, rng fold-in,
token embed, while-loop overhead).  Env: BITS=4|8, STEPS (default 16).
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.observability import profile_trace, summarize_trace
from magma_tpu.ops.sampling import generate_tokens

STEPS = int(os.environ.get("STEPS", "16"))
BITS = int(os.environ.get("BITS", "4"))
CTX = 149  # bench.py's prompt length

cfg = gptj.GPTJConfig.gptj_6b(
    param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
    remat=False, attention_impl="flash",
)
print(f"init 6B + quantize int{BITS}...", flush=True)
params = jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
quant = (gptj.quantize_lm_params_int4 if BITS == 4
         else gptj.quantize_lm_params)
params = quant(params)
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()
print("quantized", flush=True)

emb = jax.jit(
    lambda k: (jax.random.normal(k, (1, CTX, cfg.d_model), jnp.float32)
               * 0.02).astype(jnp.bfloat16)
)(jax.random.PRNGKey(1))


def gen(seed):
    toks, n = generate_tokens(
        cfg, params, emb, jax.random.PRNGKey(seed), max_steps=STEPS,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1,
    )
    return jax.block_until_ready(toks)


# bare forward loop at the same cache geometry (prefill once, then STEPS
# single-token steps inside one jit)
cache_len = CTX + STEPS


def fwd_loop(params, emb):
    cache = gptj.init_kv_cache(cfg, 1, cache_len)
    hidden, cache = gptj.forward(
        cfg, params, emb, cache=cache, cache_index=jnp.int32(0),
        remat=False, return_hidden=True,
    )
    x0 = hidden[:, -1:].astype(jnp.bfloat16)

    def step(i, carry):
        x, c = carry
        logits, c = gptj.forward(
            cfg, params, x, cache=c, cache_index=jnp.int32(CTX) + i,
            remat=False,
        )
        return (x + logits[..., :1].astype(x.dtype) * 1e-30, c)

    out, _ = jax.lax.fori_loop(0, STEPS, step, (x0, cache))
    return out


f = jax.jit(fwd_loop)

t0 = time.time()
gen(0)
print(f"generate compile+run {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
jax.block_until_ready(f(params, emb))
print(f"fwd-loop compile+run {time.time() - t0:.1f}s", flush=True)

ts = []
for i in range(3):
    t0 = time.time()
    gen(i)
    ts.append(time.time() - t0)
tg = sorted(ts)[1]
print(f"generate: {tg:.3f}s for prefill+{STEPS} steps", flush=True)
ts = []
for i in range(3):
    t0 = time.time()
    out = f(params, emb)
    float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
    ts.append(time.time() - t0)
tf = sorted(ts)[1]
print(f"fwd-loop: {tf:.3f}s for prefill+{STEPS} steps "
      f"(delta {1e3*(tg-tf)/STEPS:.2f} ms/step)", flush=True)

with profile_trace("/tmp/gen_trace"):
    gen(7)
for row in summarize_trace("/tmp/gen_trace", top=30):
    per = row["total_ms"] * 1e3 / STEPS
    print(f"{per:9.1f} us/tok x{row['count']:<6} {row['op']}", flush=True)
print("DONE", flush=True)
