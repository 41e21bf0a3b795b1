"""A/B the int8 prefill: fused [q|k|v|fc_in] in_proj vs the round-2
split qkv + fc_in layout, at a long prompt (s=1984).

The round-3 in_proj fusion targets DECODE (one kernel launch per layer
instead of four at M=1); this measures whether it hurt large-M prefill
(suspected cause of the long-ctx bench regression 74.5 -> 64.2 tok/s,
whose decode side barely moved).  Env: S (default 1984), REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec

S = int(os.environ.get("S", "1984"))
REPS = int(os.environ.get("REPS", "3"))

cfg = gptj.GPTJConfig.gptj_6b(
    param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
    remat=False, attention_impl="flash",
)
print("init 6B + quantize int8...", flush=True)
params = gptj.quantize_lm_params(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
)
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()

emb = jax.jit(
    lambda k: (jax.random.normal(k, (1, S, cfg.d_model), jnp.float32)
               * 0.02).astype(jnp.bfloat16)
)(jax.random.PRNGKey(1))
jax.block_until_ready(emb)


def bench(params, label):
    def run(p, e):
        cache = gptj.init_kv_cache(cfg, 1, S + 64)
        h, cache = gptj.forward(
            cfg, p, e, cache=cache, cache_index=jnp.int32(0),
            remat=False, return_hidden=True,
        )
        return h[:, -1]

    f = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(f(params, emb))
    print(f"[{label}] compile+run {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = f(params, emb)
        float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"[{label}] prefill s={S}: {t*1e3:.1f} ms", flush=True)
    jax.clear_caches()
    return t


t_fused = bench(params, "in_proj fused")

# split back into the round-2 layout: qkv (3D) + separate fc_in
D = cfg.d_model
ip = params["blocks"]["attn"].pop("in_proj")
split = jax.jit(lambda ip: (
    {"q": ip["q"][:, :, : 3 * D], "s": ip["s"][:, : 3 * D]},
    {"q": ip["q"][:, :, 3 * D:], "s": ip["s"][:, 3 * D:]},
))(ip)
params["blocks"]["attn"]["qkv"], params["blocks"]["mlp"]["fc_in"]["kernel"] = (
    jax.block_until_ready(split)
)
del ip, split

t_split = bench(params, "qkv + fc_in  ")
print(f"fused/split ratio: {t_fused/t_split:.3f}", flush=True)
print("DONE", flush=True)
