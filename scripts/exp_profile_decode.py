"""Profile the unrolled quantized decode step: per-op device-time totals.

Runs STEPS decode steps in one jitted fori_loop under jax.profiler and
prints the top device ops — the data behind the decode-roofline work
(VERDICT r2 item 1).  Env: BITS=4|8, CTX, STEPS (default 16), KV=bf16|int8, INDEX.
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

STEPS = int(os.environ.get("STEPS", "16"))
B = int(os.environ.get("B", "1"))
CTX = int(os.environ.get("CTX", "256"))
BITS = int(os.environ.get("BITS", "4"))
KV = os.environ.get("KV", "bf16")
INDEX = int(os.environ.get("INDEX", "0")) or None

cfg = gptj.GPTJConfig.gptj_6b(
    param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
    remat=False, attention_impl="flash", kv_cache_dtype=KV,
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

cache = gptj.init_kv_cache(cfg, B, CTX)


@jax.jit
def run(p, x0, cache):
    def step(i, carry):
        x, c = carry
        logits, c = gptj.forward(
            cfg, p, x, cache=c, cache_index=jnp.int32(INDEX or CTX // 2),
            remat=False,
        )
        return (x + logits[..., :1].astype(x.dtype) * 1e-30, c)
    out, _ = jax.lax.fori_loop(0, STEPS, step, (x0, cache))
    return out


x0 = jnp.ones((B, 1, 4096), jnp.bfloat16)
jax.block_until_ready(run(params, x0, cache))
t0 = time.time()
jax.block_until_ready(run(params, x0, cache))
wall = time.time() - t0
print(f"wall {wall/STEPS*1e3:.2f} ms/tok", flush=True)

logdir = "/tmp/decode_trace"
import shutil
shutil.rmtree(logdir, ignore_errors=True)
with profile_trace(logdir):
    jax.block_until_ready(run(params, x0, cache))

import re

rows = summarize_trace(logdir, top=int(os.environ.get("TOP", "400")))
# aggregate per-layer clones: strip SSA ids so 28 per-layer copies of the
# same op collapse into one row keyed by (opcode, result shape)
agg = {}
for r in rows:
    op = str(r["op"])
    m = re.match(r"%?([a-z_\-]+)[.\d]* = ([a-z0-9\[\],{}:()]+)", op)
    key = f"{m.group(1)} {m.group(2)[:40]}" if m else op[:60]
    a = agg.setdefault(key, [0.0, 0])
    a[0] += r["total_ms"]
    a[1] += r["count"]
tot = 0.0
out = []
for key, (ms, cnt) in agg.items():
    if key.startswith(("jit_run", "while")):  # parents double-count leaves
        continue
    tot += ms
    out.append((ms, cnt, key))
print(f"device leaf total: {tot:.2f} ms over {STEPS} steps "
      f"-> {tot/STEPS*1e3:.0f} us/tok", flush=True)
for ms, cnt, key in sorted(out, reverse=True):
    print(f"  {ms/STEPS*1e3:8.1f} us/tok  x{cnt:<5} {key}", flush=True)
