"""Profile the BN-folded RN50x16@384 serving tower: device-time per op.

The bench measures ~28 ms p50 including the tunneled host sync; expected
conv compute is ~1-2 ms bf16.  This captures STEPS encoder calls (as one
in-jit fori_loop to amortize dispatch, then as individual dispatches)
under jax.profiler and prints the top device ops — separating real
device time from tunnel/dispatch overhead.  Env: STEPS (default 16).
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from magma_tpu.models import image_prefix as ip_mod
from magma_tpu.observability import profile_trace, summarize_trace
from magma_tpu.ops.preprocess import clip_preprocess

STEPS = int(os.environ.get("STEPS", "16"))

cfg = ip_mod.ImagePrefixConfig(
    encoder_name="clip_resnet_large", out_dim=4096,
    dropout_prob=0.1, use_layernorm=True,
)
params, stats = jax.jit(lambda k: ip_mod.init_params(k, cfg))(
    jax.random.PRNGKey(1)
)
params = jax.jit(lambda p, s: ip_mod.fold_for_serving(p, s, cfg))(
    params, stats
)
raw = jax.random.randint(
    jax.random.PRNGKey(2), (1, 480, 640, 3), 0, 256, jnp.uint8
)


@jax.jit
def one(raw, params, stats):
    pixels = clip_preprocess(raw, 384)
    emb, _ = ip_mod.apply(params, stats, pixels, cfg, train=False)
    return emb


@jax.jit
def many(raw, params, stats):
    def body(i, acc):
        pixels = clip_preprocess(raw, 384)
        emb, _ = ip_mod.apply(params, stats, pixels, cfg, train=False)
        return acc + emb.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))


print("compiling...", flush=True)
jax.block_until_ready(one(raw, params, stats))
t0 = time.time()
float(many(raw, params, stats))
print(f"many compile+run {time.time() - t0:.1f}s", flush=True)

# amortized: STEPS encoder passes inside one dispatch
ts = []
for _ in range(3):
    t0 = time.time()
    float(many(raw, params, stats))
    ts.append(time.time() - t0)
t = sorted(ts)[1] / STEPS
print(f"in-jit amortized: {t*1e3:.2f} ms/encode", flush=True)

# individual dispatches (what bench.py measures)
ts = []
for _ in range(5):
    t0 = time.time()
    e = one(raw, params, stats)
    float(e.astype(jnp.float32).sum())
    ts.append(time.time() - t0)
print(f"per-dispatch p50: {sorted(ts)[2]*1e3:.2f} ms/encode", flush=True)

with profile_trace("/tmp/vision_trace"):
    float(many(raw, params, stats))
    e = one(raw, params, stats)
    float(e.astype(jnp.float32).sum())

for row in summarize_trace("/tmp/vision_trace", top=25):
    print(f"{row['total_ms']:9.3f} ms x{row['count']:<5} {row['op']}",
          flush=True)
print("DONE", flush=True)
