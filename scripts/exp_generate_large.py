"""On-chip check: public generate at the b=8 x ctx-2048 regime (VERDICT
r2 item 4) via the split prefill/decode-window path, plus int8-vs-int4
quality numbers on the same weights (item 9).

Stage 1 — generate_tokens_split at (b=8, s=1984, 64 new tokens): the
regime whose monolithic program crashed XLA in round 2.  Reports
aggregate tok/s.

Stage 2 — quality: greedy-token agreement and mean |delta logprob|
between int8 and int4 serving modes over a fixed batch of prompts
(random-init weights; the converter fidelity test covers real-naming
checkpoints).  Numbers go into docs/SERVING.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import generate_tokens, generate_tokens_split

cfg = gptj.GPTJConfig.gptj_6b(
    param_dtype=jnp.bfloat16, mlp_adapter=AdapterSpec("normal", 4),
    remat=False, attention_impl="flash", kv_cache_dtype="int8",
)
print("init + int8 quantize...", flush=True)
params = gptj.quantize_lm_params(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
)
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()

# ---- stage 1: b=8 x ctx-1984 + 64 steps through the PUBLIC split path ----
B, S, STEPS = 8, 1984, 64
emb = jax.jit(
    lambda k: (jax.random.normal(k, (B, S, cfg.d_model), jnp.float32)
               * 0.02).astype(jnp.bfloat16)
)(jax.random.PRNGKey(1))
jax.block_until_ready(emb)
from magma_tpu.observability import device_memory_stats
print("HBM before:", device_memory_stats(), flush=True)
t0 = time.time()
toks, n = generate_tokens_split(
    cfg, params, emb, jax.random.PRNGKey(2), max_steps=STEPS,
    temperature=0.0, top_k=0, top_p=0.0, eos_token=-1, window=8, prefill_chunk=256,
)
print(f"[b{B} ctx{S}] compile+run {time.time() - t0:.1f}s "
      f"steps={int(n)}", flush=True)
assert int(n) == STEPS
ts = []
for _ in range(2):
    t0 = time.time()
    toks2, _ = generate_tokens_split(
        cfg, params, emb, jax.random.PRNGKey(2), max_steps=STEPS,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1, window=8,
        prefill_chunk=256,
    )
    ts.append(time.time() - t0)
t = min(ts)
print(f"[b{B} ctx{S}] {t:.2f}s -> {B * STEPS / t:.0f} tok/s aggregate "
      f"(prefill incl.)", flush=True)
assert (np.asarray(toks) == np.asarray(toks2)).all()

# sanity vs the engine-equivalent semantics at a smaller shape: split ==
# monolithic (the full cross-check runs in the CPU suite; this is the
# on-chip variant at a quantized config)
emb_s = emb[:2, :256]
r1, _ = generate_tokens(cfg, params, emb_s, jax.random.PRNGKey(3),
                        max_steps=16, temperature=0.0, top_k=0, top_p=0.0,
                        eos_token=-1)
r2, _ = generate_tokens_split(cfg, params, emb_s, jax.random.PRNGKey(3),
                              max_steps=16, temperature=0.0, top_k=0,
                              top_p=0.0, eos_token=-1, window=5)
assert (np.asarray(r1) == np.asarray(r2)).all()
print("split == monolithic on chip", flush=True)

# ---- stage 2: int8 vs int4 quality on identical weights ----
print("re-init + int4 quantize...", flush=True)
del params
jax.clear_caches()
params4 = gptj.quantize_lm_params_int4(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
)
jax.block_until_ready(params4["lm_head_q"]["q"])
emb_q = emb[:4, :512]
toks4, _ = generate_tokens_split(
    cfg, params4, emb_q, jax.random.PRNGKey(2), max_steps=32,
    temperature=0.0, top_k=0, top_p=0.0, eos_token=-1, window=8,
)


@jax.jit
def logprobs(p, e):
    logits, _ = gptj.forward(cfg, p, e, remat=False)
    lp = jax.nn.log_softmax(logits[..., : cfg.vocab_size], axis=-1)
    return lp


lp4 = logprobs(params4, emb_q)
del params4
jax.clear_caches()
params8 = gptj.quantize_lm_params(
    jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
)
jax.block_until_ready(params8["lm_head_q"]["q"])
toks8, _ = generate_tokens_split(
    cfg, params8, emb_q, jax.random.PRNGKey(2), max_steps=32,
    temperature=0.0, top_k=0, top_p=0.0, eos_token=-1, window=8,
)
lp8 = logprobs(params8, emb_q)

t8, t4 = np.asarray(toks8), np.asarray(toks4)
agree = float((t8 == t4).mean())
# mean abs delta of the top-1 logprob (greedy confidence shift)
top8 = np.asarray(jnp.max(lp8, -1), np.float32)
top4 = np.asarray(jnp.max(lp4, -1), np.float32)
dlp = float(np.mean(np.abs(top8 - top4)))
kl = float(np.mean(np.sum(np.exp(np.asarray(lp8, np.float32))
                          * (np.asarray(lp8, np.float32)
                             - np.asarray(lp4, np.float32)), -1)))
print(f"int8-vs-int4: greedy agreement {agree:.3f} over "
      f"{t8.size} tokens; mean |d top-1 logprob| {dlp:.4f}; "
      f"mean KL(int8||int4) {kl:.5f} nats", flush=True)
print("DONE", flush=True)
