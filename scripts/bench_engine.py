"""Serving-engine throughput on the 6B flagship: continuous batching of
long-context requests — the regime where the monolithic generate_tokens
program does not compile (b=8 x ctx-2048 crosses an XLA limit)."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.serving import LMServingEngine

KV = os.environ.get("KV", "int8")
B = int(os.environ.get("B", "8"))
CTX = int(os.environ.get("CTX", "1920"))
NEW = int(os.environ.get("NEW", "64"))

BITS = int(os.environ.get("BITS", "8"))
cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                              mlp_adapter=AdapterSpec("normal", 4),
                              remat=False, attention_impl="flash",
                              kv_cache_dtype=KV)
params = jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
params = (gptj.quantize_lm_params_int4(params) if BITS == 4
          else gptj.quantize_lm_params(params))
jax.clear_caches()
print(f"model ready (int{BITS} weights)", flush=True)

WINDOW = int(os.environ.get("WINDOW", "8"))
CHUNK = int(os.environ.get("CHUNK", "0"))
eng = LMServingEngine(cfg, params, max_batch=B, max_len=2048,
                      eos_token=-1, prefill_bucket=64,
                      decode_window=WINDOW, prefill_chunk=CHUNK)
# mixed workload: context lengths spread over [CTX/4, CTX]
lens = [max(64, CTX * (i % 4 + 1) // 4) for i in range(B)]
embs = [jax.random.normal(jax.random.PRNGKey(i), (L, 4096),
                          jnp.bfloat16) * 0.02 for i, L in enumerate(lens)]

def run_batch(label):
    done_before = sum(len(r.tokens) for r in eng.finished.values())
    t0 = time.time()
    ids = [eng.submit(e, max_new_tokens=NEW) for e in embs]
    eng.run()
    dt = time.time() - t0
    total = sum(len(r.tokens) for r in eng.finished.values()) - done_before
    print(f"[engine int{BITS}w/{KV}kv B={B} ctx~{lens} w={WINDOW} "
          f"chunk={CHUNK}] {label}: {dt:.2f}s, {total} tokens -> "
          f"{total/dt:.1f} tok/s aggregate", flush=True)

run_batch("first (incl. compiles)")
run_batch("steady")
