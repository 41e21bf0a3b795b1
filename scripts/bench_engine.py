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

cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                              mlp_adapter=AdapterSpec("normal", 4),
                              remat=False, attention_impl="flash",
                              kv_cache_dtype=KV)
params = jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
params = gptj.quantize_lm_params(params)
print("model ready", flush=True)

WINDOW = int(os.environ.get("WINDOW", "8"))
eng = LMServingEngine(cfg, params, max_batch=B, max_len=2048,
                      eos_token=-1, prefill_bucket=64,
                      decode_window=WINDOW)
emb = jax.random.normal(jax.random.PRNGKey(1), (CTX, 4096),
                        jnp.bfloat16) * 0.02

def run_batch(label):
    done_before = sum(len(r.tokens) for r in eng.finished.values())
    t0 = time.time()
    ids = [eng.submit(emb, max_new_tokens=NEW) for _ in range(B)]
    eng.run()
    dt = time.time() - t0
    total = sum(len(r.tokens) for r in eng.finished.values()) - done_before
    print(f"[engine {KV} B={B} ctx={CTX} w={WINDOW}] {label}: {dt:.2f}s, "
          f"{total} tokens -> {total/dt:.1f} tok/s aggregate", flush=True)

run_batch("first (incl. compiles)")
run_batch("steady")
