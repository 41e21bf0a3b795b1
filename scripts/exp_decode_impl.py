"""In-situ decode benchmark: layer-unrolled decode, impl x kv-cache-dtype."""
import sys, os, time, dataclasses, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import generate_tokens

base_cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                                   mlp_adapter=AdapterSpec("normal", 4),
                                   remat=False, attention_impl="flash")
params = jax.jit(lambda k: gptj.init_params(k, base_cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
params = gptj.quantize_lm_params(params)
MS = 64

def bench(cfg, b, plen, label):
    prompt = jnp.zeros((b, plen, 4096), jnp.bfloat16)
    def run(seed):
        toks, steps = generate_tokens(cfg, params, prompt, jax.random.PRNGKey(seed),
                                      max_steps=MS, temperature=0.0, top_k=0,
                                      top_p=0.0, eos_token=-1)
        assert int(steps) == MS
        return toks
    t0 = time.time(); run(0)
    print(f"[{label}] compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.time(); run(i); ts.append(time.time()-t0)
    t = sorted(ts)[1]
    print(f"[{label}] p50 {t:.3f}s -> {b*MS/t:.1f} tok/s", flush=True)
    jax.clear_caches()

combos = [
    ("xla",    "bf16", 1, 149),
    ("xla",    "bf16", 1, 1984),
    ("xla",    "int8", 1, 1984),
    ("xla",    "bf16", 8, 1984),
    ("xla",    "int8", 8, 1984),
    ("pallas", "int8", 1, 1984),
    ("pallas", "int8", 8, 1984),
    ("xla",    "int8", 8, 149),
]
for impl, kvd, b, plen in combos:
    cfg = dataclasses.replace(base_cfg, decode_impl=impl, kv_cache_dtype=kvd)
    try:
        bench(cfg, b, plen, f"{impl}/{kvd} b={b} ctx={plen}")
    except Exception as e:
        print(f"[{impl}/{kvd} b={b} ctx={plen}] FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        jax.clear_caches()
