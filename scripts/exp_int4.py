"""int4 weight-only decode throughput on the 6B flagship."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import generate_tokens

cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                              mlp_adapter=AdapterSpec("normal", 4),
                              remat=False, attention_impl="flash")
params = jax.jit(lambda k: gptj.init_params(k, cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
t0 = time.time()
params = gptj.quantize_lm_params_int4(params)
jax.block_until_ready(params["lm_head_q"]["q"])
jax.clear_caches()
print(f"int4 quantized in {time.time()-t0:.1f}s", flush=True)
MS = 64

def bench(c, b, plen, label):
    prompt = jnp.zeros((b, plen, 4096), jnp.bfloat16)
    def run(seed):
        toks, steps = generate_tokens(c, params, prompt, jax.random.PRNGKey(seed),
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

for b, plen, kv in ((1, 149, "bf16"), (8, 149, "bf16"), (1, 1984, "int8")):
    c = dataclasses.replace(cfg, kv_cache_dtype=kv)
    try:
        bench(c, b, plen, f"int4 b={b} ctx={plen} kv={kv}")
    except Exception as e:
        print(f"[int4 b={b} ctx={plen}] FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        jax.clear_caches()
