"""Focused decode micro-benchmark: int8 GPT-J 6B generate only."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import generate_tokens

lm_cfg = gptj.GPTJConfig.gptj_6b(param_dtype=jnp.bfloat16,
                                 mlp_adapter=AdapterSpec("normal", 4),
                                 remat=False, attention_impl="flash")
params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(jax.random.PRNGKey(0))
jax.block_until_ready(params["wte"])
params = gptj.quantize_lm_params(params)
import os as _os
prompt = jnp.zeros((1, int(_os.environ.get("PROMPT", "149")), 4096), jnp.bfloat16)
MS = 64
def run(seed):
    toks, steps = generate_tokens(lm_cfg, params, prompt, jax.random.PRNGKey(seed),
                                  max_steps=MS, temperature=0.0, top_k=0, top_p=0.0,
                                  eos_token=-1)
    # int() forces a device sync; block_until_ready alone has proven
    # unreliable for timing through the axon tunnel
    assert int(steps) == MS
    return toks
run(0)
ts = []
for i in range(3):
    t0 = time.time(); run(i); ts.append(time.time()-t0)
t = sorted(ts)[1]
print(f"int8 b=1: {t:.3f}s -> {MS/t:.1f} tok/s", flush=True)
