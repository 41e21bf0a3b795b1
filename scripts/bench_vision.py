"""Vision tower benchmark on the real chip (BASELINE configs 1 & 4):
preprocess -> encoder -> ImagePrefix for every supported tower at its
native resolution."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from magma_tpu.models import image_prefix as ip_mod
from magma_tpu.ops.preprocess import clip_preprocess

BATCH = int(os.environ.get("B", "8"))

for name in ("clip_resnet_large", "clip_resnet", "clip_rn50", "clip",
             "nfresnet50"):
    cfg = ip_mod.ImagePrefixConfig(
        encoder_name=name, out_dim=4096, image_seq_len=2,
        dropout_prob=0.0, use_layernorm=True,
    )
    res = cfg.input_resolution
    params, stats = jax.jit(lambda k: ip_mod.init_params(k, cfg))(
        jax.random.PRNGKey(0)
    )
    raw = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 480, 640, 3),
                             0, 256, jnp.uint8)

    @jax.jit
    def fwd(raw, p, s):
        pixels = clip_preprocess(raw, res)
        emb, _ = ip_mod.apply(p, s, pixels, cfg, train=False)
        return emb

    emb = jax.block_until_ready(fwd(raw, params, stats))
    # force a real sync through a scalar fetch (tunneled-TPU timing quirk)
    float(emb.astype(jnp.float32).sum())
    ts = []
    for _ in range(5):
        t0 = time.time()
        e = fwd(raw, params, stats)
        float(e.astype(jnp.float32).sum())
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:20s} res={res:3d} b={BATCH} -> {tuple(emb.shape)}: "
          f"{t*1e3:7.1f} ms/batch = {BATCH/t:7.1f} img/s", flush=True)
    del params, stats
    fwd.clear_cache()
    jax.clear_caches()
