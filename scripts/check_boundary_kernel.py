import os
os.environ.setdefault("HF_HUB_OFFLINE", "1")
import jax
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from magma_tpu.ops import quant

L, D, F = 3, 4096, 16384
NI = 3 * D + F


def q4_stack(k, K, N, scale=0.02):
    def one(kk):
        w = jax.random.normal(kk, (K, N), jnp.float32) * scale
        return quant.quantize_int4(w)
    return jax.lax.map(jax.jit(one), jax.random.split(k, L))


def fz_make(k, DH, out_scale=None):
    kd = jax.random.split(k, 4)
    return quant.quantize_adapter_fused(
        jax.random.normal(kd[0], (L, D, DH), jnp.float32) * 0.01,
        jax.random.normal(kd[1], (L, DH), jnp.float32) * 0.01,
        jax.random.normal(kd[2], (L, DH, D), jnp.float32) * 0.01,
        jax.random.normal(kd[3], (L, D), jnp.float32) * 0.01,
        out_scale=out_scale,
    )


ks = jax.random.split(jax.random.PRNGKey(0), 12)
o = q4_stack(ks[0], D, D)
f = q4_stack(ks[1], F, D)
w_dual = {"q4": jnp.concatenate([o["q4"], f["q4"]], axis=1),
          "s4": jnp.concatenate([o["s4"], f["s4"]], axis=1)}
w_in = q4_stack(ks[2], D, NI)
fz_m = fz_make(ks[3], D // 4)
fz_a = fz_make(ks[4], D // 8, out_scale=1.0 + jax.random.uniform(ks[10], (L,)))
b_fc_out = jax.random.normal(ks[5], (L, D), jnp.float32) * 0.01
o_bias = jax.random.normal(ks[9], (L, D), jnp.float32) * 0.01
ln_g = 1.0 + jax.random.normal(ks[6], (L, D), jnp.float32) * 0.02
ln_b = jax.random.normal(ks[7], (L, D), jnp.float32) * 0.01

ctx = jax.random.normal(ks[8], (8, D), jnp.bfloat16)
mh = jax.nn.gelu(jax.random.normal(ks[11], (8, F), jnp.float32)).astype(jnp.bfloat16)
xr = jax.random.normal(jax.random.PRNGKey(42), (8, D), jnp.bfloat16)
u_in = jax.random.normal(jax.random.PRNGKey(43), (8, D), jnp.bfloat16)


def rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


cases = [
    ("v1: mlp normal", dict(fz_mlp=fz_m, mlp_src="out", o_bias=o_bias)),
    ("no adapters", dict(o_bias=o_bias)),
    ("no o_bias", dict(fz_mlp=fz_m, mlp_src="out")),
    ("v2: mlp+attn", dict(fz_mlp=fz_m, mlp_src="out", fz_attn=fz_a,
                          attn_src="out", o_bias=o_bias)),
    ("parallel srcs", dict(fz_mlp=fz_m, mlp_src="in", fz_attn=fz_a,
                           attn_src="in", u_in=u_in, o_bias=o_bias)),
]
W = dict(w_dual=w_dual, b_fc_out=b_fc_out, ln_g=ln_g, ln_b=ln_b)

for name, kw in cases:
    for last in (False, True):
        kw2 = dict(kw, w_in=None if last else w_in)
        static = dict(attn_src=kw2.pop("attn_src", "out"),
                      mlp_src=kw2.pop("mlp_src", "out"))

        def go(fn, c, m, x, wts, opt, static=static):
            return fn(c, m, x, wts["w_dual"], wts["b_fc_out"], wts["ln_g"],
                      wts["ln_b"], 1, w_in=opt.get("w_in"),
                      fz_attn=opt.get("fz_attn"), fz_mlp=opt.get("fz_mlp"),
                      u_in=opt.get("u_in"), o_bias=opt.get("o_bias"),
                      ln_eps=1e-5, **static)

        ref = jax.jit(lambda c, m, x, wts, opt: go(
            quant._boundary_ref, c, m, x, wts, opt))(ctx, mh, xr, W, kw2)
        new = jax.jit(lambda c, m, x, wts, opt: go(
            quant.boundary_fused_stacked, c, m, x, wts, opt))(
                ctx, mh, xr, W, kw2)
        rels = [rel(a, b) for a, b in zip(new, ref)]
        tag = " last" if last else " mid "
        print(f"[{name}{tag}] " + "  ".join(f"{r:.2e}" for r in rels),
              flush=True)
print("done", flush=True)
