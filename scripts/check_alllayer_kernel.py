"""On-chip parity check: decode_all_layers_fused (the ONE-launch
all-layers decode megakernel, 2-D layer/step grid) vs its oracle
_all_layers_ref (layer-by-layer _declayer_ref composition) across weight
formats (int4 W4A8 / int8), KV-cache dtypes (bf16 / int8-scaled) and
adapter variants, at full 6B per-layer geometry (D=4096, F=16384, h=16,
hd=256) with L=3 layers.  Run on the TPU; asserted by
tests/test_declayer_tpu.py under -m tpu."""
import os
import sys
os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from magma_tpu.ops import decode_layer as dl
from magma_tpu.ops import quant

L, H, HD = 3, 16, 256
D, F = H * HD, 16384
NI = 3 * D + F
MAXLEN = 512
SCALE = 1.0 / HD ** 0.5


def q4_stack(k, K, N, scale=0.02):
    def one(kk):
        return quant.quantize_int4(
            jax.random.normal(kk, (K, N), jnp.float32) * scale)
    return jax.lax.map(jax.jit(one), jax.random.split(k, L))


def q8_stack(k, K, N, scale=0.02):
    def one(kk):
        return quant.quantize_int8(
            jax.random.normal(kk, (K, N), jnp.float32) * scale)
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


ks = jax.random.split(jax.random.PRNGKey(0), 16)

o4 = q4_stack(ks[0], D, D)
f4 = q4_stack(ks[1], F, D)
wd4 = {"q4": jnp.concatenate([o4["q4"], f4["q4"]], axis=1),
       "s4": jnp.concatenate([o4["s4"], f4["s4"]], axis=1)}
wi4 = q4_stack(ks[2], D, NI)
dsd4, dsi4 = jax.jit(
    lambda wd, wi: quant._pack_boundary_scales(wd, wi, D, F))(wd4, wi4)
wd4["dsb"], wi4["dsb"] = dsd4, dsi4

o8 = q8_stack(ks[0], D, D)
f8 = q8_stack(ks[1], F, D)
wd8 = {"q": jnp.concatenate([o8["q"], f8["q"]], axis=1),
       "s": jnp.stack([o8["s"], f8["s"]], axis=1)}
wi8 = q8_stack(ks[2], D, NI)

fz_m = fz_make(ks[3], D // 4)
fz_a = fz_make(ks[4], D // 8,
               out_scale=1.0 + jax.random.uniform(ks[10], (L,)))
b_fc_in = jax.random.normal(ks[11], (L, F), jnp.float32) * 0.01
b_fc_out = jax.random.normal(ks[5], (L, D), jnp.float32) * 0.01
o_bias = jax.random.normal(ks[9], (L, D), jnp.float32) * 0.01
ln_g = 1.0 + jax.random.normal(ks[6], (L, D), jnp.float32) * 0.02
ln_b = jax.random.normal(ks[7], (L, D), jnp.float32) * 0.01

fused_in = (jax.random.normal(ks[8], (1, NI), jnp.float32) * 0.3
            ).astype(jnp.bfloat16)
xr = jax.random.normal(jax.random.PRNGKey(42), (1, D), jnp.bfloat16)
u_in = jax.random.normal(jax.random.PRNGKey(43), (1, D), jnp.bfloat16)

POS = 213
kc_f = jax.random.normal(ks[12], (L, 1, MAXLEN, H, HD), jnp.float32) * 0.4
vc_f = jax.random.normal(ks[13], (L, 1, MAXLEN, H, HD), jnp.float32) * 0.4
mask = (jnp.arange(MAXLEN) < POS)[None, None, :, None, None]
kc_f, vc_f = kc_f * mask, vc_f * mask

caches = {}
caches["bf16"] = (kc_f.astype(jnp.bfloat16), vc_f.astype(jnp.bfloat16),
                  None)
amaxk = jnp.max(jnp.abs(kc_f), axis=-1) + 1e-8        # (L, 1, MAXLEN, H)
amaxv = jnp.max(jnp.abs(vc_f), axis=-1) + 1e-8
ksc, vsc = amaxk / 127.0, amaxv / 127.0
kc_i = jnp.clip(jnp.round(kc_f / ksc[..., None]), -127, 127).astype(jnp.int8)
vc_i = jnp.clip(jnp.round(vc_f / vsc[..., None]), -127, 127).astype(jnp.int8)
caches["int8"] = (kc_i, vc_i,
                  (ksc.astype(jnp.bfloat16), vsc.astype(jnp.bfloat16)))


def rel(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


V1 = dict(fz_mlp=fz_m, mlp_src="out", o_bias=o_bias)
V2 = dict(fz_mlp=fz_m, mlp_src="in", fz_attn=fz_a,
          attn_src="in", o_bias=o_bias)
NOAD = dict(o_bias=o_bias)

CASES = [
    ("int4", "bf16", "v1", V1),
    ("int4", "int8", "v2-par", V2),
    ("int4", "bf16", "noad", NOAD),
    ("int8", "bf16", "v1", V1),
    ("int8", "int8", "v2-par", V2),
]

pos = jnp.int32(POS)
worst = 0.0
for wf, kv, name, kw in CASES:
    wd, wi = (wd4, wi4) if wf == "int4" else (wd8, wi8)
    kc, vc, kvs = caches[kv]
    rm = dl.rotary_matrix(jnp.array([POS]), 64, HD)
    opt = {k: v for k, v in dict(
        kvs=kvs, fz_attn=kw.get("fz_attn"), fz_mlp=kw.get("fz_mlp"),
        o_bias=kw.get("o_bias"),
    ).items() if v is not None}

    def go(fn, fi, x0, u0, rm, kc, vc, wd, wi, bfi, bfo, lg, lb, opt,
           kw=kw):
        return fn(
            fi, x0, u0, rm, kc, vc, opt.get("kvs"), pos, wd, wi,
            bfi, bfo, lg, lb, n_heads=H,
            fz_attn=opt.get("fz_attn"),
            attn_src=kw.get("attn_src", "out"),
            fz_mlp=opt.get("fz_mlp"),
            mlp_src=kw.get("mlp_src", "out"),
            o_bias=opt.get("o_bias"), scale=SCALE, ln_eps=1e-5)

    new = jax.jit(functools.partial(go, dl.decode_all_layers_fused))(
        fused_in, xr, u_in, rm, kc, vc, wd, wi, b_fc_in, b_fc_out,
        ln_g, ln_b, opt)
    ref = jax.jit(functools.partial(go, dl._all_layers_ref))(
        fused_in, xr, u_in, rm, kc, vc, wd, wi, b_fc_in, b_fc_out,
        ln_g, ln_b, opt)
    rels = [rel(a, b) for a, b in zip(new, ref)]
    worst = max(worst, max(rels))
    print(f"[{wf}/{kv} {name}] y/k/v rel err: "
          + "  ".join(f"{r:.2e}" for r in rels), flush=True)

print(f"worst {worst:.2e}")
assert worst < 6e-2, worst     # 3 chained layers of bf16 epilogues
print("done", flush=True)
