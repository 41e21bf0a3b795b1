"""decode_layer_fused (whole-layer fused decode) — CPU-side checks.

On the forced-CPU test backend the wrapper always takes its
``_declayer_ref`` fallback, so these tests pin:

* rotary_matrix == apply_rotary (the R-matmul formulation is exact);
* the full fused-path composition (``gptj._run_decode_fused_layers``,
  called directly — the production gate requires a TPU) agrees with the
  established per-layer decode path on whole decode steps, int4 and
  int8 layouts, bf16 and int8 KV caches;
* the guards (concrete layer_idx, last-layer w_in) raise.

The on-chip kernel itself is checked against the same reference by
scripts/check_declayer_kernel.py (asserted under -m tpu by
tests/test_declayer_tpu.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops import decode_layer as dl
from magma_tpu.ops.rotary import apply_rotary, rotary_sincos


def test_rotary_matrix_matches_apply_rotary():
    rng = np.random.RandomState(0)
    b, s, h, hd, rd = 2, 1, 4, 32, 16
    x = jnp.asarray(rng.randn(b, s, h, hd), jnp.float32)
    positions = jnp.array([[7], [123]], jnp.int32)
    sin, cos = rotary_sincos(positions, rd)
    want = apply_rotary(x, sin, cos, rd)
    R = dl.rotary_matrix(positions[:, 0], rd, hd)
    got = jnp.einsum("bshd,bde->bshe", x, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _quantized_setup(fmt, kv_dtype):
    cfg = gptj.GPTJConfig.tiny(
        n_layers=2, n_heads=4, d_model=128, d_ff=256, rotary_dim=16,
        # downsample 1 so DH=128 fits the fused-adapter kernel geometry
        # (the fused decode path requires fused adapter payloads)
        mlp_adapter=AdapterSpec("normal", 1),
        attn_adapter=AdapterSpec("scaled_parallel", 1),
        kv_cache_dtype=kv_dtype, decode_unroll=True,
        param_dtype=jnp.bfloat16,
    )
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    if fmt == "int4":
        params = gptj.quantize_lm_params_int4(params)
    else:
        params = gptj.quantize_lm_params(params)
    return cfg, params


@pytest.mark.parametrize("fmt", ["int4", "int8"])
@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_fused_layer_decode_matches_block_path(fmt, kv_dtype):
    cfg, params = _quantized_setup(fmt, kv_dtype)
    D = cfg.d_model
    rng = jax.random.PRNGKey(1)
    prompt = jax.random.normal(rng, (1, 5, D), jnp.bfloat16) * 0.05

    # prefill with the established path
    cache = gptj.init_kv_cache(cfg, 1, 64)
    _, cache = gptj.forward(cfg, params, prompt, cache=cache,
                            cache_index=jnp.int32(0), remat=False)

    tok = jax.random.normal(jax.random.PRNGKey(2), (1, 1, D),
                            jnp.bfloat16) * 0.05
    idx = jnp.int32(5)

    # established decode step (unrolled _block path)
    logits_old, cache_old = gptj.forward(
        cfg, params, tok, cache=cache, cache_index=idx, remat=False)

    # fused-layer composition (ref fallback on CPU)
    x = tok.astype(cfg.compute_dtype)
    positions = jnp.broadcast_to(idx, (1, 1))
    hid, cache_new = gptj._run_decode_fused_layers(
        cfg, params["blocks"], x, positions, cache, idx)
    hid = gptj._layer_norm(hid, params["ln_f"], cfg.ln_eps,
                           cfg.compute_dtype)
    logits_new = gptj.lm_head(cfg, params, hid)

    a = np.asarray(logits_old[:, -1], np.float32)
    b = np.asarray(logits_new[:, -1], np.float32)
    # rotary-as-matmul + f32 softmax weights vs the bf16 einsum path:
    # bf16-noise-level drift on logits, same greedy decision
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 3e-2, rel
    assert a.argmax(-1).tolist() == b.argmax(-1).tolist()

    # cache writes agree (new k/v at position idx)
    for name in cache_old:
        co = np.asarray(cache_old[name][:, :, 5] if name in ("k", "v")
                        else cache_old[name][..., 5], np.float32)
        cn = np.asarray(cache_new[name][:, :, 5] if name in ("k", "v")
                        else cache_new[name][..., 5], np.float32)
        scale_ref = np.abs(co).max() + 1e-6
        assert np.abs(co - cn).max() / scale_ref < 3e-2, name


def test_declayer_guards():
    cfg, params = _quantized_setup("int4", "bf16")
    attn = params["blocks"]["attn"]
    cache = gptj.init_kv_cache(cfg, 1, 64)
    D = cfg.d_model
    fused = jnp.zeros((1, 3 * D + cfg.d_ff), jnp.bfloat16)
    x = jnp.zeros((1, D), jnp.bfloat16)
    rm = dl.rotary_matrix(jnp.array([3]), cfg.rotary_dim, cfg.head_dim)
    common = dict(
        n_heads=cfg.n_heads,
        fz_attn=None, fz_mlp=None, u_in=None, o_bias=None, scale=0.1)
    with pytest.raises(ValueError, match="last layer"):
        dl.decode_layer_fused(
            fused, x, rm, cache["k"], cache["v"], None, jnp.int32(3),
            attn["out_proj"], jnp.zeros((2, cfg.d_ff)),
            jnp.zeros((2, D)), jnp.ones((2, D)), jnp.zeros((2, D)),
            cfg.n_layers - 1, w_in=attn["in_proj"], **common)
    with pytest.raises(ValueError, match="concrete layer_idx"):
        dl.decode_layer_fused(
            fused, x, rm, cache["k"], cache["v"], None, jnp.int32(3),
            attn["out_proj"], jnp.zeros((2, cfg.d_ff)),
            jnp.zeros((2, D)), jnp.ones((2, D)), jnp.zeros((2, D)),
            jnp.int32(0), w_in=None, **common)


def test_declayer_supported_gate():
    # CPU backend -> always False in production; shape checks still work
    ok = dl.declayer_supported(
        b=1, s=1, n_heads=16, head_dim=256, d_ff=16384, max_len=2048,
        w_in_proj={"q4": jnp.zeros((2, 2048, 28672), jnp.int8),
                   "s4": jnp.zeros((2, 16, 28672))},
        w_out_proj={"q4": jnp.zeros((2, 10240, 4096), jnp.int8),
                    "s4": jnp.zeros((2, 80, 4096))},
        has_bvecs=True)
    assert ok is False  # not on TPU here
