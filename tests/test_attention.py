"""Attention op tests: XLA reference vs Pallas flash (interpret mode on
CPU), decode-vs-full consistency, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magma_tpu.ops.attention import decode_attention, xla_attention
from magma_tpu.ops.flash_attention import flash_attention
from magma_tpu.ops.flash_attention import flash_attention


def _qkv(b=2, s=256, h=2, hd=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h, hd), jnp.float32) * 0.5
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_flash_matches_xla_forward():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = xla_attention(q, k, v, scale=scale, causal=True)
    out = flash_attention(q, k, v, scale=scale, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_matches_xla_with_ragged_kv_len():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    kv_len = jnp.array([100, 256], jnp.int32)
    ref = xla_attention(q, k, v, scale=scale, causal=True, kv_len=kv_len)
    out = flash_attention(
        q, k, v, scale=scale, causal=True, kv_len=kv_len, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_gradients_match_xla():
    q, k, v = _qkv(b=1, s=256)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    ref_fn = lambda q, k, v: xla_attention(q, k, v, scale=scale, causal=True)
    fl_fn = lambda q, k, v: flash_attention(
        q, k, v, scale=scale, causal=True, interpret=True
    )
    g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss(fl_fn), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-2)


def test_flash_rejects_unsupported_shapes():
    q = jnp.zeros((1, 100, 2, 64))
    with pytest.raises(NotImplementedError):
        flash_attention(q, q, q, scale=1.0, interpret=True)


def test_causal_mask_blocks_future():
    """Output at position i must not depend on inputs at positions > i."""
    q, k, v = _qkv(b=1, s=256)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out1 = xla_attention(q, k, v, scale=scale, causal=True)
    # perturb the last key/value — outputs at earlier positions unchanged
    k2 = k.at[:, -1].set(100.0)
    v2 = v.at[:, -1].set(100.0)
    out2 = xla_attention(q, k2, v2, scale=scale, causal=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5
    )


def test_decode_matches_full_attention():
    b, s, h, hd = 2, 8, 2, 16
    q, k, v = _qkv(b=b, s=s, h=h, hd=hd)
    scale = 1.0 / np.sqrt(hd)
    full = xla_attention(q, k, v, scale=scale, causal=True)

    max_len = 16
    k_cache = jnp.zeros((b, max_len, h, hd)).at[:, :s].set(k)
    v_cache = jnp.zeros((b, max_len, h, hd)).at[:, :s].set(v)
    # decoding the last position with cur_len = s must equal full attention
    out = decode_attention(q[:, -1:], k_cache, v_cache, jnp.int32(s), scale=scale)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(full[:, -1]), atol=1e-5
    )


def test_flash_fully_masked_rows_output_zero():
    """kv_len == 0 rows must output 0 (not mean(V)): exp(NEG_INF-NEG_INF)
    == 1 would otherwise inflate l to s_k inside fully-masked blocks."""
    import jax

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 3, 128))
    kv_len = jnp.array([0, 100], jnp.int32)
    out = flash_attention(q, k, v, scale=0.125, causal=False, kv_len=kv_len,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
    assert float(jnp.max(jnp.abs(out[1]))) > 0  # the live row still works

    # gradients through fully-masked rows must be finite (and zero)
    def loss(q):
        o = flash_attention(q, k, v, scale=0.125, causal=False,
                            kv_len=kv_len, interpret=True)
        return (o.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[0]), 0.0, atol=1e-5)
