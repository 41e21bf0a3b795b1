"""Fused decode-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magma_tpu.ops.attention import decode_attention
from magma_tpu.ops.decode_kernel import decode_attention_stacked


@pytest.mark.parametrize("layer,cur", [(0, 100), (2, 5), (1, 256)])
def test_decode_kernel_matches_xla(layer, cur):
    L, b, max_len, h, hd = 3, 2, 256, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(layer), 5)
    kc = jax.random.normal(ks[0], (L, b, max_len, h, hd), jnp.float32)
    vc = jax.random.normal(ks[1], (L, b, max_len, h, hd), jnp.float32)
    q = jax.random.normal(ks[2], (b, 1, h, hd), jnp.float32)
    k_self = jax.random.normal(ks[3], (b, 1, h, hd), jnp.float32)
    v_self = jax.random.normal(ks[4], (b, 1, h, hd), jnp.float32)
    scale = hd ** -0.5

    ref = decode_attention(q, kc[layer], vc[layer], jnp.int32(cur),
                           scale=scale, self_kv=(k_self, v_self))
    out = decode_attention_stacked(
        q, kc, vc, jnp.int32(layer), jnp.int32(cur), (k_self, v_self),
        scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_decode_kernel_rejects_unaligned_cache():
    kc = jnp.zeros((1, 1, 200, 2, 128))
    q = jnp.zeros((1, 1, 2, 128))
    s = jnp.zeros((1, 1, 2, 128))
    with pytest.raises(NotImplementedError):
        decode_attention_stacked(q, kc, kc, 0, 5, (s, s), scale=1.0,
                                 interpret=True)


def test_decode_kernel_ragged_lengths():
    """Per-row (b,) cur_len: each batch row attends to its own prefix."""
    L, b, max_len, h, hd = 2, 3, 256, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    kc = jax.random.normal(ks[0], (L, b, max_len, h, hd), jnp.float32)
    vc = jax.random.normal(ks[1], (L, b, max_len, h, hd), jnp.float32)
    q = jax.random.normal(ks[2], (b, 1, h, hd), jnp.float32)
    k_self = jax.random.normal(ks[3], (b, 1, h, hd), jnp.float32)
    v_self = jax.random.normal(ks[4], (b, 1, h, hd), jnp.float32)
    scale = hd ** -0.5
    lens = jnp.array([200, 1, 77], jnp.int32)

    ref = decode_attention(q, kc[1], vc[1], lens, scale=scale,
                           self_kv=(k_self, v_self))
    out = decode_attention_stacked(
        q, kc, vc, jnp.int32(1), lens, (k_self, v_self),
        scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_decode_kernel_int8_cache():
    """int8 cache + per-(pos,head) scales dequantize inside the kernel."""
    L, b, max_len, h, hd = 2, 1, 256, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    kc = jax.random.normal(ks[0], (L, b, max_len, h, hd), jnp.float32)
    vc = jax.random.normal(ks[1], (L, b, max_len, h, hd), jnp.float32)
    q = jax.random.normal(ks[2], (b, 1, h, hd), jnp.float32)
    k_self = jax.random.normal(ks[3], (b, 1, h, hd), jnp.float32)
    v_self = jax.random.normal(ks[4], (b, 1, h, hd), jnp.float32)
    scale = hd ** -0.5
    cur = jnp.int32(100)

    from magma_tpu.models.gptj import _quantize_kv
    kq, ksc = _quantize_kv(kc)
    vq, vsc = _quantize_kv(vc)

    # oracle: dequantized cache through the XLA path (scale lane-replicated)
    k_deq = kq.astype(jnp.float32) * ksc[..., :1, None].astype(jnp.float32)
    v_deq = vq.astype(jnp.float32) * vsc[..., :1, None].astype(jnp.float32)
    ref = decode_attention(q, k_deq[1], v_deq[1], cur, scale=scale,
                           self_kv=(k_self, v_self))
    out = decode_attention_stacked(
        q, kq, vq, jnp.int32(1), cur, (k_self, v_self),
        scale=scale, k_scale=ksc, v_scale=vsc, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
