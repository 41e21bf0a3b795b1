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
