"""Ring attention (context parallelism) tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from magma_tpu.ops.attention import xla_attention
from magma_tpu.parallel.ring_attention import context_parallel_attention


def _qkv(b=2, s=256, h=2, hd=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h, hd), jnp.float32) * 0.5
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_ring_matches_full_attention_causal():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = xla_attention(q, k, v, scale=scale, causal=True)
    out = context_parallel_attention(
        q, k, v, mesh, scale=scale, causal=True, seq_axis="sp"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ring_matches_full_attention_noncausal():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    q, k, v = _qkv(seed=3)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = xla_attention(q, k, v, scale=scale, causal=False)
    out = context_parallel_attention(
        q, k, v, mesh, scale=scale, causal=False, seq_axis="sp"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ring_gradients_match():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    q, k, v = _qkv(b=1, s=64, hd=16, seed=5)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale=scale, causal=True) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(
            context_parallel_attention(
                q, k, v, mesh, scale=scale, causal=True, seq_axis="sp"
            ) ** 2
        )

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
