"""Rotary position embeddings, GPT-J style (rotate-every-two).

GPT-J applies rotary only to the first ``rotary_dim`` dims of each head
(reference LM config: rotary_dim=64, head_dim=256 — magma/language_model.py:21)
using the interleaved-pair ("rotate every two") convention of
mesh-transformer-jax.  Implemented with reshapes instead of strided
interleaving so XLA lowers it to cheap vector ops on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotary_sincos(positions: jnp.ndarray, rotary_dim: int, base: float = 10000.0):
    """sin/cos tables for given positions.

    positions: int array (...,) of token positions.
    Returns (sin, cos), each of shape positions.shape + (rotary_dim // 2,),
    in float32.
    """
    half = rotary_dim // 2
    freq_exponents = jnp.arange(half, dtype=jnp.float32) / float(half)
    inv_freq = 1.0 / (base ** freq_exponents)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.sin(angles), jnp.cos(angles)


def apply_rotary(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray, rotary_dim: int):
    """Apply rotate-every-two rotary to the first `rotary_dim` dims.

    x: (b, s, h, hd).  sin/cos: (s, rotary_dim//2) or broadcastable
    (b, s, rotary_dim//2).  The pair convention matches GPT-J:
    out[2i]   = x[2i] * cos_i - x[2i+1] * sin_i
    out[2i+1] = x[2i+1] * cos_i + x[2i] * sin_i
    """
    b, s, h, hd = x.shape
    x_rot = x[..., :rotary_dim]
    x_pass = x[..., rotary_dim:]

    # (b, s, h, rotary_dim//2, 2)
    xr = x_rot.reshape(b, s, h, rotary_dim // 2, 2)
    x1 = xr[..., 0]
    x2 = xr[..., 1]

    # broadcast sin/cos to (b, s, 1, rotary_dim//2)
    while sin.ndim < 3:
        sin = sin[None]
        cos = cos[None]
    sin = sin[:, :, None, :].astype(x1.dtype)
    cos = cos[:, :, None, :].astype(x1.dtype)

    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out_rot = jnp.stack([o1, o2], axis=-1).reshape(b, s, h, rotary_dim)
    return jnp.concatenate([out_rot, x_pass], axis=-1)
