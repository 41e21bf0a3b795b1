"""Multi-head attention ops: causal (train/prefill) and KV-cache decode.

Replaces the CUDA attention inside the reference's HF GPT-Neo fork
(magma/language_model.py:27-45).  Two interchangeable implementations:

* ``impl="xla"``   — einsum + masked softmax.  Materializes the (s, s)
  scores tile; fine for short sequences, tests, and as the numerics
  reference for the Pallas kernel.
* ``impl="flash"`` — tiled Pallas flash-attention kernel
  (magma_tpu/ops/flash_attention.py) with online softmax; never
  materializes the full scores matrix.  Used on TPU for training/prefill.

All ops take (b, s, h, hd) layout and return the same; fp32 softmax
statistics regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)  # avoids exp(-inf - -inf) NaN


def _causal_mask(s_q: int, s_k: int, q_offset) -> jnp.ndarray:
    """Boolean (s_q, s_k) mask, True where attention is allowed.

    q position i (global index q_offset + i) may attend to k position j
    iff j <= q_offset + i.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 0) + q_offset
    cols = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 1)
    return cols <= rows


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    causal: bool = True,
    q_offset=0,
    kv_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention in plain XLA.

    q: (b, s_q, h, hd); k, v: (b, s_k, h, hd); kv_len: optional (b,) true
    key lengths for right-padded batches.
    """
    b, s_q, h, hd = q.shape
    s_k = k.shape[1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    mask = None
    if causal:
        mask = _causal_mask(s_q, s_k, q_offset)[None, None]
    if kv_len is not None:
        klmask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, s_k), 1) < kv_len[:, None]
        )[:, None, None, :]
        mask = klmask if mask is None else jnp.logical_and(mask, klmask)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    impl: str = "flash",
    q_offset=0,
    kv_len: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal multi-head attention with optional right-padding mask."""
    if impl == "flash":
        try:
            from magma_tpu.ops.flash_attention import flash_attention

            return flash_attention(
                q, k, v, scale=scale, causal=True, kv_len=kv_len,
                q_offset=q_offset, interpret=interpret,
            )
        except NotImplementedError:
            pass  # shapes unsupported by the kernel -> XLA fallback
    return xla_attention(
        q, k, v, scale=scale, causal=True, q_offset=q_offset, kv_len=kv_len
    )


def history_attention(
    q: jnp.ndarray,        # (b, s, h, hd) fresh queries
    k_cache: jnp.ndarray,  # (b, max, h, hd) one layer's cache
    v_cache: jnp.ndarray,
    hist_len,              # scalar or (b,): valid history positions
    k_self: jnp.ndarray,   # (b, s, h, hd) this chunk's keys/values
    v_self: jnp.ndarray,
    *,
    scale: float,
    kv_len=None,           # optional (b,) true fresh lengths (padding mask)
    kv_scales=None,        # (k_scale, v_scale) (b, h, max_len) for int8 cache
) -> jnp.ndarray:
    """Chunked-prefill attention: queries attend to the cache history
    [0, hist_len) AND causally to their own chunk.  Generalizes
    ``decode_attention`` from s == 1 to whole chunks — the engine's
    chunked prefill interleaves these with decode windows so a long
    prompt never stalls the other slots for its full prefill time.

    ``kv_scales`` marks an int8 cache; the per-(position, head) scales
    fold into the history score / probability columns (see
    decode_attention) so the cache is read as raw int8.

    One fused softmax over (max_len + s) key columns; the (b, h, s,
    max+s) scores tile is fine at chunk sizes (s <= 512)."""
    b, s, h, hd = q.shape
    max_len = k_cache.shape[1]
    hist_len = jnp.asarray(hist_len)
    if hist_len.ndim == 0:
        hist_len = jnp.broadcast_to(hist_len, (b,))

    s_hist = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if kv_scales is not None:
        k_sc, v_sc = kv_scales
        s_hist = s_hist * k_sc[:, :, None, :].astype(jnp.float32)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1)
        < hist_len[:, None]
    )[:, None, None, :]
    s_hist = jnp.where(valid, s_hist, NEG_INF)

    s_self = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_self.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    mask = _causal_mask(s, s, 0)[None, None]
    if kv_len is not None:
        klmask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) < kv_len[:, None]
        )[:, None, None, :]
        mask = jnp.logical_and(mask, klmask)
    s_self = jnp.where(mask, s_self, NEG_INF)

    scores = jnp.concatenate([s_hist, s_self], axis=-1)
    wdt = q.dtype if kv_scales is not None else v_cache.dtype
    weights = jax.nn.softmax(scores, axis=-1).astype(wdt)
    w_hist = weights[..., :max_len]
    if kv_scales is not None:
        w_hist = w_hist * v_sc[:, :, None, :].astype(wdt)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w_hist, v_cache.astype(wdt)
    ) + jnp.einsum(
        "bhqk,bkhd->bqhd", weights[..., max_len:],
        v_self.astype(wdt),
    )
    return out.astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cur_len: jnp.ndarray,
    *,
    scale: float,
    self_kv=None,
    kv_scales=None,
) -> jnp.ndarray:
    """Single-token attention against a fixed-shape KV cache.

    q: (b, 1, h, hd); k_cache/v_cache: (b, max_len, h, hd); cur_len: (b,) or
    scalar — number of valid cache entries.  Replaces the HF
    past_key_values step in the reference decode loop (sampling.py:87-90).

    ``self_kv=(k_new, v_new)`` supplies the current token's K/V as an
    explicit extra key instead of requiring it to be pre-written into the
    cache — this lets the caller defer the cache write to one bulk update
    outside the layer scan (see gptj._write_cache), avoiding full-cache
    copy traffic every token.

    ``kv_scales=(k_scale, v_scale)`` — (b, h, max_len) bf16 each — marks
    an int8 cache: K/V arrive as raw int8 and the per-(position, head)
    scales fold into the score / probability tiles (one scalar per key
    column), so the cache stream stays int8 and no dequantized copy is
    ever materialized.

    One (b, h, 1, max_len) matmul — small enough that XLA's fused path is
    at speed-of-light (HBM-bandwidth-bound on reading the cache).
    """
    b, _, h, hd = q.shape
    max_len = k_cache.shape[1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if kv_scales is not None:
        k_sc, v_sc = kv_scales
        scores = scores * k_sc[:, :, None, :].astype(jnp.float32)
    cur_len = jnp.asarray(cur_len)
    if cur_len.ndim == 0:
        cur_len = jnp.broadcast_to(cur_len, (b,))
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (b, max_len), 1) < cur_len[:, None]
    )[:, None, None, :]
    scores = jnp.where(valid, scores, NEG_INF)

    if self_kv is not None:
        k_self, v_self = self_kv  # (b, 1, h, hd) each
        s_self = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_self.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.concatenate([scores, s_self], axis=-1)

    wdt = q.dtype if kv_scales is not None else v_cache.dtype
    weights = jax.nn.softmax(scores, axis=-1).astype(wdt)
    w_cache = weights[..., :max_len]
    if kv_scales is not None:
        w_cache = w_cache * v_sc[:, :, None, :].astype(wdt)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w_cache, v_cache.astype(wdt)
    )
    if self_kv is not None:
        out = out + jnp.einsum(
            "bhqk,bkhd->bqhd", weights[..., max_len:],
            v_self.astype(wdt),
        )
    return out
