"""Sequence-sharded KV-cache decode attention (context-parallel serving).

For contexts whose KV cache exceeds one chip's HBM budget, the cache's
*position* axis shards over the mesh's ``sp`` axis and each decode step
computes a distributed online softmax: every chip scores the query
against only its local cache shard, then the shards combine through two
tiny collectives (a ``pmax`` of the running maxima and a ``psum`` of the
numerator/denominator) — O(b·h·hd) bytes over ICI per layer per token,
never the cache itself.  This is the serving-side counterpart of ring
attention for training (``parallel/ring_attention.py``): reference MAGMA
has no equivalent (its HF decode loop holds the whole past_key_values on
one GPU, magma/sampling.py:87-90); this is a beyond-parity capability.

Numerics mirror ``ops.attention.decode_attention`` exactly: fp32 scores
with the int8-cache scales folded per (position, head), a global-max
softmax over [valid cache positions] ∪ {current token}, probabilities
cast to the reference weight dtype before the PV product.

Used by ``models/gptj.forward(..., mesh=...)`` when
``cfg.attention_impl == "ring"`` and the mesh has a >1 ``sp`` axis; the
cache arrays must be sharded ``P(None, None, "sp", None, None)`` (see
``ops/sampling.generate_tokens(mesh=...)``, which constrains them).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from magma_tpu.ops.attention import NEG_INF


def sp_decode_attention(
    q: jnp.ndarray,                 # (b, 1, h, hd) — replicated
    k_cache: jnp.ndarray,           # (b, max_len, h, hd) — sharded dim 1
    v_cache: jnp.ndarray,           # (b, max_len, h, hd) — sharded dim 1
    cur_len: jnp.ndarray,           # scalar or (b,) valid cache entries
    self_kv: Tuple[jnp.ndarray, jnp.ndarray],   # current token K/V (b,1,h,hd)
    mesh,
    axis: str,
    *,
    scale: float,
    kv_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Distributed-softmax decode attention over a position-sharded cache.

    Semantics match ``decode_attention(q, k, v, cur_len, self_kv=...)``
    with the cache position axis sharded over ``axis``; returns the
    replicated (b, 1, h, hd) attention output.
    """
    has_scales = kv_scales is not None
    cache_spec = P(None, axis, None, None)
    scale_spec = P(None, None, axis)
    in_specs = [P(), cache_spec, cache_spec, P(), P(), P()]
    args = [q, k_cache, v_cache, jnp.asarray(cur_len), *self_kv]
    if has_scales:
        in_specs += [scale_spec, scale_spec]
        args += list(kv_scales)

    def local(qr, k_loc, v_loc, cur, k_self, v_self, *scs):
        b, s_loc, h, hd = k_loc.shape
        off = jax.lax.axis_index(axis) * s_loc
        # local fp32 scores with the int8 scales folded per (pos, head)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qr, k_loc.astype(qr.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_scales:
            scores = scores * scs[0][:, :, None, :].astype(jnp.float32)
        cur = jnp.broadcast_to(cur.astype(jnp.int32), (b,))
        pos = off + jax.lax.broadcasted_iota(jnp.int32, (b, s_loc), 1)
        valid = (pos < cur[:, None])[:, None, None, :]
        scores = jnp.where(valid, scores, NEG_INF)

        s_self = jnp.einsum(
            "bqhd,bkhd->bhqk", qr, k_self.astype(qr.dtype),
            preferred_element_type=jnp.float32,
        ) * scale                                   # (b, h, 1, 1)

        # global max over [cache ∪ self]: one pmax of (b, h, 1, 1)
        m_loc = jnp.max(scores, axis=-1, keepdims=True)
        m = jnp.maximum(jax.lax.pmax(m_loc, axis), s_self)
        e_loc = jnp.exp(scores - m)                 # masked cols -> exp(-inf)=0
        e_self = jnp.exp(s_self - m)
        den = (
            jax.lax.psum(jnp.sum(e_loc, axis=-1, keepdims=True), axis)
            + e_self
        )
        # probabilities in the reference weight dtype before PV
        wdt = qr.dtype if has_scales else v_loc.dtype
        w_loc = (e_loc / den).astype(wdt)
        if has_scales:
            w_loc = w_loc * scs[1][:, :, None, :].astype(wdt)
        out = jax.lax.psum(
            jnp.einsum("bhqk,bkhd->bqhd", w_loc, v_loc.astype(wdt)), axis
        )
        return out + jnp.einsum(
            "bhqk,bkhd->bqhd", (e_self / den).astype(wdt), v_self.astype(wdt)
        )

    return jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(),
    )(*args)
