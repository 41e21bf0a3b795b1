"""Ring attention: context-parallel causal attention over a mesh axis.

The reference has **no** sequence/context parallelism (SURVEY.md §2b —
seq_len pinned to 2048); this module is the TPU-native scaling upgrade the
rebuild architecture was designed to admit: KV shards rotate around the
ICI ring via ``jax.lax.ppermute`` while each device accumulates online-
softmax partial attention for its local queries — communication overlaps
compute, total traffic equals one all-gather but never materializes the
full sequence on any chip.

Usage (inside shard_map, sequence axis sharded over ``axis_name``):

    out = ring_attention(q, k, v, axis_name="sp", scale=..., causal=True)

or at the jit level via ``context_parallel_attention`` which wraps the
shard_map given a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from magma_tpu.ops.attention import NEG_INF  # shared masking constant


# shard_map's varying-type checker requires fresh constants (scan carries,
# dead lax.cond branches) to carry the same mesh-axis "varying" type as the
# data they merge with.  Rather than chasing the marking API across jax
# releases (pcast/pvary/none), constants are built as `const + _zero(q)`:
# a data-derived scalar zero whose varying axes are exactly q's — correct
# for ANY combination of sequence/batch axes the caller sharded over.


def _zero(t):
    return t[(0,) * t.ndim] * 0


def _partial_attention(q, k, v, *, scale, q_offset, kv_offset, causal):
    """One ring step: scores + masked exp-stats for a local q block vs one
    rotated kv block.  Returns (m (b,h,sq,1), p_sum (b,h,sq,1),
    o_part (b,sq,h,hd)) — un-normalized, fp32 stats."""
    b, sq, h, hd = q.shape
    sk = k.shape[1]
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1) + kv_offset
        s = jnp.where((cols <= rows)[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                     # (b,h,sq,1)
    # guard fully-masked blocks: exp(NEG_INF - NEG_INF) would be 1
    m_safe = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m_safe)
    p = jnp.where(m > NEG_INF / 2, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return m_safe, l, o.astype(jnp.float32)


def ring_attention(
    q: jnp.ndarray,  # (b, s_local, h, hd) — local query shard
    k: jnp.ndarray,  # (b, s_local, h, hd) — local key shard
    v: jnp.ndarray,
    axis_name: str,
    *,
    scale: float,
    causal: bool = True,
) -> jnp.ndarray:
    """Causal ring attention inside shard_map.  The sequence is sharded
    contiguously over ``axis_name``: device i owns positions
    [i*s_local, (i+1)*s_local)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, s_local, h, hd = q.shape
    q_offset = idx * s_local

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, step_idx):
        m_acc, l_acc, o_acc, k_blk, v_blk = carry
        src = (idx - step_idx) % n          # origin device of current block
        kv_offset = src * s_local

        if causal:
            # a block strictly in this device's future is fully masked:
            # skip BOTH einsums, not just mask the result — on average
            # half of all ring steps are dead compute otherwise.  Both
            # branches are collective-free, so the program stays static.
            live = kv_offset <= q_offset + s_local - 1
            zq = _zero(q).astype(jnp.float32)
            zk = _zero(k_blk).astype(jnp.float32)
            m_new, l_new, o_new = jax.lax.cond(
                live,
                lambda: _partial_attention(
                    q, k_blk, v_blk, scale=scale, q_offset=q_offset,
                    kv_offset=kv_offset, causal=causal,
                ),
                lambda: (
                    jnp.full((b, h, s_local, 1), -1e30, jnp.float32)
                    + zq + zk,
                    jnp.zeros((b, h, s_local, 1), jnp.float32) + zq + zk,
                    jnp.zeros((b, s_local, h, hd), jnp.float32) + zq + zk,
                ),
            )
        else:
            m_new, l_new, o_new = _partial_attention(
                q, k_blk, v_blk, scale=scale, q_offset=q_offset,
                kv_offset=kv_offset, causal=causal,
            )
        m_next = jnp.maximum(m_acc, m_new)
        alpha = jnp.exp(m_acc - m_next)
        beta = jnp.exp(m_new - m_next)
        l_next = alpha * l_acc + beta * l_new
        # o accumulators are (b, sq, h, hd); stats are (b, h, sq, 1)
        a_t = jnp.transpose(alpha, (0, 2, 1, 3))
        b_t = jnp.transpose(beta, (0, 2, 1, 3))
        o_next = a_t * o_acc + b_t * o_new

        # rotate KV to the next device (skipped communication on the last
        # step would be ideal; a uniform scan keeps the program static)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l_next, o_next, k_blk, v_blk), None

    # fresh constants are unvarying over the mesh axes; the carry becomes
    # varying after the first step — seed them with q/k-derived zeros so
    # the scan carry type is stable from step 0 (shard_map typing)
    z = (_zero(q) + _zero(k) + _zero(v)).astype(jnp.float32)
    m0 = jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32) + z
    l0 = jnp.zeros((b, h, s_local, 1), jnp.float32) + z
    o0 = jnp.zeros((b, s_local, h, hd), jnp.float32) + z
    (m_f, l_f, o_f, _, _), _ = jax.lax.scan(
        step, (m0, l0, o0, k, v), jnp.arange(n)
    )
    l_t = jnp.transpose(jnp.where(l_f == 0.0, 1.0, l_f), (0, 2, 1, 3))
    return (o_f / l_t).astype(q.dtype)


def context_parallel_attention(
    q: jnp.ndarray,  # (b, s, h, hd) — global arrays (jit-sharded)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    scale: float,
    causal: bool = True,
    seq_axis: str = "dp",
    batch_axis: str = None,
) -> jnp.ndarray:
    """jit-level wrapper: shards the sequence over ``seq_axis`` and runs
    ring attention.  Drop-in replacement for ops.attention.causal_attention
    when one chip cannot hold the full sequence's KV.

    ``batch_axis`` keeps the batch dim sharded (e.g. over "dp") INSIDE the
    shard_map — without it a dp-sharded training batch would be
    all-gathered at the shard_map boundary and each dp group would
    redundantly attend over the full batch."""
    spec = P(batch_axis, seq_axis, None, None)
    fn = functools.partial(
        ring_attention, axis_name=seq_axis, scale=scale, causal=causal
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
