"""Pallas decode-attention kernel over the layer-stacked KV cache.

Single-token decode reads the entire valid cache every step.  Under a
``lax.scan`` over layers, the per-layer cache slice is materialized
(read + write + read) before the attention matmul — at 2048 context that
is ~2 GB/token of pure copy traffic on GPT-J 6B.  This kernel takes the
layer index and current length as scalar-prefetch arguments and streams
K/V tiles straight out of the stacked (L, b, max, h, hd) HBM arrays with
online-softmax accumulation — the cache is read exactly once.

Kernel shape notes: the grid iterates (batch, head, kv-block); the single
query row is broadcast to 8 sublanes so every dot is a plain 2-D
contraction (Mosaic does not accept batched 3-D dot_generals), and the
redundant rows are free — the op is HBM-bound on the K/V stream.

The current token's K/V (not yet written to the cache — see
gptj._write_cache deferred writes) are merged *outside* the kernel with a
standard partial-softmax combine: the kernel returns un-normalized
(acc, m, l) statistics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
ROWS = 8  # query row broadcast width (f32 sublane tile)


def _decode_kernel(meta_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                   m_scr, l_scr, acc_scr, *, scale, bk, n_kb):
    """Grid (b, h, n_kb); per step one (bk, hd) cache tile of one head."""
    kb = pl.program_id(2)
    length = meta_ref[1]  # valid cache positions (< current write index)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(kb * bk < length)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)           # (8, hd) replicated
        k = k_ref[0, 0].astype(jnp.float32)           # (bk, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # (8, bk)

        pos = kb * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, NEG_INF)

        m_prev, l_prev = m_scr[...], l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)    # (8, 1)
        m_next = jnp.maximum(m_prev, m_curr)          # (8, LANES)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                # (8, bk)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0].astype(jnp.float32)           # (bk, hd)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(kb == n_kb - 1)
    def _store():
        o_ref[0, 0] = acc_scr[...]
        m_ref[0, 0] = m_scr[...]
        l_ref[0, 0] = l_scr[...]


def decode_attention_stacked(
    q: jnp.ndarray,        # (b, 1, h, hd)
    k_cache: jnp.ndarray,  # (L, b, max, h, hd)
    v_cache: jnp.ndarray,
    layer_idx,
    cur_len,               # scalar: valid positions (< current write index)
    self_kv: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention for layer ``layer_idx``.  Returns
    (b, 1, h, hd) in q's dtype."""
    L, b, max_len, h, hd = k_cache.shape
    bk = 512 if max_len % 512 == 0 else 256 if max_len % 256 == 0 else 128
    if max_len % bk:
        raise NotImplementedError(f"cache len {max_len} % {bk}")
    n_kb = max_len // bk

    q3 = q.reshape(b, h, hd)
    # tiling rules want block trailing dims divisible by (8, 128): the
    # query is replicated to 8 rows, the cache viewed as (L, b, max, h*hd)
    # so one head is a 128-aligned column slice
    q8 = jnp.broadcast_to(q3[:, :, None, :], (b, h, ROWS, hd))
    kf = k_cache.reshape(L, b, max_len, h * hd)
    vf = v_cache.reshape(L, b, max_len, h * hd)
    meta = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32), jnp.asarray(cur_len, jnp.int32)]
    )

    acc, m, l = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk, n_kb=n_kb),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, ROWS, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ROWS, LANES), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, n_kb),
            in_specs=[
                pl.BlockSpec((1, 1, ROWS, hd),
                             lambda bi, hi, kb, mr: (bi, hi, 0, 0)),
                pl.BlockSpec(
                    (1, 1, bk, hd),
                    lambda bi, hi, kb, mr: (mr[0], bi, kb, hi),
                ),
                pl.BlockSpec(
                    (1, 1, bk, hd),
                    lambda bi, hi, kb, mr: (mr[0], bi, kb, hi),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, ROWS, hd),
                             lambda bi, hi, kb, mr: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, ROWS, LANES),
                             lambda bi, hi, kb, mr: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, ROWS, LANES),
                             lambda bi, hi, kb, mr: (bi, hi, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, LANES), jnp.float32),
                pltpu.VMEM((ROWS, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, q8, kf, vf)
    acc = acc[:, :, 0]
    m = m[:, :, 0]
    l = l[:, :, 0]

    # merge the current token's K/V via a partial-softmax combine
    k_self, v_self = self_kv  # (b, 1, h, hd)
    s_self = (
        jnp.einsum(
            "bhd,bhd->bh", q3.astype(jnp.float32),
            k_self.reshape(b, h, hd).astype(jnp.float32),
        ) * scale
    )[..., None]                                   # (b, h, 1)
    m_c = m[..., :1]                               # (b, h, 1)
    l_c = l[..., :1]
    m_tot = jnp.maximum(m_c, s_self)
    alpha = jnp.exp(m_c - m_tot)
    beta = jnp.exp(s_self - m_tot)
    l_tot = alpha * l_c + beta
    out = (
        acc * alpha + beta * v_self.reshape(b, h, hd).astype(jnp.float32)
    ) / l_tot
    return out.reshape(b, 1, h, hd).astype(q.dtype)
