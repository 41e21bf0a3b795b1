"""Pallas decode-attention kernel over the layer-stacked KV cache.

Single-token decode reads the entire valid cache every step.  Under a
``lax.scan`` over layers, the XLA path materializes the per-layer cache
slice (read + copy-write + read) before the attention einsum — at 2048
context that is ~2.7 GB/token of HBM traffic on GPT-J 6B, and it always
touches the full allocated ``max_len`` regardless of how much of the
cache is valid.  This kernel streams exactly ``ceil(cur_len / bk)``
contiguous cache blocks per layer with its own double-buffered DMA and
accumulates online-softmax statistics as the blocks arrive — the valid
cache is read exactly once and the dead tail is never touched.

Design notes (hard-won on v5e):

* **Manual DMA, not the BlockSpec pipeline.**  A BlockSpec grid must be
  static, so a pipelined kernel fetches ``max_len`` worth of blocks even
  when ``cur_len`` is tiny (index-map clamping does not elide the
  copies).  Instead K/V stay in HBM (``memory_space=ANY``) and the
  kernel issues ``make_async_copy`` for block ``i+1`` while computing
  block ``i`` — the same structure as jax's paged_attention kernel.
* **Contiguous blocks.**  The cache is viewed as (L, b, max, h*hd) and
  each DMA moves a (bk, h*hd) row block — one dense stream.  Per-head
  (bk, hd) tiles would be 512-byte rows strided 8 KB apart (~20% of
  HBM bandwidth).
* **VPU compute, not MXU.**  Single-token decode gives the score/value
  dots an M of 1: the MXU spends its time shifting K/V in as weights at
  ~6% utilization (measured ~15.5 us per (512, 4096) block).  The VPU
  form — broadcast-multiply + axis reductions — measures ~10.5 us and
  overlaps under the ~10 us block DMA, so the kernel tracks the HBM
  stream.  Scores reduce over lanes (head_dim), the p@V partial over
  sublanes (positions); both stay f32.

The current token's K/V (not yet written to the cache — see
gptj._write_cache deferred writes) are merged *outside* the kernel with
a partial-softmax combine: the kernel returns un-normalized (acc, m, l)
statistics.  ``cur_len`` may be a scalar or per-row (b,) lengths (ragged
batched decode).
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


def _pick_block(max_len: int) -> int:
    for bk in (512, 256, 128):
        if max_len % bk == 0:
            return bk
    raise NotImplementedError(f"cache len {max_len} % 128 != 0")


def _decode_kernel(meta_ref, q_ref, k_hbm, v_hbm, *rest,
                   scale, bk, h, hd, quantized):
    """Grid (b,): one instance streams one batch row's cache for one layer.

    meta_ref (SMEM): [layer_idx, len_row0, ..., len_row{b-1}].
    For int8 caches (``quantized``) two extra HBM refs carry the
    per-(position, head) scales; dequantization folds into the score and
    p-weight columns — the int8 tiles are never expanded in VMEM.
    """
    if quantized:
        (ksc_hbm, vsc_hbm, o_ref, m_ref, l_ref, kbuf, vbuf, kscbuf, vscbuf,
         ksem, vsem, kssem, vssem, m_scr, l_scr, acc_scr) = rest
    else:
        (o_ref, m_ref, l_ref, kbuf, vbuf, ksem, vsem,
         m_scr, l_scr, acc_scr) = rest
    li = meta_ref[0]
    bi = pl.program_id(0)
    length = meta_ref[1 + bi]
    nb = jnp.maximum(pl.cdiv(length, bk), 1)

    m_scr[...] = jnp.full_like(m_scr, NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    def dmas(i, slot):
        ds = [
            pltpu.make_async_copy(
                k_hbm.at[li, bi, pl.ds(i * bk, bk), :], kbuf.at[slot],
                ksem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[li, bi, pl.ds(i * bk, bk), :], vbuf.at[slot],
                vsem.at[slot]),
        ]
        if quantized:
            ds += [
                pltpu.make_async_copy(
                    ksc_hbm.at[li, bi, pl.ds(i * bk, bk), :],
                    kscbuf.at[slot], kssem.at[slot]),
                pltpu.make_async_copy(
                    vsc_hbm.at[li, bi, pl.ds(i * bk, bk), :],
                    vscbuf.at[slot], vssem.at[slot]),
            ]
        return ds

    @pl.when(length > 0)
    def _go():
        for d in dmas(0, 0):
            d.start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < nb)
            def _prefetch():
                for d in dmas(i + 1, nxt):
                    d.start()

            for d in dmas(i, slot):
                d.wait()
            pos_col = i * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bk, 1), 0)
            neg = jnp.float32(NEG_INF)
            if quantized:  # (bk, 128) lane-replicated -> (bk, 1) columns
                ksc = kscbuf[slot].astype(jnp.float32)[:, :1]
                vsc = vscbuf[slot].astype(jnp.float32)[:, :1]
            for hi in range(h):
                off = hi * hd
                k = kbuf[slot, :, off:off + hd].astype(jnp.float32)
                q = q_ref[0, hi][0:1].astype(jnp.float32)      # (1, hd)
                s = jnp.sum(k * q, axis=1, keepdims=True) * scale  # (bk, 1)
                if quantized:
                    s = s * ksc
                s = jnp.where(pos_col < length, s, neg)
                m_prev = m_scr[hi]                             # (8, LANES)
                m_curr = jnp.max(s)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next[0, 0])                  # (bk, 1)
                l_scr[hi] = alpha * l_scr[hi] + jnp.sum(p)
                m_scr[hi] = m_next
                if quantized:
                    p = p * vsc
                v = vbuf[slot, :, off:off + hd].astype(jnp.float32)
                part = jnp.sum(p * v, axis=0, keepdims=True)   # (1, hd)
                acc_scr[hi] = acc_scr[hi] * alpha[:, :1] + part
            return 0

        jax.lax.fori_loop(0, nb, body, 0)

    o_ref[0] = acc_scr[...]
    m_ref[0] = m_scr[...]
    l_ref[0] = l_scr[...]


def decode_attention_stacked(
    q: jnp.ndarray,        # (b, 1, h, hd)
    k_cache: jnp.ndarray,  # (L, b, max, h, hd) bf16/f32, or int8 (+scales)
    v_cache: jnp.ndarray,
    layer_idx,
    cur_len,               # scalar or (b,): valid positions per row
    self_kv: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    scale: float,
    k_scale: jnp.ndarray = None,   # (L, b, max, 128) lane-replicated, int8
    v_scale: jnp.ndarray = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention for layer ``layer_idx``.  Returns
    (b, 1, h, hd) in q's dtype."""
    L, b, max_len, h, hd = k_cache.shape
    if hd % LANES:
        raise NotImplementedError(f"head_dim {hd} % {LANES} != 0")
    bk = _pick_block(max_len)
    quantized = k_scale is not None

    q3 = q.reshape(b, h, hd)
    # tiling rules want block trailing dims divisible by (8, 128): the
    # query is replicated to 8 rows (redundant rows are free — the op is
    # bound by the K/V stream)
    q8 = jnp.broadcast_to(q3[:, :, None, :], (b, h, ROWS, hd))
    kf = k_cache.reshape(L, b, max_len, h * hd)
    vf = v_cache.reshape(L, b, max_len, h * hd)
    lens = jnp.broadcast_to(
        jnp.asarray(cur_len, jnp.int32).reshape(-1), (b,)
    )
    meta = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), lens]
    )

    operands = [meta, q8, kf, vf]
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [
        pl.BlockSpec((1, h, ROWS, hd), lambda bi, mr: (bi, 0, 0, 0)),
        any_spec,
        any_spec,
    ]
    scratch = [
        pltpu.VMEM((2, bk, h * hd), k_cache.dtype),
        pltpu.VMEM((2, bk, h * hd), v_cache.dtype),
    ]
    if quantized:
        operands += [k_scale, v_scale]
        in_specs += [any_spec, any_spec]
        scratch += [
            pltpu.VMEM((2, bk, 128), k_scale.dtype),
            pltpu.VMEM((2, bk, 128), v_scale.dtype),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    scratch += [
        pltpu.VMEM((h, ROWS, LANES), jnp.float32),
        pltpu.VMEM((h, ROWS, LANES), jnp.float32),
        pltpu.VMEM((h, ROWS, hd), jnp.float32),
    ]

    acc, m, l = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk, h=h, hd=hd,
                          quantized=quantized),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, ROWS, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ROWS, LANES), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, h, ROWS, hd), lambda bi, mr: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, ROWS, LANES),
                             lambda bi, mr: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, ROWS, LANES),
                             lambda bi, mr: (bi, 0, 0, 0)),
            ],
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
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
