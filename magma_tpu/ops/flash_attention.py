"""Tiled flash-attention Pallas TPU kernel (forward + backward).

Replaces the CUDA attention kernels the reference inherits from its HF
GPT-Neo fork (magma/language_model.py:27-45) with a TPU-native online-
softmax kernel: the (s, s) scores matrix is never materialized; running
max/sum statistics live in VMEM scratch; fp32 softmax statistics over
bf16 Q/K/V; causal tiles above the diagonal are skipped entirely.

Layout: public entry takes (b, s, h, hd); internally reshaped to
(b*h, s, hd) so each tile's trailing dims are MXU/VPU aligned.

Backward follows the standard flash recipe: save per-row logsumexp, then
two recompute kernels — dKV (grid over kv blocks, inner loop over q
blocks) and dQ (grid over q blocks, inner loop over kv blocks) — with
``di = sum(o * do)`` precomputed once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magma_tpu.ops.attention import NEG_INF  # shared masking constant
LANES = 128


def _block_sizes(s_q: int, s_k: int, hd: int):
    """Largest block size (<= 512, multiple of 128) dividing each seq dim.
    Callers pad sequences to multiples of 128 first (see flash_attention)."""
    if hd % 128 or s_q % 128 or s_k % 128:
        raise NotImplementedError(
            f"flash_attention needs seq%128==0 and head_dim%128==0 "
            f"(got s_q={s_q}, s_k={s_k}, hd={hd})"
        )
    def pick(s):
        for b in (512, 384, 256, 128):
            if s % b == 0:
                return b
        return 128
    return pick(s_q), pick(s_k)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _masked_scores(q, k, kvl_ref, i, j, kb, *, scale, causal, use_kv_len,
                   q_offset, block_q, block_k):
    """Scaled score tile + combined causal/kv_len mask (None = unmasked).

    Shared by the forward and both backward kernels so the masking logic
    cannot drift between them."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = None
    if causal:
        mask = (cols + kb * block_k) <= (rows + q_offset + j * block_q)
    if use_kv_len:
        klm = (cols + kb * block_k) < kvl_ref[i]
        mask = klm if mask is None else jnp.logical_and(mask, klm)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    return s, mask


def _fwd_kernel(
    kvl_ref,  # scalar prefetch: (bh,) int32 true key lengths
    q_ref,    # (1, block_q, hd)
    k_ref,    # (1, block_k, hd)
    v_ref,    # (1, block_k, hd)
    o_ref,    # (1, block_q, hd)
    lse_ref,  # (1, block_q, LANES) fp32
    m_scr,    # VMEM (block_q, LANES) fp32
    l_scr,    # VMEM (block_q, LANES) fp32
    acc_scr,  # VMEM (block_q, hd) fp32
    *,
    scale: float,
    causal: bool,
    use_kv_len: bool,
    q_offset: int,
    block_q: int,
    block_k: int,
    n_kv: int,
):
    i, j, kb = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        # skip tiles strictly above the diagonal: the tile's bottom-left
        # query (global pos q_offset + (j+1)*block_q - 1) must reach the
        # tile's first key (kb*block_k).
        should_run = (q_offset + (j + 1) * block_q - 1) >= kb * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        s, mask = _masked_scores(
            q_ref[0], k_ref[0], kvl_ref, i, j, kb, scale=scale,
            causal=causal, use_kv_len=use_kv_len, q_offset=q_offset,
            block_q=block_q, block_k=block_k,
        )

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)             # (block_q, LANES)
        alpha = jnp.exp(m_prev - m_next)                 # (block_q, LANES)
        p = jnp.exp(s - m_next[:, :1])                   # (block_q, block_k)
        if mask is not None:
            # a FULLY-masked row has m_next == NEG_INF and exp(s - m_next)
            # == 1 for its masked entries — l would inflate to s_k and the
            # output become mean(V) instead of 0 (the l==0 guard in _store
            # could never fire).  Zero masked probabilities explicitly.
            p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
        )

    @pl.when(kb == n_kv - 1)
    def _store():
        l_fin = l_scr[...]
        safe_l = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = (acc_scr[...] / safe_l[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(jnp.maximum(l_fin, 1e-30))


def _fwd(q, k, v, kvl, *, scale, causal, use_kv_len, q_offset, interpret):
    bh, s_q, hd = q.shape
    s_k = k.shape[1]
    block_q, block_k = _block_sizes(s_q, s_k, hd)
    n_q, n_kv = s_q // block_q, s_k // block_k

    grid = (bh, n_q, n_kv)
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        use_kv_len=use_kv_len,
        q_offset=q_offset,
        block_q=block_q,
        block_k=block_k,
        n_kv=n_kv,
    )
    o, lse = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_q, hd), q.dtype),
            jax.ShapeDtypeStruct((bh, s_q, LANES), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, j, kb, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, j, kb, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, j, kb, *_: (i, kb, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, j, kb, *_: (i, j, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda i, j, kb, *_: (i, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvl, q, k, v)
    return o, lse[:, :, 0]


# ---------------------------------------------------------------------------
# Backward: dK/dV kernel — grid over kv blocks, sequential over q blocks
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    kvl_ref,
    q_ref,    # (1, block_q, hd)
    k_ref,    # (1, block_k, hd)
    v_ref,    # (1, block_k, hd)
    do_ref,   # (1, block_q, hd)
    lse_ref,  # (1, block_q, LANES)
    di_ref,   # (1, block_q, LANES)
    dk_ref,   # (1, block_k, hd)
    dv_ref,   # (1, block_k, hd)
    dk_scr,   # VMEM (block_k, hd) fp32
    dv_scr,   # VMEM (block_k, hd) fp32
    *,
    scale: float,
    causal: bool,
    use_kv_len: bool,
    q_offset: int,
    block_q: int,
    block_k: int,
    n_q: int,
):
    i, kb, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if causal:
        should_run = (q_offset + (j + 1) * block_q - 1) >= kb * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        s, mask = _masked_scores(
            q_ref[0], k_ref[0], kvl_ref, i, j, kb, scale=scale,
            causal=causal, use_kv_len=use_kv_len, q_offset=q_offset,
            block_q=block_q, block_k=block_k,
        )

        q = q_ref[0]
        p = jnp.exp(s - lse_ref[0][:, :1])                 # (block_q, block_k)
        if mask is not None:
            # fully-masked rows carry lse ~ NEG_INF: exp(NEG_INF - lse)
            # would EXPLODE, not vanish — zero masked entries explicitly
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0].astype(jnp.float32)
        # dV += P^T dO
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dO V^T ; dS = P * (dP - di)
        dp = jax.lax.dot_general(
            do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di_ref[0][:, :1])
        # dK += scale * dS^T Q
        dk_scr[...] += scale * jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Backward: dQ kernel — grid over q blocks, sequential over kv blocks
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    kvl_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref,   # (1, block_q, hd)
    dq_scr,   # VMEM (block_q, hd) fp32
    *,
    scale: float,
    causal: bool,
    use_kv_len: bool,
    q_offset: int,
    block_q: int,
    block_k: int,
    n_kv: int,
):
    i, j, kb = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if causal:
        should_run = (q_offset + (j + 1) * block_q - 1) >= kb * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        s, mask = _masked_scores(
            q_ref[0], k_ref[0], kvl_ref, i, j, kb, scale=scale,
            causal=causal, use_kv_len=use_kv_len, q_offset=q_offset,
            block_q=block_q, block_k=block_k,
        )
        k = k_ref[0]

        p = jnp.exp(s - lse_ref[0][:, :1])
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        do = do_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di_ref[0][:, :1])
        dq_scr[...] += scale * jax.lax.dot(
            ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
        )

    @pl.when(kb == n_kv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(q, k, v, kvl, o, lse, do, *, scale, causal, use_kv_len, q_offset, interpret):
    bh, s_q, hd = q.shape
    s_k = k.shape[1]
    block_q, block_k = _block_sizes(s_q, s_k, hd)
    n_q, n_kv = s_q // block_q, s_k // block_k

    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    )  # (bh, s_q)
    lse_b = jnp.broadcast_to(lse[..., None], (bh, s_q, LANES))
    di_b = jnp.broadcast_to(di[..., None], (bh, s_q, LANES))

    common = dict(
        scale=scale, causal=causal, use_kv_len=use_kv_len,
        q_offset=q_offset, block_q=block_q, block_k=block_k,
    )

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_q=n_q, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, n_kv, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, kb, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, kb, j, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, kb, j, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_q, hd), lambda i, kb, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda i, kb, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda i, kb, j, *_: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, hd), lambda i, kb, j, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, kb, j, *_: (i, kb, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, hd), jnp.float32),
                pltpu.VMEM((block_k, hd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_k, hd), k.dtype),
            jax.ShapeDtypeStruct((bh, s_k, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvl, q, k, v, do, lse_b, di_b)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_kv=n_kv, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, j, kb, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, j, kb, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_k, hd), lambda i, j, kb, *_: (i, kb, 0)),
                pl.BlockSpec((1, block_q, hd), lambda i, j, kb, *_: (i, j, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda i, j, kb, *_: (i, j, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda i, j, kb, *_: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, hd), lambda i, j, kb, *_: (i, j, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, s_q, hd), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvl, q, k, v, do, lse_b, di_b)[0]

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, kvl, scale, causal, use_kv_len, q_offset, interpret):
    o, _ = _fwd(
        q, k, v, kvl, scale=scale, causal=causal, use_kv_len=use_kv_len,
        q_offset=q_offset, interpret=interpret,
    )
    return o


def _flash_fwd(q, k, v, kvl, scale, causal, use_kv_len, q_offset, interpret):
    o, lse = _fwd(
        q, k, v, kvl, scale=scale, causal=causal, use_kv_len=use_kv_len,
        q_offset=q_offset, interpret=interpret,
    )
    return o, (q, k, v, kvl, o, lse)


def _flash_bwd(scale, causal, use_kv_len, q_offset, interpret, res, do):
    q, k, v, kvl, o, lse = res
    dq, dk, dv = _bwd(
        q, k, v, kvl, o, lse, do, scale=scale, causal=causal,
        use_kv_len=use_kv_len, q_offset=q_offset, interpret=interpret,
    )
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    causal: bool = True,
    kv_len: Optional[jnp.ndarray] = None,
    q_offset: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (b, s, h, hd) tensors.

    kv_len: optional (b,) int32 — true key lengths for right-padded batches.
    q_offset: static int — global position of q[0] (decode/chunked prefill).
    """
    b, s_q, h, hd = q.shape
    s_k = k.shape[1]
    if hd % 128:
        raise NotImplementedError(f"head_dim must be a multiple of 128, got {hd}")

    # auto-pad ragged sequence lengths up to a multiple of 128; padded keys
    # are masked via kv_len, padded query rows are sliced off the output
    pad_q = (-s_q) % 128
    pad_k = (-s_k) % 128
    if pad_q or pad_k:
        if pad_q:
            q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        if pad_k:
            k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
            if kv_len is None:
                kv_len = jnp.full((b,), s_k, jnp.int32)

    sp_q, sp_k = q.shape[1], k.shape[1]
    _block_sizes(sp_q, sp_k, hd)  # raise early if still unsupported

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], hd)

    use_kv_len = kv_len is not None
    if kv_len is None:
        kvl = jnp.full((b * h,), sp_k, dtype=jnp.int32)
    else:
        kvl = jnp.repeat(kv_len.astype(jnp.int32), h)

    o = _flash(
        to_bh(q), to_bh(k), to_bh(v), kvl,
        float(scale), bool(causal), bool(use_kv_len), int(q_offset),
        bool(interpret),
    )
    o = o.reshape(b, h, sp_q, hd).transpose(0, 2, 1, 3)
    return o[:, :s_q] if pad_q else o
