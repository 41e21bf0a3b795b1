"""Weight-only int8 quantization + fused dequant-matmul Pallas kernel.

Serving-side optimization with no reference equivalent: single-stream
decode of the frozen 6B LM is HBM-bandwidth-bound (every generated token
reads all weights once), so storing the big projection matrices as int8
with per-output-channel fp32 scales halves the bytes per token — a ~2x
decode-throughput ceiling raise (see BENCH numbers in README).

Why a Pallas kernel: XLA materializes `w_int8.astype(bf16) * scale` as a
full-size intermediate before a dot — that round-trips the dequantized
weights through HBM and erases the bandwidth win.  The kernel DMAs int8
tiles into VMEM, converts on-chip, runs the MXU matmul, and applies the
per-channel scales on the accumulator — the HBM side only ever sees int8.

Quantization is symmetric per output channel: scale_n = max|w[:, n]| / 127.
Weight-only (activations stay bf16), which is empirically ~lossless for
decoder LMs at 6B scale.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., K, N) weights -> {"q": int8, "s": f32 per-output-channel}.
    Leading dims (e.g. the layer-stack axis) are preserved."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, N)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale[..., 0, :]}


def _pick_block(s: int, prefer=(512, 384, 256, 128)) -> int:
    # NOTE: prefer tuples are tuned on v5e; see scripts/bench_decode.py
    for b in prefer:
        if s % b == 0:
            return b
    raise NotImplementedError(f"dim {s} not a multiple of 128")


def _pad_rows(x: jnp.ndarray):
    """Pad the row (M) dim so a large MXU-friendly row block always exists.

    Collapsing to 8-row blocks when M isn't a multiple of 256 runs the MXU
    at ~6% utilization — a 1984-token prefill through the 6B model took
    seconds that way.  Padding M up to a multiple of the block is ~3%
    wasted compute at worst.  Returns (padded x, bm, original m).
    """
    m = x.shape[0]
    bm = min(256, ((m + 7) // 8) * 8)
    mp = ((m + bm - 1) // bm) * bm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    return x, bm, m


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 on-chip
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...] * s_ref[...]


def _int8_matmul_2d(x: jnp.ndarray, wq: jnp.ndarray, scales: jnp.ndarray):
    """(M, K) @ int8 (K, N) * s (N,) -> (M, N) f32."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)

    x, bm, m = _pad_rows(x)
    mp = x.shape[0]
    bk = _pick_block(k)
    # 16768 = 128*131 serves the GPT-2 padded vocab (50304 = 3*16768):
    # the lm_head with bn=384 ran 131 tiny N-tiles per K-block and was
    # DMA-latency-bound (0.90 -> 0.64 ms/token measured at b=1)
    bn = _pick_block(
        n, prefer=(16768, 4096, 2048, 1536, 1024, 512, 384, 256, 128)
    )
    n_k = k // bk

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        grid=(mp // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kb: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, wq, scales.reshape(1, n))
    return out if mp == m else out[:m]


def _int8_matmul_stacked_kernel(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                                *, n_k):
    """int8 tile: weights are DMA'd as int8 (half the HBM bytes of bf16),
    converted to bf16 in VMEM, and fed to the MXU; per-channel scales apply
    on the fp32 accumulator.

    Measured on GPT-J 6B v5e-1 decode: 68.3 tok/s vs 54.6 bf16 (weights-
    only int8, bf16-convert variant).  A W8A8 variant (on-chip activation
    quantization + native int8 MXU dots) measured slightly slower at both
    b=1 (66.2) and b=8 (166 vs 172) — the per-block activation quantization
    overhead outweighs the int8 MXU gain at these shapes.
    """
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)  # (bk, bn) int8 -> bf16 on-chip
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...] * s_ref[0]


def _int8_matmul_stacked_2d(x, wq, scales, layer_idx):
    """(M, K) @ int8 (L, K, N)[layer_idx] * s (L, N)[layer_idx] -> (M, N).

    The layer index arrives as a scalar-prefetch argument so the BlockSpec
    index maps DMA weight tiles straight out of the *stacked* HBM array —
    no per-layer slice materialization.  This is what makes int8 decode
    actually bandwidth-bound on weights: under ``lax.scan`` a sliced
    operand would be copied (HBM read+write) before every kernel call,
    tripling traffic.
    """
    m, k = x.shape
    L, k2, n = wq.shape
    assert k == k2, (x.shape, wq.shape)

    x, bm, m = _pad_rows(x)
    mp = x.shape[0]
    bk = _pick_block(k)
    bn = _pick_block(n, prefer=(4096, 2048, 1536, 1024, 512, 384, 256, 128))
    n_k = k // bk

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int8_matmul_stacked_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kb, idx_ref: (i, kb)),
                pl.BlockSpec(
                    (1, bk, bn),
                    lambda i, j, kb, idx_ref: (idx_ref[0], kb, j),
                ),
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, kb, idx_ref: (idx_ref[0], 0, j),
                ),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb, idx_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wq, scales.reshape(L, 1, n))
    return out if mp == m else out[:m]


def _int8_matmul_dx_kernel(idx_ref, g_ref, w_ref, s_ref, o_ref, acc_ref,
                           *, n_n):
    """Backward-dx tile: dx (M, K) = (g * scales) (M, N) @ W^T — computed
    by contracting g and W over their N dims, reading W in its stored
    (K, N) layout.  No transposed weight copy ever materializes (XLA's AD
    of a plain dot hoists a full transposed copy of the stacked weights —
    ~12 GB for GPT-J 6B — which is what makes naive single-chip training
    OOM)."""
    nb = pl.program_id(2)

    @pl.when(nb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...].astype(jnp.float32) * s_ref[0]          # (bm, bn)
    w = w_ref[0].astype(jnp.bfloat16)                      # (bk, bn)
    acc_ref[...] += jax.lax.dot_general(
        g.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(nb == n_n - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def _int8_matmul_stacked_dx(g, wq, scales, layer_idx):
    """(M, N) cotangent -> (M, K) input cotangent for layer ``layer_idx``."""
    m, n = g.shape
    L, k, n2 = wq.shape
    assert n == n2

    g, bm, m = _pad_rows(g)
    mp = g.shape[0]
    bn = _pick_block(n)
    bk = _pick_block(k, prefer=(4096, 2048, 1536, 1024, 512, 384, 256, 128))
    n_n = n // bn

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int8_matmul_dx_kernel, n_n=n_n),
        out_shape=jax.ShapeDtypeStruct((mp, k), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, k // bk, n_n),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, nb, idx_ref: (i, nb)),
                pl.BlockSpec(
                    (1, bk, bn),
                    lambda i, j, nb, idx_ref: (idx_ref[0], j, nb),
                ),
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, nb, idx_ref: (idx_ref[0], 0, nb),
                ),
            ],
            out_specs=pl.BlockSpec((bm, bk), lambda i, j, nb, idx_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, g, wq, scales.reshape(L, 1, n))
    return out if mp == m else out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _stacked_mm(x2, wq, scales, layer_idx):
    if jax.default_backend() == "tpu":
        return _int8_matmul_stacked_2d(x2, wq, scales, layer_idx)
    w = jnp.take(wq, layer_idx, axis=0).astype(jnp.float32)
    s = jnp.take(scales, layer_idx, axis=0)
    return jnp.dot(x2.astype(jnp.float32), w * s[None, :])


def _stacked_mm_fwd(x2, wq, scales, layer_idx):
    # zero-size dtype token: residuals must be JAX values, not np dtypes
    dtype_token = jnp.zeros((0,), x2.dtype)
    return _stacked_mm(x2, wq, scales, layer_idx), (wq, scales, layer_idx,
                                                    dtype_token)


def _stacked_mm_bwd(res, g):
    """Quantized weights are frozen by contract: their cotangents are zero
    (symbolic), and dx streams from the *untransposed* int8 array."""
    import numpy as np

    wq, scales, layer_idx, dtype_token = res
    x_dtype = dtype_token.dtype
    if jax.default_backend() == "tpu":
        dx = _int8_matmul_stacked_dx(
            g.astype(jnp.float32), wq, scales, layer_idx
        )
    else:
        w = jnp.take(wq, layer_idx, axis=0).astype(jnp.float32)
        s = jnp.take(scales, layer_idx, axis=0)
        dx = jnp.dot(g.astype(jnp.float32) * s[None, :], w.T)
    # integer primals take float0 (symbolic-zero) cotangents; scales' zeros
    # are DCE'd — quantized weights are frozen by contract
    return (
        dx.astype(x_dtype),
        np.zeros(wq.shape, jax.dtypes.float0),
        jnp.zeros_like(scales),
        np.zeros(jnp.shape(layer_idx), jax.dtypes.float0),
    )


_stacked_mm.defvjp(_stacked_mm_fwd, _stacked_mm_bwd)


def int8_matmul_stacked(x, wq, scales, layer_idx, out_dtype=None):
    """x (..., K) @ layer ``layer_idx`` of stacked int8 weights (L, K, N).

    Differentiable w.r.t. ``x`` (dx via a dedicated Pallas kernel that
    reads the weights untransposed); weight/scale cotangents are zero —
    int8 weights are frozen by contract (QLoRA-style adapter training).
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _stacked_mm(x2, wq, scales, jnp.asarray(layer_idx))
    out = out.reshape(*lead, wq.shape[-1])
    return out.astype(out_dtype) if out_dtype is not None else out


@jax.custom_vjp
def _plain_mm(x2, wq, scales):
    if jax.default_backend() == "tpu":
        return _int8_matmul_2d(x2, wq, scales)
    return jnp.dot(x2.astype(jnp.float32), wq.astype(jnp.float32) * scales[None, :])


def _plain_mm_fwd(x2, wq, scales):
    return _plain_mm(x2, wq, scales), (wq, scales, jnp.zeros((0,), x2.dtype))


def _plain_mm_bwd(res, g):
    import numpy as np

    wq, scales, dtype_token = res
    x_dtype = dtype_token.dtype
    if jax.default_backend() == "tpu":
        dx = _int8_matmul_stacked_dx(
            g.astype(jnp.float32), wq[None], scales[None], jnp.int32(0)
        )
    else:
        dx = jnp.dot(g.astype(jnp.float32) * scales[None, :],
                     wq.astype(jnp.float32).T)
    return (
        dx.astype(x_dtype),
        np.zeros(wq.shape, jax.dtypes.float0),
        jnp.zeros_like(scales),
    )


_plain_mm.defvjp(_plain_mm_fwd, _plain_mm_bwd)


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scales: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """x (..., K) @ dequant(wq (K, N), scales (N,)) -> (..., N).

    Differentiable w.r.t. ``x`` only (weights frozen by contract).  Falls
    back to an XLA dequant+dot on non-TPU backends (tests/CPU).
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _plain_mm(x2, wq, scales)
    out = out.reshape(*lead, wq.shape[1])
    return out.astype(out_dtype) if out_dtype is not None else out


# ---------------------------------------------------------------------------
# int4 weight-only (nibble-packed) — serving path
# ---------------------------------------------------------------------------

INT4_GROUP = 256  # input rows per quantization group (= the kernel's bkp)


def quantize_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., K, N) weights -> {"q4": packed int8 (..., K/2, N),
    "s4": f32 (..., K/INT4_GROUP, N) per-(group, channel) scales}.

    Symmetric 4-bit with group-wise scales (256 input rows per group —
    per-channel-only scales measurably hurt at 4 bits).  Packing pairs row
    ``r`` of the FIRST half of K (low nibble) with row ``r + K/2`` of the
    second half (high nibble): a kernel block of packed rows then maps to
    two contiguous original-row ranges, so no interleaving is needed on
    either the weight or the activation side.
    """
    w = w.astype(jnp.float32)
    K = w.shape[-2]
    # small dims (tests) fall back to two groups; the Pallas kernel only
    # engages when the group size is exactly INT4_GROUP
    group = INT4_GROUP if K % (2 * INT4_GROUP) == 0 else K // 2
    G = K // group
    wg = w.reshape(*w.shape[:-2], G, group, w.shape[-1])
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)   # (..., G, 1, N)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*w.shape)
    lo, hi = q[..., : K // 2, :], q[..., K // 2:, :]
    packed = ((hi & 0xF) << 4 | (lo & 0xF)).astype(jnp.int8)
    return {"q4": packed, "s4": scale[..., 0, :]}


def dequantize_int4(q4: jnp.ndarray, s4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize_int4` -> f32 (..., K, N)."""
    p32 = q4.astype(jnp.int32)
    lo = (p32 << 28) >> 28
    hi = (p32 << 24) >> 28
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    K, N = q.shape[-2], q.shape[-1]
    G = s4.shape[-2]
    qg = q.reshape(*q.shape[:-2], G, K // G, N)
    return (qg * s4[..., :, None, :]).reshape(*q.shape)


def _quantize_act_block(ref):
    """Per-(row, k-block) int8 activation quantization inside a kernel.
    The f32 VPU work on a (bm, 256) tile is negligible next to the
    (256, bn) weight unpack it replaces converts for."""
    xf = ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    return jnp.round(xf / scale).astype(jnp.int8), scale


def _int4_matmul_stacked_kernel(idx_ref, xlo_ref, xhi_ref, w_ref,
                                slo_ref, shi_ref, o_ref, acc_ref, *, n_k):
    """Nibble-packed int4 tile, W4A8 math: one (bkp, bn) int8 block
    carries 2*bkp original weight rows.  Activations quantize to int8
    per (row, k-block) on the VPU; nibbles sign-extend in int32 but feed
    the MXU as int8 (int8 x int8 -> int32 dots) — skipping the
    int32->bf16 CONVERTs that throttled the bf16 variant's weight stream
    (in_proj 121.7 -> 117.9, fc_out 91.0 -> 87.8 us/layer; dual variant
    137.0 -> 98.2 — scripts/exp_w4a8.py, v5e 6B decode chain).  Group
    scales and the per-row activation scales fold on the f32 accumulator.
    Adds ~6e-3 relative activation-quantization error on top of int4's
    own ~1-2% weight error (KL re-validated in docs/SERVING.md)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xlo_q, sxlo = _quantize_act_block(xlo_ref)
    xhi_q, sxhi = _quantize_act_block(xhi_ref)
    p32 = w_ref[0].astype(jnp.int32)               # (bkp, bn)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    # sext(byte) >> 4 IS the signed high nibble: one shift, not two
    # (measured ~5% on the serial decode chain; bit-identical)
    hi = (p32 >> 4).astype(jnp.int8)
    plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
    phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
    acc_ref[...] += (plo.astype(jnp.float32) * sxlo * slo_ref[0]
                     + phi.astype(jnp.float32) * sxhi * shi_ref[0])

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def _int4_matmul_stacked_2d(x, q4, s4, layer_idx):
    """(M, K) @ int4-packed (L, K/2, N)[layer_idx] -> (M, N) f32."""
    m, k = x.shape
    L, kp, n = q4.shape
    assert k == 2 * kp, (x.shape, q4.shape)
    G = s4.shape[1]

    x, bm, m = _pad_rows(x)
    mp = x.shape[0]
    bkp = INT4_GROUP                   # packed rows per block = one group
    if kp % bkp:
        raise NotImplementedError(f"packed K {kp} % {bkp}")
    # 14336 first: the 28672-wide in_proj runs two half-N DMA streams per
    # k-block instead of seven 4096-wide ones — 137.5 -> 127.8 us/layer on
    # the serial decode chain (scripts/exp_kernel_blocks.py r3)
    bn = _pick_block(
        n, prefer=(14336, 4096, 2048, 1536, 1024, 512, 384, 256, 128))
    n_k = kp // bkp                    # also the lo-half group count

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_stacked_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, n // bn, n_k),
            in_specs=[
                # x twice: columns of the lo half, then of the hi half
                pl.BlockSpec((bm, bkp), lambda i, j, kb, idx_ref: (i, kb)),
                pl.BlockSpec((bm, bkp),
                             lambda i, j, kb, idx_ref: (i, n_k + kb)),
                pl.BlockSpec(
                    (1, bkp, bn),
                    lambda i, j, kb, idx_ref: (idx_ref[0], kb, j),
                ),
                # group scales for the lo and hi blocks; the (L, G, N)
                # array is passed as (L*G, 1, N) so the block's middle dim
                # equals the array dim (Pallas tiling rule)
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, kb, idx_ref: (idx_ref[0] * G + kb, 0, j),
                ),
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, kb, idx_ref:
                        (idx_ref[0] * G + G // 2 + kb, 0, j),
                ),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb, idx_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, x, q4, s4.reshape(L * G, 1, n), s4.reshape(L * G, 1, n))
    return out if mp == m else out[:m]


def _int4_group(k: int) -> int:
    """Group size quantize_int4 used for a K-dim of ``k`` (mirror of its
    small-shape fallback rule)."""
    return INT4_GROUP if k % (2 * INT4_GROUP) == 0 else k // 2


def _int8_dual_kernel(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                      *, nko, n_k):
    """Two stacked int8 matmuls (shared N) in one launch: k-blocks
    [0, nko) accumulate the first output row, [nko, n_k) the second.  The
    accumulator resets and the output window switches at the boundary, so
    one weight stream yields BOTH results — halving the serial-chain
    launch count for the o_proj + fc_out pair (see dual_matmul_stacked)."""
    kb = pl.program_id(2)

    @pl.when((kb == 0) | (kb == nko))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )

    @pl.when((kb == nko - 1) | (kb == n_k - 1))
    def _store():
        o_ref[...] = (acc_ref[...] * s_ref[0])[None]


def _int8_dual_2d(ctx, h, wq, scales, layer_idx, bk):
    """(M, Ko) @ wq[idx, :Ko] and (M, Kf) @ wq[idx, Ko:] -> (2, M, N) f32.
    ``scales`` is (L, 2, N): row 0 scales the first matrix, row 1 the
    second (applied at each store, whose s-block maps to its own row)."""
    ko, kf = ctx.shape[1], h.shape[1]
    L, ktot, n = wq.shape
    assert ktot == ko + kf
    x = jnp.concatenate([ctx, h], axis=1)
    x, bm, m = _pad_rows(x)
    mp = x.shape[0]
    bn = _pick_block(n, prefer=(4096, 2048, 1536, 1024, 512, 384, 256, 128))
    nko, n_k = ko // bk, (ko + kf) // bk

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int8_dual_kernel, nko=nko, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((2, mp, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, n // bn, n_k),
            in_specs=[
                # x is [ctx | h]; weight rows are [W_o | W_f] in the same
                # order, so the k-block walk is contiguous for both
                pl.BlockSpec((bm, bk), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec(
                    (1, bk, bn),
                    lambda i, j, kb, ir: (ir[0], kb, j),
                ),
                pl.BlockSpec(
                    (1, 1, bn),
                    lambda i, j, kb, ir:
                        (ir[0] * 2 + jnp.where(kb < nko, 0, 1), 0, j),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bm, bn),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j),
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wq, scales.reshape(L * 2, 1, n))
    return out[0, :m], out[1, :m]


def _int4_dual_kernel(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
                      o_ref, acc_ref, *, nko, n_k):
    """int4 variant of :func:`_int8_dual_kernel` — same boundary-switching
    accumulator over the nibble-packed weight stream, W4A8 math (see
    _int4_matmul_stacked_kernel: the int8 MXU dots remove the
    int32->bf16 converts; 137.0 -> 98.2 us/layer on the 6B out_proj
    decode chain, scripts/exp_w4a8.py)."""
    kb = pl.program_id(2)

    @pl.when((kb == 0) | (kb == nko))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xlo_q, sxlo = _quantize_act_block(xlo_ref)
    xhi_q, sxhi = _quantize_act_block(xhi_ref)
    p32 = w_ref[0].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
    phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
    acc_ref[...] += (plo.astype(jnp.float32) * sxlo * slo_ref[0]
                     + phi.astype(jnp.float32) * sxhi * shi_ref[0])

    @pl.when((kb == nko - 1) | (kb == n_k - 1))
    def _store():
        o_ref[...] = acc_ref[...][None]


def _int4_dual_2d(ctx, h, q4, s4, layer_idx):
    """(M, Ko) and (M, Kf) against the concatenated int4 payload
    q4 (L, (Ko+Kf)/2, N) with group scales s4 (L, (Ko+Kf)/256, N)."""
    ko, kf = ctx.shape[1], h.shape[1]
    kpo, kpf = ko // 2, kf // 2
    L, kptot, n = q4.shape
    assert kptot == kpo + kpf
    G = s4.shape[1]
    bkp = INT4_GROUP
    nko, nkf = kpo // bkp, kpf // bkp
    n_k = nko + nkf

    # activation columns laid out [o_lo | o_hi | f_lo | f_hi] so each
    # 256-packed-row weight block maps to one contiguous x block per nibble
    x = jnp.concatenate(
        [ctx[:, :kpo], ctx[:, kpo:], h[:, :kpf], h[:, kpf:]], axis=1)
    x, bm, m = _pad_rows(x)
    mp = x.shape[0]
    bn = _pick_block(n, prefer=(4096, 2048, 1536, 1024, 512, 384, 256, 128))

    def xlo_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, kb, 2 * nko + (kb - nko)))

    def xhi_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, nko + kb, 2 * nko + nkf + (kb - nko)))

    # scale rows: [o_lo (nko) | o_hi (nko) | f_lo (nkf) | f_hi (nkf)]
    def slo_idx(i, j, kb, ir):
        return (ir[0] * G + jnp.where(kb < nko, kb, kb + nko), 0, j)

    def shi_idx(i, j, kb, ir):
        return (ir[0] * G + jnp.where(kb < nko, kb + nko, kb + nko + nkf),
                0, j)

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int4_dual_kernel, nko=nko, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((2, mp, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bkp), xlo_idx),
                pl.BlockSpec((bm, bkp), xhi_idx),
                pl.BlockSpec((1, bkp, bn),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, 1, bn), slo_idx),
                pl.BlockSpec((1, 1, bn), shi_idx),
            ],
            out_specs=pl.BlockSpec(
                (1, bm, bn),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j),
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, x, q4, s4.reshape(L * G, 1, n), s4.reshape(L * G, 1, n))
    return out[0, :m], out[1, :m]


def dual_matmul_stacked(ctx, h, w, layer_idx, out_dtype=None):
    """Two matmuls sharing an output width N — ``ctx @ W_o`` and
    ``h @ W_f`` for layer ``layer_idx`` — in ONE Pallas launch.

    ``w`` holds the K-concatenated stacked payload built by
    ``gptj.quantize_lm_params[_int4]``: int8 {"q": (L, Ko+Kf, N),
    "s": (L, 2, N)} or int4 {"q4": (L, (Ko+Kf)/2, N), "s4" group scales}.
    Returns ``(a, m)``, each (..., N).

    Why: GPT-J's parallel block consumes o_proj and fc_out back to back in
    the serial decode chain, but their outputs are needed SEPARATELY
    (post-adapters act per branch), so they can't be summed via a plain
    concat-K matmul.  Walking one concatenated weight stream and switching
    the accumulator/output window at the boundary keeps both results while
    paying launch latency once — measured 114.9 -> 104.0 us/layer on the
    6B decode chain (scripts/exp_dual_kernel.py).

    Serving-only: NOT differentiable (no VJP).  QLoRA training quantizes
    with ``gptj.quantize_lm_params(..., fuse_out_proj=False)`` and keeps
    the separate o/fc_out matmuls, whose activation-dx kernels exist.
    """
    lead = ctx.shape[:-1]
    c2 = ctx.reshape(-1, ctx.shape[-1])
    h2 = h.reshape(-1, h.shape[-1])
    ko, kf = c2.shape[1], h2.shape[1]
    if "q4" in w:
        n = w["q4"].shape[-1]
        if (jax.default_backend() == "tpu" and n % 128 == 0
                and ko % (2 * INT4_GROUP) == 0
                and kf % (2 * INT4_GROUP) == 0):
            a, m = _int4_dual_2d(c2, h2, w["q4"], w["s4"],
                                 jnp.asarray(layer_idx))
        else:
            go = ko // _int4_group(ko)
            q4 = jnp.take(w["q4"], layer_idx, axis=0)
            s4 = jnp.take(w["s4"], layer_idx, axis=0)
            a = jnp.dot(c2.astype(jnp.float32),
                        dequantize_int4(q4[: ko // 2], s4[:go]))
            m = jnp.dot(h2.astype(jnp.float32),
                        dequantize_int4(q4[ko // 2:], s4[go:]))
    else:
        n = w["q"].shape[-1]
        bk = next((b for b in (512, 384, 256, 128)
                   if ko % b == 0 and kf % b == 0), None)
        if (jax.default_backend() == "tpu" and bk is not None
                and n % 128 == 0):
            a, m = _int8_dual_2d(c2, h2, w["q"], w["s"],
                                 jnp.asarray(layer_idx), bk)
        else:
            q = jnp.take(w["q"], layer_idx, axis=0)
            s = jnp.take(w["s"], layer_idx, axis=0)
            a = jnp.dot(c2.astype(jnp.float32),
                        q[:ko].astype(jnp.float32)) * s[0]
            m = jnp.dot(h2.astype(jnp.float32),
                        q[ko:].astype(jnp.float32)) * s[1]
    a = a.reshape(*lead, n)
    m = m.reshape(*lead, n)
    if out_dtype is not None:
        a, m = a.astype(out_dtype), m.astype(out_dtype)
    return a, m


def int4_matmul_stacked(x, q4, s4, layer_idx, out_dtype=None):
    """x (..., K) @ layer ``layer_idx`` of stacked int4-packed weights
    (L, K/2, N) with (L, K/256, N) group scales.  Serving-only (not
    differentiable — int4 is a deployment format, not a training one)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    group = 2 * q4.shape[-2] // s4.shape[-2]
    if jax.default_backend() == "tpu" and group == INT4_GROUP:
        out = _int4_matmul_stacked_2d(x2, q4, s4, jnp.asarray(layer_idx))
    else:
        w = dequantize_int4(
            jnp.take(q4, layer_idx, axis=0), jnp.take(s4, layer_idx, axis=0)
        )
        out = jnp.dot(x2.astype(jnp.float32), w)
    out = out.reshape(*lead, q4.shape[-1])
    return out.astype(out_dtype) if out_dtype is not None else out


# ---------------------------------------------------------------------------
# fused adapter bottleneck: down + relu + up in ONE launch
# ---------------------------------------------------------------------------


def quantize_adapter_fused(down_kernel, down_bias, up_kernel, up_bias,
                           out_scale=None):
    """Pack a stacked adapter bottleneck for the single-launch serving
    kernel.  Inputs are the training-layout stacks: down (L, D, DH) +
    bias (L, DH), up (L, DH, D) + bias (L, D); ``out_scale`` (L,) is the
    scaled_parallel learned scalar, folded into the up scales so the
    kernel's output needs no further scaling.  Returns the {"wd","sd",
    "bd","wu","su","bu"} payload consumed by ``fused_adapter_stacked``,
    or None if the dims don't fit the kernel's block geometry (callers
    keep the bf16 layout in that case)."""
    L, D, DH = down_kernel.shape
    bk = next((b for b in (512, 384, 256, 128)
               if D % b == 0 and DH % b == 0), None)
    if bk is None or D % 128 or DH % 128:
        return None
    qd = quantize_int8(down_kernel)
    qu = quantize_int8(up_kernel)
    su = qu["s"].reshape(L, 1, D)
    bu = up_bias.astype(jnp.float32).reshape(L, 1, D)
    if out_scale is not None:
        # scaled_parallel scales the FULL adapter output scale*(h@Wu + bu)
        # (reference ParallelAdapter semantics), so the up bias must carry
        # the fold too, not just the up scales
        sc = out_scale.astype(jnp.float32).reshape(L, 1, 1)
        su = su * sc
        bu = bu * sc
    return {
        "wd": qd["q"],
        "sd": qd["s"].reshape(L, 1, DH),
        "bd": down_bias.astype(jnp.float32).reshape(L, 1, DH),
        "wu": qu["q"],
        "su": su,
        "bu": bu,
    }


def _fused_adapter_kernel(idx_ref, x_ref, wd_ref, wu_ref, sd_ref, su_ref,
                          bd_ref, bu_ref, o_ref, h_ref, acc_ref,
                          *, nkd, n_k, bk):
    """One launch: h = relu((x @ Wd) * sd + bd) over k-blocks [0, nkd),
    then o = (h @ Wu) * su + bu over [nkd, n_k).  The hidden state lives
    in a VMEM scratch across the phase boundary, so the two bottleneck
    matmuls plus bias/relu epilogues cost ONE serial-chain launch and
    stream int8 weights (half the bf16 bytes the XLA path reads)."""
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kb < nkd)
    def _down():
        w = wd_ref[0].astype(jnp.bfloat16)
        h_ref[...] += jax.lax.dot(x_ref[...].astype(jnp.bfloat16), w,
                                  preferred_element_type=jnp.float32)

    @pl.when(kb >= nkd)
    def _up():
        @pl.when(kb == nkd)
        def _relu():
            h_ref[...] = jax.nn.relu(
                h_ref[...] * sd_ref[0] + bd_ref[0])

        j = kb - nkd
        w = wu_ref[0].astype(jnp.bfloat16)
        hs = h_ref[:, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot(hs, w,
                                    preferred_element_type=jnp.float32)

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...] * su_ref[0] + bu_ref[0]


def fused_adapter_stacked(x, fz, layer_idx, out_dtype=None):
    """x (..., D) -> up(relu(down(x)·sd + bd))·su + bu for layer
    ``layer_idx`` of the stacked payload built by
    ``quantize_adapter_fused`` — ONE Pallas launch on the decode chain.

    Serial-chain economics (scripts/exp_adapter_fused.py, v5e, 6B v1
    adapters k=4): the bf16 XLA bottleneck chain costs 51.3 us/layer-call
    and streams 16.8 MB/layer; this kernel is 40.7 us/layer-call at
    8.4 MB/layer.  Two *separate* int8 kernel launches were measured
    SLOWER than the XLA chain (gptj._serving_cast_adapters history) —
    the single launch is what makes int8 adapters pay.

    Rows beyond 64 (prefill) fall back to a dequantizing XLA path: the
    kernel re-streams the weight blocks for every 8-row block, which is
    only a good trade in the weight-bound decode regime.  Serving-only
    (no VJP) — training keeps fp32 adapter masters.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    m, D = x2.shape
    L, _, DH = fz["wd"].shape
    bk = next(b for b in (512, 384, 256, 128)
              if D % b == 0 and DH % b == 0)
    if jax.default_backend() == "tpu" and m <= 64:
        bm = ((m + 7) // 8) * 8
        if bm != m:
            x2 = jnp.pad(x2, ((0, bm - m), (0, 0)))
        nkd = D // bk
        n_k = nkd + DH // bk
        idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
        out = pl.pallas_call(
            functools.partial(_fused_adapter_kernel, nkd=nkd, n_k=n_k,
                              bk=bk),
            out_shape=jax.ShapeDtypeStruct((bm, D), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bm // bm, n_k),  # single m-block (m <= 64)
                in_specs=[
                    pl.BlockSpec(
                        (bm, bk),
                        lambda i, kb, ir: (i, jnp.where(kb < nkd, kb, 0)),
                    ),
                    pl.BlockSpec(
                        (1, bk, DH),
                        lambda i, kb, ir:
                        (ir[0], jnp.where(kb < nkd, kb, 0), 0),
                    ),
                    pl.BlockSpec(
                        (1, bk, D),
                        lambda i, kb, ir:
                        (ir[0], jnp.where(kb >= nkd, kb - nkd, 0), 0),
                    ),
                    pl.BlockSpec((1, 1, DH), lambda i, kb, ir: (ir[0], 0, 0)),
                    pl.BlockSpec((1, 1, D), lambda i, kb, ir: (ir[0], 0, 0)),
                    pl.BlockSpec((1, 1, DH), lambda i, kb, ir: (ir[0], 0, 0)),
                    pl.BlockSpec((1, 1, D), lambda i, kb, ir: (ir[0], 0, 0)),
                ],
                out_specs=pl.BlockSpec((bm, D), lambda i, kb, ir: (i, 0)),
                scratch_shapes=[pltpu.VMEM((bm, DH), jnp.float32),
                                pltpu.VMEM((bm, D), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(idx, x2, fz["wd"], fz["wu"], fz["sd"], fz["su"], fz["bd"],
          fz["bu"])[:m]
    else:
        li = jnp.asarray(layer_idx)
        wd = (jnp.take(fz["wd"], li, axis=0).astype(jnp.float32)
              * jnp.take(fz["sd"], li, axis=0))
        wu = (jnp.take(fz["wu"], li, axis=0).astype(jnp.float32)
              * jnp.take(fz["su"], li, axis=0))
        h = jax.nn.relu(
            jnp.dot(x2.astype(jnp.bfloat16), wd.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + jnp.take(fz["bd"], li, axis=0))
        out = jnp.dot(h.astype(jnp.bfloat16), wu.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + jnp.take(
                          fz["bu"], li, axis=0)
    out = out.reshape(*lead, D)
    return out.astype(out_dtype) if out_dtype is not None else out


# ---------------------------------------------------------------------------
# layer-boundary fusion: dual(o+fc_out) + adapters + residual/LN + next
# layer's in_proj in ONE launch (the int4 decode hot path)
# ---------------------------------------------------------------------------


def _boundary_kernel(refs, *, nko, n_dual, ad_a, ad_m, t_ep, nki, nj,
                     has_obias, has_uin, has_in, ln_eps):
    """Body for :func:`boundary_fused_stacked`.  ``refs`` is the flat ref
    list in the order assembled by the wrapper; ``ad_a``/``ad_m`` are
    ``None`` or dicts of static phase bounds {t0, nkd, nku, bk, src}.

    Serial-chain economics (scripts/exp_boundary.py, v5e, 6B + v1
    adapters): every Pallas launch on this platform costs ~25 us of
    fixed latency on top of its DMA (exp_dma_floor.py: a 34 MB walk
    floors at 66-72 us vs a 41 us roofline, and the kernel body is free
    — exp_vpu_cost.py measures mask2dot_aq == touch8 within 2 us).  The
    int4 decode path paid that three times per layer; fusing the whole
    inter-attention segment into one phased 1-D grid measured 196.3
    us/layer vs 256.8 for the 3-launch chain = 1.63 ms/token on the 6B
    serial decode.

    Small-DMA elimination: the first version fetched two (8, 256)
    activation blocks and two 16 KB scale rows per grid step — ~160
    sub-32KB DMAs per launch that held the kernel at 169 us/layer vs a
    136 us roofline.  Now the whole activation row block and the
    step-major packed scales (``_pack_boundary_scales``) load ONCE per
    launch as constant-index blocks and are sliced in VMEM by the grid
    step, so the only per-step DMA is the weight stream itself.
    """
    it = iter(refs)
    idx_ref = next(it)  # noqa: F841  (consumed by the index maps)
    xcat_ref, wd_ref, dsd_ref = (next(it) for _ in range(3))
    if ad_a is not None:
        awd, awu, asd, abd, asu, abu = (next(it) for _ in range(6))
    if ad_m is not None:
        mwd, mwu, msd, mbd, msu, mbu = (next(it) for _ in range(6))
    bfo_ref, xres_ref, lng_ref, lnb_ref = (next(it) for _ in range(4))
    obias_ref = next(it) if has_obias else None
    uin_ref = next(it) if has_uin else None
    if has_in:
        wi_ref, dsi_ref = (next(it) for _ in range(2))
    y_ref, u_ref = next(it), next(it)
    fused_ref = next(it) if has_in else None
    acco_ref, accf_ref, mbuf_ref, abuf_ref, ah_ref, au_ref, acci_ref = (
        next(it) for _ in range(7))

    t = pl.program_id(0)
    nkf = n_dual - nko

    # ---- dual o_proj + fc_out (W4A8, production int4 layout) ----
    @pl.when(t == 0)
    def _init():
        acco_ref[...] = jnp.zeros_like(acco_ref)
        accf_ref[...] = jnp.zeros_like(accf_ref)

    @pl.when(t < n_dual)
    def _dual():
        # activation column blocks for this step's lo/hi nibbles, sliced
        # from the resident xcat block ([ctx_lo|ctx_hi|mh_lo|mh_hi])
        b_lo = jnp.where(t < nko, t, 2 * nko + (t - nko))
        b_hi = jnp.where(t < nko, nko + t, 2 * nko + nkf + (t - nko))
        xlo = xcat_ref[:, pl.dslice(b_lo * INT4_GROUP, INT4_GROUP)]
        xhi = xcat_ref[:, pl.dslice(b_hi * INT4_GROUP, INT4_GROUP)]
        xlo_q, sxlo = _quantize_act_block(xlo)
        xhi_q, sxhi = _quantize_act_block(xhi)
        p32 = wd_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.int8)
        hi = (p32 >> 4).astype(jnp.int8)
        plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
        phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
        pair = dsd_ref[0, t]           # (2, bn): step-major packed scales
        upd = (plo.astype(jnp.float32) * sxlo * pair[0:1]
               + phi.astype(jnp.float32) * sxhi * pair[1:2])

        @pl.when(t < nko)
        def _o():
            acco_ref[...] += upd

        @pl.when(t >= nko)
        def _f():
            accf_ref[...] += upd

    def _branch_a():
        """a as the unfused path sees it: bf16(dual out) + o_bias."""
        a = acco_ref[...].astype(jnp.bfloat16)
        if obias_ref is not None:
            a = a + obias_ref[0].astype(jnp.bfloat16)
        return a

    def _adapter_phases(ad, wdr, wur, sdr, bdr, src_buf):
        """down/relu/up phases for one fused-int8 adapter bottleneck
        (mirrors _fused_adapter_kernel, phase-offset by ad['t0'])."""
        t0, nkd, nku, bk = ad["t0"], ad["nkd"], ad["nku"], ad["bk"]

        @pl.when((t >= t0) & (t < t0 + nkd))
        def _down():
            j = t - t0
            xb = src_buf(j, bk)
            ah_ref[:, : wdr.shape[2]] += jax.lax.dot(
                xb, wdr[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

        @pl.when(t == t0 + nkd)
        def _relu():
            dh = wdr.shape[2]
            ah_ref[:, :dh] = jax.nn.relu(
                ah_ref[:, :dh] * sdr[0] + bdr[0])
            au_ref[...] = jnp.zeros_like(au_ref)

        @pl.when((t >= t0 + nkd) & (t < t0 + nkd + nku))
        def _up():
            j = t - (t0 + nkd)
            hs = ah_ref[:, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)
            au_ref[...] += jax.lax.dot(
                hs, wur[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

    if ad_a is not None:
        @pl.when(t == ad_a["t0"])
        def _a_start():
            abuf_ref[...] = _branch_a()
            ah_ref[...] = jnp.zeros_like(ah_ref)

        def _a_src(j, bk):
            buf = uin_ref if ad_a["src"] == "in" else abuf_ref
            return buf[:, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_a, awd, awu, asd, abd, _a_src)

    if ad_m is not None:
        @pl.when(t == ad_m["t0"])
        def _m_start():
            if ad_a is not None:
                # fold the attention adapter's result before reusing au
                abuf_ref[...] += (au_ref[...] * asu[0]
                                  + abu[0]).astype(jnp.bfloat16)
            # bf16(acc) + bf16(bias), matching _boundary_ref's rounding
            # bit-for-bit (ADVICE r4: f32-add-then-cast was 1 ulp off)
            mbuf_ref[...] = (accf_ref[...].astype(jnp.bfloat16)
                             + bfo_ref[0].astype(jnp.bfloat16))
            ah_ref[...] = jnp.zeros_like(ah_ref)

        def _m_src(j, bk):
            buf = uin_ref if ad_m["src"] == "in" else mbuf_ref
            return buf[:, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_m, mwd, mwu, msd, mbd, _m_src)

    # ---- residual + next-layer LN epilogue ----
    @pl.when(t == t_ep)
    def _epilogue():
        if ad_a is not None and ad_m is None:
            abuf_ref[...] += (au_ref[...] * asu[0]
                              + abu[0]).astype(jnp.bfloat16)
        a = abuf_ref[...] if ad_a is not None else _branch_a()
        if ad_m is not None:
            m2 = mbuf_ref[...] + (au_ref[...] * msu[0]
                                  + mbu[0]).astype(jnp.bfloat16)
        else:
            m2 = (accf_ref[...].astype(jnp.bfloat16)
                  + bfo_ref[0].astype(jnp.bfloat16))
        y = xres_ref[...] + a + m2
        y_ref[...] = y
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mu), axis=1, keepdims=True)
        un = (y32 - mu) * jax.lax.rsqrt(var + ln_eps)
        u_ref[...] = (un * lng_ref[0] + lnb_ref[0]).astype(jnp.bfloat16)

    # ---- next layer's in_proj (W4A8 on the just-written u) ----
    if has_in:
        @pl.when(t >= t_ep)
        def _inproj():
            rel = t - t_ep
            kb = rel % nki

            @pl.when(kb == 0)
            def _iinit():
                acci_ref[...] = jnp.zeros_like(acci_ref)

            ulo = u_ref[:, pl.dslice(kb * INT4_GROUP, INT4_GROUP)]
            uhi = u_ref[:, pl.dslice((nki + kb) * INT4_GROUP, INT4_GROUP)]
            ulo_q, sulo = _quantize_act_block(ulo)
            uhi_q, suhi = _quantize_act_block(uhi)
            p32 = wi_ref[0].astype(jnp.int32)
            lo = ((p32 << 28) >> 28).astype(jnp.int8)
            hi = (p32 >> 4).astype(jnp.int8)
            plo = jax.lax.dot(ulo_q, lo, preferred_element_type=jnp.int32)
            phi = jax.lax.dot(uhi_q, hi, preferred_element_type=jnp.int32)
            pair = dsi_ref[0, 0, kb]   # (2, bni) packed in_proj scales
            acci_ref[...] += (
                plo.astype(jnp.float32) * sulo * pair[0:1]
                + phi.astype(jnp.float32) * suhi * pair[1:2])

            @pl.when(kb == nki - 1)
            def _istore():
                fused_ref[...] = acci_ref[...].astype(jnp.bfloat16)


def _boundary_ref(ctx, mh, x, w_dual, b_fc_out, ln_g, ln_b, layer_idx, *,
                  w_in, fz_attn, attn_src, fz_mlp, mlp_src, u_in, o_bias,
                  ln_eps):
    """Unfused composition of the boundary segment — the exact op sequence
    gptj._block runs today (dual + adapters + residual + LN + in_proj).
    Fallback for non-TPU backends / off-geometry dims, and the numerics
    oracle for the kernel's tests."""
    li = layer_idx
    a, m = dual_matmul_stacked(ctx, mh, w_dual, li, out_dtype=jnp.bfloat16)
    if o_bias is not None:
        a = a + jnp.take(o_bias, li, axis=0).reshape(1, -1).astype(
            jnp.bfloat16)
    if fz_attn is not None:
        src = u_in if attn_src == "in" else a
        a = a + fused_adapter_stacked(src, fz_attn, li,
                                      out_dtype=jnp.bfloat16)
    m = m + jnp.take(b_fc_out, li, axis=0).reshape(1, -1).astype(
        jnp.bfloat16)
    if fz_mlp is not None:
        src = u_in if mlp_src == "in" else m
        m = m + fused_adapter_stacked(src, fz_mlp, li,
                                      out_dtype=jnp.bfloat16)
    y = x + a + m
    y32 = y.astype(jnp.float32)
    mu = y32.mean(-1, keepdims=True)
    var = y32.var(-1, keepdims=True)
    u = ((y32 - mu) * jax.lax.rsqrt(var + ln_eps)
         * jnp.take(ln_g, li, axis=0).reshape(1, -1)
         + jnp.take(ln_b, li, axis=0).reshape(1, -1)).astype(jnp.bfloat16)
    if w_in is None:
        return y, u
    nxt = jnp.asarray(li) + 1
    fused = int4_matmul_stacked(u, w_in["q4"], w_in["s4"], nxt,
                                out_dtype=jnp.bfloat16)
    return y, u, fused


def _adapter_bk(D: int, DH: int):
    return next((b for b in (512, 384, 256, 128)
                 if D % b == 0 and DH % b == 0), None)


def _boundary_inproj_block(NI: int) -> int:
    return _pick_block(NI, prefer=(14336, 4096, 2048, 1024, 512, 256, 128))


def _pack_boundary_scales(w_dual, w_in, D: int, F: int):
    """Step-major scale tensors for the boundary kernel, so each launch
    fetches ONE constant-index scale block instead of two 16 KB rows per
    grid step (the sub-32KB DMAs dominated the kernel's gap to its DMA
    roofline — see _boundary_kernel).

    Returns (dsd, dsi):
      dsd (L, n_dual, 2, D) f32 — dual-phase step t reads [t, 0]=lo-nibble
        group scales, [t, 1]=hi (row order mirrors _int4_dual_2d's maps).
      dsi (L, nj, nki, 2, bni) f32 or None — in_proj phase (j, kb) reads
        [j, kb, 0/1].
    ``quantize_lm_params_int4`` stores these in the payloads ("dsb");
    the wrapper rebuilds on the fly when absent (hoisted per invocation).
    """
    s4 = w_dual["s4"]
    L = s4.shape[0]
    nko, nkf = (D // 2) // INT4_GROUP, (F // 2) // INT4_GROUP
    t = jnp.arange(nko + nkf)
    rows_lo = jnp.where(t < nko, t, t + nko)
    rows_hi = jnp.where(t < nko, t + nko, t + nko + nkf)
    dsd = jnp.stack(
        [jnp.take(s4, rows_lo, axis=1), jnp.take(s4, rows_hi, axis=1)],
        axis=2)
    dsi = None
    if w_in is not None:
        si = w_in["s4"]
        NI = si.shape[-1]
        bni = _boundary_inproj_block(NI)
        nj, nki = NI // bni, (D // 2) // INT4_GROUP
        # (L, 2*nki, NI): rows [0, nki) scale lo nibbles, [nki, 2*nki) hi
        dsi = jnp.stack([si[:, :nki], si[:, nki:2 * nki]], axis=2)
        dsi = dsi.reshape(L, nki, 2, nj, bni).transpose(0, 3, 1, 2, 4)
    return dsd, dsi


def boundary_fused_stacked(ctx, mh, x, w_dual, b_fc_out, ln_g, ln_b,
                           layer_idx, *, w_in=None, fz_attn=None,
                           attn_src="out", fz_mlp=None, mlp_src="out",
                           u_in=None, o_bias=None, ln_eps=1e-5):
    """Everything between two decode attentions in ONE Pallas launch:

        a  = ctx @ W_o [+ o_bias] [+ adapter_attn]
        m  = mh @ W_fc_out + b_fc_out [+ adapter_mlp]
        y  = x + a + m
        u  = LN(y; ln_g/ln_b[layer_idx])          (the NEXT layer's ln_1,
                                                   or ln_f after the last)
        fused = u @ W_in[layer_idx + 1]           (when ``w_in`` given)

    Inputs are 2-D rows (m <= 8 — the b <= 8 decode regime); weights are
    the stacked production int4 payloads (``gptj.quantize_lm_params_int4``)
    and fused-int8 adapter payloads; ``b_fc_out``/``ln_g``/``ln_b``/
    ``o_bias`` are (L, D) f32 stacks, where ``ln_*[l]`` holds the LN that
    FOLLOWS layer ``l``.  ``u_in`` is this layer's own LN output (needed
    as the bottleneck input for parallel/scaled_parallel adapters).

    Returns ``(y, u)`` or ``(y, u, fused)``.  Why one launch: a serial-
    chain Pallas launch costs ~25 us fixed on top of its DMA (see
    _boundary_kernel docstring); this replaces 3 launches + the XLA
    residual/LN glue — measured 196.3 vs 256.8 us/layer on the 6B chain
    (scripts/exp_boundary.py) = 1.63 ms/token.  Serving-only (no VJP).
    """
    m_rows, D = ctx.shape
    F = mh.shape[1]
    kpo, kpf = D // 2, F // 2
    NI = None if w_in is None else w_in["q4"].shape[-1]
    if w_in is not None:
        # The in_proj phase reads layer ``layer_idx + 1`` of w_in: a last-
        # layer call with w_in set would address block row L of an (L, ...)
        # array (clamped/garbage reads, silently wrong results).  Callers
        # must pass w_in=None on the last layer (_run_decode_boundary
        # does).  Guard statically when the index is concrete; traced
        # indices keep the documented precondition.
        if isinstance(layer_idx, (int,)) and layer_idx >= w_in["q4"].shape[0] - 1:
            raise ValueError(
                f"boundary_fused_stacked: layer_idx={layer_idx} with w_in "
                f"set would read layer {layer_idx + 1} of an "
                f"{w_in['q4'].shape[0]}-layer stack; pass w_in=None on the "
                "last layer")

    def spec_of(fz, src):
        if fz is None:
            return None
        DH = fz["wd"].shape[2]
        return {"DH": DH, "bk": _adapter_bk(D, DH), "src": src}

    sa, sm = spec_of(fz_attn, attn_src), spec_of(fz_mlp, mlp_src)
    geometry_ok = (
        jax.default_backend() == "tpu"
        and m_rows <= 8
        and D % (2 * INT4_GROUP) == 0
        and F % (2 * INT4_GROUP) == 0
        and D % 128 == 0
        and w_dual["q4"].shape[1] == kpo + kpf
        and w_dual["s4"].shape[1] == (D + F) // INT4_GROUP
        and all(s is None or (s["bk"] and s["DH"] % 128 == 0)
                for s in (sa, sm))
        and (NI is None or (NI % 128 == 0
                            and (D // 2) % INT4_GROUP == 0
                            and w_in["s4"].shape[1] == D // INT4_GROUP))
        and not any(s is not None and s["src"] == "in" and u_in is None
                    for s in (sa, sm))
    )
    if not geometry_ok:
        return _boundary_ref(
            ctx, mh, x, w_dual, b_fc_out, ln_g, ln_b, layer_idx,
            w_in=w_in, fz_attn=fz_attn, attn_src=attn_src, fz_mlp=fz_mlp,
            mlp_src=mlp_src, u_in=u_in, o_bias=o_bias, ln_eps=ln_eps)

    if m_rows < 8:
        pad = ((0, 8 - m_rows), (0, 0))
        ctx, mh, x = (jnp.pad(t, pad) for t in (ctx, mh, x))
        if u_in is not None:
            u_in = jnp.pad(u_in, pad)

    L = w_dual["q4"].shape[0]
    Gd = w_dual["s4"].shape[1]
    nko, nkf = kpo // INT4_GROUP, kpf // INT4_GROUP
    n_dual = nko + nkf
    t0 = n_dual
    ad_a = ad_m = None
    if sa is not None:
        ad_a = {"t0": t0, "nkd": D // sa["bk"], "nku": sa["DH"] // sa["bk"],
                "bk": sa["bk"], "src": sa["src"]}
        t0 += ad_a["nkd"] + ad_a["nku"]
    if sm is not None:
        ad_m = {"t0": t0, "nkd": D // sm["bk"], "nku": sm["DH"] // sm["bk"],
                "bk": sm["bk"], "src": sm["src"]}
        t0 += ad_m["nkd"] + ad_m["nku"]
    t_ep = t0
    if NI is not None:
        bni = _boundary_inproj_block(NI)
        nj, nki = NI // bni, (D // 2) // INT4_GROUP
        T = t_ep + nj * nki
    else:
        bni, nj, nki = 128, 1, 0
        T = t_ep + 1

    xcat = jnp.concatenate(
        [ctx[:, :kpo], ctx[:, kpo:], mh[:, :kpf], mh[:, kpf:]], axis=1)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    # step-major packed scales: stored by quantize_lm_params_int4 ("dsb");
    # rebuilt on the fly (and hoisted out of decode loops) when absent
    dsd = w_dual.get("dsb")
    dsi = None if w_in is None else w_in.get("dsb")
    if dsd is None or (NI is not None and dsi is None):
        dsd_new, dsi_new = _pack_boundary_scales(w_dual, w_in, D, F)
        dsd = dsd if dsd is not None else dsd_new
        dsi = dsi if dsi is not None else dsi_new
    if dsi is not None and dsi.shape[-1] != bni:
        _, dsi = _pack_boundary_scales(w_dual, w_in, D, F)

    def wd_idx(t, ir):
        return (ir[0], jnp.minimum(t, n_dual - 1), 0)

    def vec_idx(t, ir):
        return (ir[0], 0, 0)

    args = [idx, xcat, w_dual["q4"], dsd]
    in_specs = [
        pl.BlockSpec((8, xcat.shape[1]), lambda t, ir: (0, 0)),
        pl.BlockSpec((1, INT4_GROUP, D), wd_idx),
        pl.BlockSpec((1, n_dual, 2, D), lambda t, ir: (ir[0], 0, 0, 0)),
    ]

    def add_adapter(fz, ad):
        DH = fz["wd"].shape[2]
        t0a, nkd, bk = ad["t0"], ad["nkd"], ad["bk"]

        def wd_i(t, ir, t0a=t0a, nkd=nkd):
            return (ir[0], jnp.clip(t - t0a, 0, nkd - 1), 0)

        def wu_i(t, ir, t0a=t0a, nkd=nkd, nku=ad["nku"]):
            return (ir[0], jnp.clip(t - (t0a + nkd), 0, nku - 1), 0)

        args.extend([fz["wd"], fz["wu"], fz["sd"], fz["bd"], fz["su"],
                     fz["bu"]])
        in_specs.extend([
            pl.BlockSpec((1, bk, DH), wd_i),
            pl.BlockSpec((1, bk, D), wu_i),
            pl.BlockSpec((1, 1, DH), vec_idx),
            pl.BlockSpec((1, 1, DH), vec_idx),
            pl.BlockSpec((1, 1, D), vec_idx),
            pl.BlockSpec((1, 1, D), vec_idx),
        ])

    if ad_a is not None:
        add_adapter(fz_attn, ad_a)
    if ad_m is not None:
        add_adapter(fz_mlp, ad_m)

    args.extend([b_fc_out.reshape(L, 1, D), x,
                 ln_g.reshape(L, 1, D), ln_b.reshape(L, 1, D)])
    in_specs.extend([
        pl.BlockSpec((1, 1, D), vec_idx),
        pl.BlockSpec((8, D), lambda t, ir: (0, 0)),
        pl.BlockSpec((1, 1, D), vec_idx),
        pl.BlockSpec((1, 1, D), vec_idx),
    ])
    if o_bias is not None:
        args.append(o_bias.reshape(L, 1, D))
        in_specs.append(pl.BlockSpec((1, 1, D), vec_idx))
    if u_in is not None:
        args.append(u_in)
        in_specs.append(pl.BlockSpec((8, D), lambda t, ir: (0, 0)))
    if NI is not None:
        def wi_idx(t, ir):
            rel = jnp.clip(t - t_ep, 0, nj * nki - 1)
            return (ir[0] + 1, rel % nki, rel // nki)

        def dsi_idx(t, ir):
            rel = jnp.clip(t - t_ep, 0, nj * nki - 1)
            return (ir[0] + 1, rel // nki, 0, 0, 0)

        args.extend([w_in["q4"], dsi])
        in_specs.extend([
            pl.BlockSpec((1, INT4_GROUP, bni), wi_idx),
            pl.BlockSpec((1, 1, nki, 2, bni), dsi_idx),
        ])

    out_shape = [jax.ShapeDtypeStruct((8, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((8, D), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((8, D), lambda t, ir: (0, 0)),
                 pl.BlockSpec((8, D), lambda t, ir: (0, 0))]
    if NI is not None:
        out_shape.append(jax.ShapeDtypeStruct((8, NI), jnp.bfloat16))
        out_specs.append(pl.BlockSpec(
            (8, bni),
            lambda t, ir: (0, jnp.clip(t - t_ep, 0, nj * nki - 1) // nki)))

    dh_max = max([1] + [s["DH"] for s in (sa, sm) if s is not None])
    scratch = [
        pltpu.VMEM((8, D), jnp.float32),       # acco
        pltpu.VMEM((8, D), jnp.float32),       # accf
        pltpu.VMEM((8, D), jnp.bfloat16),      # mbuf
        pltpu.VMEM((8, D), jnp.bfloat16),      # abuf
        pltpu.VMEM((8, dh_max), jnp.float32),  # ah
        pltpu.VMEM((8, D), jnp.float32),       # au
        pltpu.VMEM((8, bni), jnp.float32),     # acci
    ]

    kernel = functools.partial(
        _boundary_kernel, nko=nko, n_dual=n_dual, ad_a=ad_a, ad_m=ad_m,
        t_ep=t_ep, nki=nki, nj=nj, has_obias=o_bias is not None,
        has_uin=u_in is not None, has_in=NI is not None, ln_eps=ln_eps)

    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    if NI is None:
        y, u = outs
        return y[:m_rows], u[:m_rows]
    y, u, fused = outs
    return y[:m_rows], u[:m_rows], fused[:m_rows]
