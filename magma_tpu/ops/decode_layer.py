"""Whole-decoder-layer fused decode kernel: attention INSIDE the launch.

Round-4 pinned single-stream decode at the weight-bandwidth wall with
~0.35 ms/tok of XLA glue (rotary, attention einsums, gelu) plus
~0.8 ms/tok of wall-vs-device gaps between the per-layer ops
(PARITY.md round-5 note).  This module removes both: ONE Pallas launch
per layer now covers

    rotary(q, k) -> decode attention over the KV cache -> gelu ->
    o_proj + fc_out (dual) -> adapters -> residual -> next LN ->
    next layer's in_proj

so the 28-layer decode step is 28 back-to-back kernel launches with no
XLA ops between them.  The reference equivalent is the HF
past_key_values decode hot loop (magma/sampling.py:87-90).

Key design decisions (validated on-chip, v5e):

* **Rotary as a matmul.**  Rotate-every-two is a per-head linear map, so
  ``q_rot = q @ R(pos)`` with R a (hd, hd) block-diagonal rotation built
  once per token in XLA (``rotary_matrix``) — exact, and it avoids
  strided lane shuffles that Mosaic lowers poorly.
* **3-D score/V math.**  scores = sum(K_block * q, axis=-1) on
  (sblk, h, hd) values and ctx += sum(V_block * p, axis=0) — no
  transposes or mask matmuls of big tiles; measured ~7 us/layer for the
  whole attention block at short context, riding the cache DMA floor
  (the earlier merged-MXU + diagonal-extraction formulation hit Mosaic
  relayout failures and was no faster).
* **Online softmax over position blocks** with the current token's
  self-attention as the initial state; blocks past the valid length are
  skipped by clamped BlockSpec index maps (same index -> no DMA) plus
  ``pl.when`` (no compute).
* **Cache scales enter position-major** ((L, b, max_len, h), transposed
  once per token in XLA) so the per-(position, head) int8 KV scales fold
  into the (sblk, h) score tiles with a plain broadcast.
* The dual / adapter / epilogue / in_proj phases mirror
  ``quant._boundary_kernel`` (see its serial-chain economics docstring),
  with activations sliced from in-kernel scratch (the attention output)
  instead of a kernel input.  Both the int4 W4A8 layout
  (``gptj.quantize_lm_params_int4``) and the int8 per-channel layout
  (``gptj.quantize_lm_params``) are supported — int8 uses bf16-convert
  dots (W8A8 measured slightly slower at int8's byte ratio, see
  quant._int8_matmul_stacked_kernel).

b=1 only (the single-stream latency path); larger batches keep the
round-4 boundary path.  Serving-only: no VJP.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magma_tpu.ops.quant import (INT4_GROUP, _boundary_inproj_block,
                                 _boundary_ref, _pack_boundary_scales,
                                 _quantize_act_block)
from magma_tpu.ops.rotary import rotary_sincos

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def rotary_matrix(positions: jnp.ndarray, rotary_dim: int,
                  head_dim: int, base: float = 10000.0) -> jnp.ndarray:
    """(b,) int positions -> (b, hd, hd) f32 with x @ R == apply_rotary(x).

    R is identity outside the first ``rotary_dim`` dims; inside, pair
    (2i, 2i+1) rotates by the position's angle_i (ops/rotary.apply_rotary
    conventions).  Exact: each output element is the same two-term
    expression the elementwise form computes.
    """
    b = positions.shape[0]
    sin, cos = rotary_sincos(positions.astype(jnp.int32), rotary_dim, base)
    R = jnp.broadcast_to(jnp.eye(head_dim, dtype=jnp.float32),
                         (b, head_dim, head_dim))
    i2 = 2 * jnp.arange(rotary_dim // 2)
    R = R.at[:, i2, i2].set(cos)
    R = R.at[:, i2 + 1, i2 + 1].set(cos)
    R = R.at[:, i2, i2 + 1].set(sin)
    R = R.at[:, i2 + 1, i2].set(-sin)
    return R


def _declayer_kernel(refs, *, h, hd, F, wf, sblk, n_attn, nko, n_dual,
                     ad_a, ad_m, t_ep, nki, nj, has_obias, has_uin, has_in,
                     has_kvs, scale, ln_eps):
    """Kernel body.  ``refs`` is the flat ref list in wrapper order;
    static phase bounds mirror quant._boundary_kernel.  wf: "int4" |
    "int8" weight format.  Grid: t in [0, t_ep + nj*nki) serial."""
    D = h * hd
    it = iter(refs)
    sidx_ref = next(it)                      # (2,): [layer, pos]
    fused_ref, rot_ref, kc_ref, vc_ref = (next(it) for _ in range(4))
    if has_kvs:
        kst_ref, vst_ref = next(it), next(it)
    wd_ref = next(it)
    if wf == "int4":
        dsd_ref = next(it)                   # (1, n_dual, 2, D) step-major
    else:
        s2_ref = next(it)                    # (1, 2, D) per-channel
    bfi_ref = next(it)                       # (1, 1, F) fc_in bias
    if ad_a is not None:
        awd, awu, asd, abd, asu, abu = (next(it) for _ in range(6))
    if ad_m is not None:
        mwd, mwu, msd, mbd, msu, mbu = (next(it) for _ in range(6))
    bfo_ref, xres_ref, lng_ref, lnb_ref = (next(it) for _ in range(4))
    obias_ref = next(it) if has_obias else None
    uin_ref = next(it) if has_uin else None
    if has_in:
        wi_ref = next(it)
        si_ref = next(it)                    # int4: dsi; int8: (1, 1, bni)
    y_ref, u_ref, knew_ref, vnew_ref = (next(it) for _ in range(4))
    fused_out = next(it) if has_in else None
    (q_s, m_s, l_s, ctxacc_s, ctx_s, mh_s, acco_s, accf_s, mbuf_s, abuf_s,
     ah_s, au_s, acci_s) = (next(it) for _ in range(13))

    t = pl.program_id(0)
    pos = sidx_ref[1]
    nkf = n_dual - nko

    # ---- phase 0: rotary + self-attention init + k/v outputs ----
    @pl.when(t == 0)
    def _prologue():
        qh = fused_ref[0:1, :D].reshape(h, hd)
        kh = fused_ref[0:1, D:2 * D].reshape(h, hd)
        vh = fused_ref[0:1, 2 * D:3 * D].reshape(h, hd)
        R = rot_ref[0]
        q_rot = jax.lax.dot(qh.astype(jnp.float32), R,
                            preferred_element_type=jnp.float32)
        k_rot = jax.lax.dot(kh.astype(jnp.float32), R,
                            preferred_element_type=jnp.float32)
        q_s[...] = q_rot * scale             # fold attention scale into q
        # flat (1, D) outputs: (1, h, hd)-shaped outputs forced ~50 us
        # layout-conversion copies per launch on the serial chain
        knew_ref[...] = k_rot.reshape(1, D).astype(jnp.bfloat16)
        vnew_ref[...] = fused_ref[0:1, 2 * D:3 * D]
        s_self = jnp.sum(q_s[...] * k_rot, axis=1, keepdims=True)  # (h, 1)
        m_s[...] = s_self.T                                        # (1, h)
        l_s[...] = jnp.ones_like(l_s)        # p_self = exp(0) = 1
        ctxacc_s[...] = vh.astype(jnp.float32)
        acco_s[...] = jnp.zeros_like(acco_s)
        accf_s[...] = jnp.zeros_like(accf_s)

    # ---- attention over valid cache position blocks ----
    @pl.when((t < n_attn) & (t * sblk < pos))
    def _attn_block():
        k3 = kc_ref[0, 0].astype(jnp.float32)          # (sblk, h, hd)
        s3 = jnp.sum(k3 * q_s[...][None], axis=2)      # (sblk, h)
        if has_kvs:
            s3 = s3 * kst_ref[0, 0].astype(jnp.float32)
        jpos = t * sblk + jax.lax.broadcasted_iota(
            jnp.int32, (sblk, h), 0)
        s3 = jnp.where(jpos < pos, s3, NEG_INF)
        m_old = m_s[...]
        m_new = jnp.maximum(m_old, jnp.max(s3, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s3 - m_new)
        m_s[...] = m_new
        l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
        if has_kvs:
            p = p * vst_ref[0, 0].astype(jnp.float32)
        v3 = vc_ref[0, 0].astype(jnp.float32)
        ctxacc_s[...] = (ctxacc_s[...] * alpha.T
                         + jnp.sum(v3 * p[:, :, None], axis=0))

    # ---- finalize ctx + gelu(mh) at the dual-phase boundary ----
    @pl.when(t == n_attn)
    def _finalize():
        # ctx stored FLAT (1, D): the dual phase then takes lane slices
        # at affine multiples of hd (Mosaic rejects dynamic SUBLANE
        # slices of an (h, hd) buffer — not provably 8-aligned)
        ctx = (ctxacc_s[...] / l_s[...].T).astype(jnp.bfloat16)
        ctx_s[0:1, :] = ctx.reshape(1, D)
        mh = (fused_ref[0:1, 3 * D:3 * D + F].astype(jnp.float32)
              + bfi_ref[0].astype(jnp.float32))
        mh_s[0:1, :] = jax.nn.gelu(mh, approximate=True).astype(
            jnp.bfloat16)

    # ---- dual o_proj + fc_out ----
    tp = t - n_attn

    def _dual_upd_int4(xlo, xhi):
        xlo_q, sxlo = _quantize_act_block(xlo)
        xhi_q, sxhi = _quantize_act_block(xhi)
        p32 = wd_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.int8)
        hi = (p32 >> 4).astype(jnp.int8)
        plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
        phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
        pair = dsd_ref[0, tp]               # (2, D) step-major scales
        return (plo.astype(jnp.float32) * sxlo * pair[0:1]
                + phi.astype(jnp.float32) * sxhi * pair[1:2])

    def _dual_upd_int8(x):
        w = wd_ref[0].astype(jnp.bfloat16)
        return jax.lax.dot(x.astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)

    def _dual_store(upd):
        @pl.when(tp < nko)
        def _o():
            acco_s[0:1] += upd

        @pl.when(tp >= nko)
        def _f():
            accf_s[0:1] += upd

    if wf == "int4":
        @pl.when((t >= n_attn) & (tp < n_dual))
        def _dual4():
            @pl.when(tp < nko)
            def _ctx_part():
                xlo = ctx_s[0:1, pl.dslice(tp * hd, hd)]
                xhi = ctx_s[0:1, pl.dslice((nko + tp) * hd, hd)]
                _dual_store(_dual_upd_int4(xlo, xhi))

            @pl.when(tp >= nko)
            def _mh_part():
                j2 = tp - nko
                xlo = mh_s[0:1, pl.dslice(j2 * hd, hd)]
                xhi = mh_s[0:1, pl.dslice((nkf + j2) * hd, hd)]
                _dual_store(_dual_upd_int4(xlo, xhi))
    else:
        @pl.when((t >= n_attn) & (tp < n_dual))
        def _dual8():
            @pl.when(tp < nko)
            def _ctx_part():
                _dual_store(_dual_upd_int8(
                    ctx_s[0:1, pl.dslice(tp * hd, hd)]))

            @pl.when(tp >= nko)
            def _mh_part():
                j2 = tp - nko
                _dual_store(_dual_upd_int8(
                    mh_s[0:1, pl.dslice(j2 * hd, hd)]))

    def _branch_a():
        """a as the unfused path sees it: bf16(acc [* scale]) + o_bias.
        Single row (b=1): every activation in this kernel is (1, .)."""
        if wf == "int4":
            a = acco_s[0:1].astype(jnp.bfloat16)
        else:
            a = (acco_s[0:1] * s2_ref[0, 0:1]).astype(jnp.bfloat16)
        if obias_ref is not None:
            a = a + obias_ref[0].astype(jnp.bfloat16)
        return a

    def _branch_m_pre():
        if wf == "int4":
            return accf_s[0:1].astype(jnp.bfloat16)
        return (accf_s[0:1] * s2_ref[0, 1:2]).astype(jnp.bfloat16)

    # ---- adapter bottlenecks (fused int8, phase-offset) ----
    def _adapter_phases(ad, wdr, wur, sdr, bdr, src_buf):
        t0, nkd, nku, bk = ad["t0"], ad["nkd"], ad["nku"], ad["bk"]

        @pl.when((t >= t0) & (t < t0 + nkd))
        def _down():
            j = t - t0
            xb = src_buf(j, bk)
            ah_s[0:1, : wdr.shape[2]] += jax.lax.dot(
                xb, wdr[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

        @pl.when(t == t0 + nkd)
        def _relu():
            dh = wdr.shape[2]
            ah_s[0:1, :dh] = jax.nn.relu(ah_s[0:1, :dh] * sdr[0] + bdr[0])
            au_s[...] = jnp.zeros_like(au_s)

        @pl.when((t >= t0 + nkd) & (t < t0 + nkd + nku))
        def _up():
            j = t - (t0 + nkd)
            hs = ah_s[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)
            au_s[0:1] += jax.lax.dot(
                hs, wur[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

    if ad_a is not None:
        @pl.when(t == ad_a["t0"])
        def _a_start():
            abuf_s[0:1] = _branch_a()
            ah_s[...] = jnp.zeros_like(ah_s)

        def _a_src(j, bk):
            buf = uin_ref if ad_a["src"] == "in" else abuf_s
            return buf[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_a, awd, awu, asd, abd, _a_src)

    if ad_m is not None:
        @pl.when(t == ad_m["t0"])
        def _m_start():
            if ad_a is not None:
                abuf_s[0:1] += (au_s[0:1] * asu[0]
                                + abu[0]).astype(jnp.bfloat16)
            mbuf_s[0:1] = (_branch_m_pre()
                           + bfo_ref[0].astype(jnp.bfloat16))
            ah_s[...] = jnp.zeros_like(ah_s)

        def _m_src(j, bk):
            buf = uin_ref if ad_m["src"] == "in" else mbuf_s
            return buf[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_m, mwd, mwu, msd, mbd, _m_src)

    # ---- residual + next-layer LN epilogue ----
    @pl.when(t == t_ep)
    def _epilogue():
        if ad_a is not None and ad_m is None:
            abuf_s[0:1] += (au_s[0:1] * asu[0]
                            + abu[0]).astype(jnp.bfloat16)
        a = abuf_s[0:1] if ad_a is not None else _branch_a()
        if ad_m is not None:
            m2 = mbuf_s[0:1] + (au_s[0:1] * msu[0]
                                + mbu[0]).astype(jnp.bfloat16)
        else:
            m2 = _branch_m_pre() + bfo_ref[0].astype(jnp.bfloat16)
        y = xres_ref[...] + a + m2
        y_ref[...] = y
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mu), axis=1, keepdims=True)
        un = (y32 - mu) * jax.lax.rsqrt(var + ln_eps)
        u_ref[...] = (un * lng_ref[0] + lnb_ref[0]).astype(jnp.bfloat16)

    # ---- next layer's in_proj on the just-written u ----
    if has_in:
        @pl.when(t >= t_ep)
        def _inproj():
            rel = t - t_ep
            kb = rel % nki

            @pl.when(kb == 0)
            def _iinit():
                acci_s[...] = jnp.zeros_like(acci_s)

            if wf == "int4":
                ulo = u_ref[0:1, pl.dslice(kb * INT4_GROUP, INT4_GROUP)]
                uhi = u_ref[0:1, pl.dslice((nki + kb) * INT4_GROUP,
                                           INT4_GROUP)]
                ulo_q, sulo = _quantize_act_block(ulo)
                uhi_q, suhi = _quantize_act_block(uhi)
                p32 = wi_ref[0].astype(jnp.int32)
                lo = ((p32 << 28) >> 28).astype(jnp.int8)
                hi = (p32 >> 4).astype(jnp.int8)
                plo = jax.lax.dot(ulo_q, lo,
                                  preferred_element_type=jnp.int32)
                phi = jax.lax.dot(uhi_q, hi,
                                  preferred_element_type=jnp.int32)
                pair = si_ref[0, 0, kb]         # (2, bni)
                acci_s[0:1] += (
                    plo.astype(jnp.float32) * sulo * pair[0:1]
                    + phi.astype(jnp.float32) * suhi * pair[1:2])
            else:
                ub = u_ref[0:1, pl.dslice(kb * INT4_GROUP, INT4_GROUP)]
                w = wi_ref[0].astype(jnp.bfloat16)
                acci_s[0:1] += jax.lax.dot(
                    ub.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)

            @pl.when(kb == nki - 1)
            def _istore():
                if wf == "int4":
                    fused_out[...] = acci_s[0:1].astype(jnp.bfloat16)
                else:
                    fused_out[...] = (acci_s[0:1] * si_ref[0]).astype(
                        jnp.bfloat16)


def _declayer_ref(fused_in, x, rotmat, k_cache, v_cache, kv_scales,
                  cache_pos, w_dual, b_fc_in, b_fc_out, ln_g, ln_b,
                  layer_idx, *, n_heads, w_in, fz_attn, attn_src, fz_mlp,
                  mlp_src, u_in, o_bias, scale, ln_eps=1e-5):
    """Unfused XLA composition of the whole layer — the numerics oracle
    and the non-TPU fallback.  Same math as the kernel: rotary via the
    R matmul, f32 online-softmax-equivalent attention with the self
    token, bf16 ctx/mh handed to quant._boundary_ref."""
    h = n_heads
    F = b_fc_in.shape[-1]
    D = (fused_in.shape[1] - F) // 3
    hd = D // h
    li = layer_idx
    q = fused_in[0:1, :D].reshape(h, hd).astype(jnp.float32)
    k = fused_in[0:1, D:2 * D].reshape(h, hd).astype(jnp.float32)
    v = fused_in[0:1, 2 * D:3 * D].reshape(h, hd).astype(jnp.float32)
    R = rotmat[0]
    q_rot = (q @ R) * scale
    k_rot = k @ R
    kc = jnp.take(k_cache, li, axis=0)[0].astype(jnp.float32)
    vc = jnp.take(v_cache, li, axis=0)[0].astype(jnp.float32)
    max_len = kc.shape[0]
    scores = jnp.einsum("khd,hd->kh", kc, q_rot)
    if kv_scales is not None:
        kst, vst = kv_scales                  # (L, 1, max_len, h)
        scores = scores * jnp.take(kst, li, axis=0)[0].astype(jnp.float32)
    valid = jnp.arange(max_len)[:, None] < jnp.asarray(cache_pos).reshape(())
    scores = jnp.where(valid, scores, NEG_INF)
    s_self = jnp.sum(q_rot * k_rot, axis=1)          # (h,)
    m = jnp.maximum(jnp.max(scores, axis=0), s_self)
    p = jnp.exp(scores - m[None, :])
    p_self = jnp.exp(s_self - m)
    l = jnp.sum(p, axis=0) + p_self
    if kv_scales is not None:
        p = p * jnp.take(vst, li, axis=0)[0].astype(jnp.float32)
    ctx = (jnp.einsum("kh,khd->hd", p, vc)
           + p_self[:, None] * v) / l[:, None]
    ctx_row = ctx.reshape(1, D).astype(jnp.bfloat16)
    mh = jax.nn.gelu(
        fused_in[0:1, 3 * D:].astype(jnp.float32)
        + jnp.take(b_fc_in, li, axis=0).reshape(1, F),
        approximate=True).astype(jnp.bfloat16)
    y, u = _boundary_ref(
        ctx_row, mh, x, w_dual, b_fc_out, ln_g, ln_b, li,
        w_in=None, fz_attn=fz_attn, attn_src=attn_src, fz_mlp=fz_mlp,
        mlp_src=mlp_src, u_in=u_in, o_bias=o_bias, ln_eps=ln_eps)
    k_new = k_rot.reshape(1, h * hd).astype(jnp.bfloat16)
    v_new = v.reshape(1, h * hd).astype(jnp.bfloat16)
    if w_in is None:
        return y, u, k_new, v_new
    # next layer's in_proj in either weight format (the int4-only
    # _boundary_ref tail handles only "q4" payloads)
    nxt = li + 1
    if "q4" in w_in:
        from magma_tpu.ops.quant import int4_matmul_stacked
        fused = int4_matmul_stacked(u, w_in["q4"], w_in["s4"], nxt,
                                    out_dtype=jnp.bfloat16)
    else:
        from magma_tpu.ops.quant import int8_matmul_stacked
        fused = int8_matmul_stacked(u, w_in["q"], w_in["s"], nxt,
                                    out_dtype=jnp.bfloat16)
    return y, u, fused, k_new, v_new


def _weight_format(w) -> Optional[str]:
    if not isinstance(w, dict):
        return None
    if "q4" in w:
        return "int4"
    if "q" in w:
        return "int8"
    return None


def _adapter_bk(D, DH):
    return next((b for b in (512, 384, 256, 128)
                 if D % b == 0 and DH % b == 0), None)


def _pick_sblk(max_len: int, kv_itemsize: int = 2) -> Optional[int]:
    """Position-block size.  Budgeted against XLA's 16 MB scoped-vmem
    limit for the whole launch (measured: K+V blocks at sblk=256 bf16
    double-buffered cost 8 MB and pushed the kernel to 25.3 MB > 16):
    keep each K/V block at <= 1 MB (2 MB total double-buffered x2)."""
    cap = 256 if kv_itemsize == 1 else 128
    return next((s for s in (cap, 128, 64) if max_len % s == 0), None)


def _pack_inproj_scales(w_in, D: int, bni: int):
    """Step-major int4 in_proj group scales against a custom N-block
    width (quant._pack_boundary_scales hard-codes the boundary kernel's
    14336 preference).  Returns (L, nj, nki, 2, bni) f32."""
    si = w_in["s4"]
    L, _, NI = si.shape
    nj, nki = NI // bni, (D // 2) // INT4_GROUP
    dsi = jnp.stack([si[:, :nki], si[:, nki:2 * nki]], axis=2)
    return dsi.reshape(L, nki, 2, nj, bni).transpose(0, 3, 1, 2, 4)


def _declayer_inproj_block(NI: int) -> int:
    """Narrower than the standalone boundary kernel's 14336 preference:
    the attention phases already occupy the scoped-vmem budget.  7168
    (NI/4 for the 6B) keeps the whole launch at ~14.8 MB of the 16 MB
    scoped budget while halving the in_proj grid steps vs 4096 (fewer
    fixed-cost grid steps measurably beat narrower DMA streams here)."""
    from magma_tpu.ops.quant import _pick_block
    return _pick_block(NI, prefer=(7168, 4096, 2048, 1024, 512, 256, 128))


def declayer_supported(*, b, s, n_heads, head_dim, d_ff, max_len, w_in_proj,
                       w_out_proj, has_bvecs) -> bool:
    """Static geometry gate for the fused decode-layer path (checked by
    the caller BEFORE building operands; the wrapper itself has no
    fallback dispatch — use _declayer_ref / the boundary path instead)."""
    wf = _weight_format(w_out_proj)
    if wf is None or _weight_format(w_in_proj) != wf:
        return False
    D = n_heads * head_dim
    if (jax.default_backend() != "tpu" or b != 1 or s != 1
            or not has_bvecs):
        return False
    if head_dim != INT4_GROUP or n_heads % 8 != 0:
        return False
    if D % INT4_GROUP or d_ff % INT4_GROUP:
        return False
    if _pick_sblk(max_len, 1) is None or _pick_sblk(max_len, 2) is None:
        return False
    if wf == "int4":
        if D % (2 * INT4_GROUP) or d_ff % (2 * INT4_GROUP):
            return False
        if w_out_proj["q4"].shape[1] != (D + d_ff) // 2:
            return False
        if w_out_proj["s4"].shape[1] != (D + d_ff) // INT4_GROUP:
            return False
        if w_in_proj["s4"].shape[1] != D // INT4_GROUP:
            return False
        if w_in_proj["q4"].shape[-1] % 128:
            return False
    else:
        if w_out_proj["q"].shape[1] != D + d_ff:
            return False
        if w_out_proj["s"].shape[1] != 2:
            return False
        if w_in_proj["q"].shape[-1] % 128:
            return False
    return True


def decode_layer_fused(fused_in, x, rotmat, k_cache, v_cache, kv_scales,
                       cache_pos, w_dual, b_fc_in, b_fc_out, ln_g, ln_b,
                       layer_idx, *, n_heads, w_in=None, fz_attn=None,
                       attn_src="out", fz_mlp=None, mlp_src="out",
                       u_in=None, o_bias=None, scale, ln_eps=1e-5):
    """One whole decoder layer of the s==1, b==1 decode step in ONE
    Pallas launch (see module docstring).

    fused_in: (1, 3D+F) bf16 — THIS layer's in_proj output.
    x: (1, D) residual input; u_in: (1, D) this layer's LN output (for
    parallel adapters).  rotmat: (1, hd, hd) f32 from
    :func:`rotary_matrix`.  k_cache/v_cache: the FULL stacked
    (L, 1, max_len, h, hd) caches (int8 or bf16) — the kernel indexes
    layer ``layer_idx`` via its BlockSpec maps, no slice materializes.
    kv_scales: None or position-major (kst, vst), each
    (L, 1, max_len, h) bf16 (``jnp.swapaxes(k_scale, -1, -2)`` of the
    cache layout — do it ONCE per token for all layers).
    cache_pos: () or (1,) int32 valid cache length.  Weights are the
    stacked int4 (``quantize_lm_params_int4``) or int8
    (``quantize_lm_params``) serving payloads; ``layer_idx`` must be a
    concrete int (the decode loop is unrolled) and < L-1 when ``w_in``
    is given.

    Returns (y (1, D), u (1, D), [fused_next (1, NI)], k_new (1, D),
    v_new (1, D)); k_new is post-rotary; both are flat rows (reshape to
    (1, 1, h, hd) host-side) for the caller's deferred bulk cache write
    (gptj._write_cache).
    """
    h = n_heads
    D = x.shape[1]
    hd = D // h
    F = b_fc_in.shape[-1]
    L = k_cache.shape[0]
    max_len = k_cache.shape[2]
    wf = _weight_format(w_dual)
    if not isinstance(layer_idx, int):
        raise ValueError("decode_layer_fused needs a concrete layer_idx "
                         "(unrolled decode loop)")
    if w_in is not None and layer_idx >= L - 1:
        raise ValueError("w_in set on the last layer (reads layer_idx+1)")
    if jax.default_backend() != "tpu":
        return _declayer_ref(
            fused_in, x, rotmat, k_cache, v_cache, kv_scales, cache_pos,
            w_dual, b_fc_in, b_fc_out, ln_g, ln_b, layer_idx,
            n_heads=n_heads, w_in=w_in, fz_attn=fz_attn,
            attn_src=attn_src, fz_mlp=fz_mlp, mlp_src=mlp_src, u_in=u_in,
            o_bias=o_bias, scale=scale, ln_eps=ln_eps)

    kv_itemsize = 1 if k_cache.dtype == jnp.int8 else 2
    sblk = _pick_sblk(max_len, kv_itemsize)
    n_attn = max_len // sblk
    has_kvs = kv_scales is not None
    if wf == "int4":
        nko = (D // 2) // INT4_GROUP
        n_dual = nko + (F // 2) // INT4_GROUP
        nki_base = (D // 2) // INT4_GROUP
    else:
        nko = D // INT4_GROUP
        n_dual = nko + F // INT4_GROUP
        nki_base = D // INT4_GROUP

    def spec_of(fz, src):
        if fz is None:
            return None
        DH = fz["wd"].shape[2]
        return {"DH": DH, "bk": _adapter_bk(D, DH), "src": src}

    sa, sm = spec_of(fz_attn, attn_src), spec_of(fz_mlp, mlp_src)
    t0 = n_attn + n_dual
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
    if w_in is not None:
        NI = (w_in["q4"] if wf == "int4" else w_in["q"]).shape[-1]
        bni = _declayer_inproj_block(NI)
        nj, nki = NI // bni, nki_base
        T = t_ep + nj * nki
    else:
        NI, bni, nj, nki = None, 128, 1, 0
        T = t_ep + 1

    sidx = jnp.stack([jnp.int32(layer_idx),
                      jnp.asarray(cache_pos, jnp.int32).reshape(())])

    # ---- operand assembly (canonical order; specs built by the CACHED
    # builder below — a fresh pallas_call per call site would re-run the
    # ~2 min Mosaic lowering for every one of the 28 layer calls) ----
    args = [sidx, fused_in, rotmat, k_cache, v_cache]
    if has_kvs:
        kst, vst = kv_scales
        args += [kst, vst]
    if wf == "int4":
        dsd = w_dual.get("dsb")
        if dsd is None:
            dsd, _ = _pack_boundary_scales(w_dual, None, D, F)
        args += [w_dual["q4"], dsd]
    else:
        args += [w_dual["q"], w_dual["s"].reshape(L, 2, D)]
    args.append(b_fc_in.reshape(L, 1, F))
    for fz, ad in ((fz_attn, ad_a), (fz_mlp, ad_m)):
        if ad is not None:
            args.extend([fz["wd"], fz["wu"], fz["sd"], fz["bd"],
                         fz["su"], fz["bu"]])
    args.extend([b_fc_out.reshape(L, 1, D), x,
                 ln_g.reshape(L, 1, D), ln_b.reshape(L, 1, D)])
    if o_bias is not None:
        args.append(o_bias.reshape(L, 1, D))
    if u_in is not None:
        args.append(u_in)
    if NI is not None:
        if wf == "int4":
            # "dsb2" is precomputed at quantize time for THIS kernel's
            # narrower block; rebuilding per call would re-materialize
            # ~51 MB of scales every decode step
            dsi = w_in.get("dsb2", w_in.get("dsb"))
            if dsi is None or dsi.shape[-1] != bni:
                dsi = _pack_inproj_scales(w_in, D, bni)
            args += [w_in["q4"], dsi]
        else:
            args += [w_in["q"], w_in["s"].reshape(L, 1, NI)]

    def freeze(ad):
        return None if ad is None else tuple(sorted(ad.items()))

    call = _declayer_call(
        h, hd, F, L, max_len, wf, sblk, n_attn, nko, n_dual,
        freeze(ad_a), freeze(ad_m),
        None if ad_a is None else fz_attn["wd"].shape[2],
        None if ad_m is None else fz_mlp["wd"].shape[2],
        t_ep, nki, nj, NI, bni, has_kvs, o_bias is not None,
        u_in is not None, float(scale), float(ln_eps), T)
    outs = call(*args)
    if NI is None:
        y, u, k_new, v_new = outs
        return y, u, k_new, v_new
    y, u, k_new, v_new, fused = outs
    return y, u, fused, k_new, v_new


@functools.lru_cache(maxsize=32)
def _declayer_call(h, hd, F, L, max_len, wf, sblk, n_attn, nko, n_dual,
                   ad_a_f, ad_m_f, dha, dhm, t_ep, nki, nj, NI, bni,
                   has_kvs, has_obias, has_uin, scale, ln_eps, T):
    """Build (and cache) the pallas_call for one static decode-layer
    configuration.  All 28 per-layer call sites of a decode step share
    one kernel object, so jax traces/lowers the Mosaic kernel ONCE per
    (mid, last) variant instead of per layer (~2 min each on this
    1-core host)."""
    D = h * hd
    ad_a = None if ad_a_f is None else dict(ad_a_f)
    ad_m = None if ad_m_f is None else dict(ad_m_f)

    def const2(t, s):
        return (0, 0)

    def lvec(t, s):
        return (s[0], 0, 0)

    def blk_idx(t, s):
        last = jnp.maximum(s[1] - 1, 0) // sblk
        return (s[0], 0, jnp.minimum(t, last), 0, 0)

    def sc_idx(t, s):
        last = jnp.maximum(s[1] - 1, 0) // sblk
        return (s[0], 0, jnp.minimum(t, last), 0)

    def wd_idx(t, s):
        return (s[0], jnp.clip(t - n_attn, 0, n_dual - 1), 0)

    # all row activations are (1, .) full-array blocks: the whole launch
    # must fit XLA's 16 MB scoped-vmem budget (8-row padded blocks plus
    # sblk=256 bf16 K/V blocks measured 25.3 MB and failed to compile)
    in_specs = [
        pl.BlockSpec((1, 3 * D + F), const2),
        pl.BlockSpec((1, hd, hd), lambda t, s: (0, 0, 0)),
        pl.BlockSpec((1, 1, sblk, h, hd), blk_idx),
        pl.BlockSpec((1, 1, sblk, h, hd), blk_idx),
    ]
    if has_kvs:
        in_specs += [pl.BlockSpec((1, 1, sblk, h), sc_idx),
                     pl.BlockSpec((1, 1, sblk, h), sc_idx)]
    if wf == "int4":
        in_specs += [pl.BlockSpec((1, INT4_GROUP, D), wd_idx),
                     pl.BlockSpec((1, n_dual, 2, D),
                                  lambda t, s: (s[0], 0, 0, 0))]
    else:
        in_specs += [pl.BlockSpec((1, INT4_GROUP, D), wd_idx),
                     pl.BlockSpec((1, 2, D), lambda t, s: (s[0], 0, 0))]
    in_specs.append(pl.BlockSpec((1, 1, F), lvec))

    for ad, DH in ((ad_a, dha), (ad_m, dhm)):
        if ad is None:
            continue
        t0a, nkd, nku, bk = ad["t0"], ad["nkd"], ad["nku"], ad["bk"]

        def wd_i(t, s, t0a=t0a, nkd=nkd):
            return (s[0], jnp.clip(t - t0a, 0, nkd - 1), 0)

        def wu_i(t, s, t0a=t0a, nkd=nkd, nku=nku):
            return (s[0], jnp.clip(t - (t0a + nkd), 0, nku - 1), 0)

        in_specs.extend([
            pl.BlockSpec((1, bk, DH), wd_i),
            pl.BlockSpec((1, bk, D), wu_i),
            pl.BlockSpec((1, 1, DH), lvec),
            pl.BlockSpec((1, 1, DH), lvec),
            pl.BlockSpec((1, 1, D), lvec),
            pl.BlockSpec((1, 1, D), lvec),
        ])

    in_specs.extend([
        pl.BlockSpec((1, 1, D), lvec),
        pl.BlockSpec((1, D), const2),
        pl.BlockSpec((1, 1, D), lvec),
        pl.BlockSpec((1, 1, D), lvec),
    ])
    if has_obias:
        in_specs.append(pl.BlockSpec((1, 1, D), lvec))
    if has_uin:
        in_specs.append(pl.BlockSpec((1, D), const2))
    if NI is not None:
        def wi_idx(t, s):
            rel = jnp.clip(t - t_ep, 0, nj * nki - 1)
            return (s[0] + 1, rel % nki, rel // nki)

        if wf == "int4":
            def dsi_idx(t, s):
                rel = jnp.clip(t - t_ep, 0, nj * nki - 1)
                return (s[0] + 1, rel // nki, 0, 0, 0)

            in_specs += [pl.BlockSpec((1, INT4_GROUP, bni), wi_idx),
                         pl.BlockSpec((1, 1, nki, 2, bni), dsi_idx)]
        else:
            def si_idx(t, s):
                rel = jnp.clip(t - t_ep, 0, nj * nki - 1)
                return (s[0] + 1, 0, rel // nki)

            in_specs += [pl.BlockSpec((1, INT4_GROUP, bni), wi_idx),
                         pl.BlockSpec((1, 1, bni), si_idx)]

    out_shape = [jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((1, D), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, D), const2),
                 pl.BlockSpec((1, D), const2),
                 pl.BlockSpec((1, D), const2),
                 pl.BlockSpec((1, D), const2)]
    if NI is not None:
        out_shape.append(jax.ShapeDtypeStruct((1, NI), jnp.bfloat16))
        out_specs.append(pl.BlockSpec(
            (1, bni),
            lambda t, s: (0, jnp.clip(t - t_ep, 0, nj * nki - 1) // nki)))

    dh_max = max([1] + [d for d in (dha, dhm) if d is not None])
    scratch = [
        pltpu.VMEM((h, hd), jnp.float32),      # q_s (scaled, rotated)
        pltpu.VMEM((1, h), jnp.float32),       # m_s
        pltpu.VMEM((1, h), jnp.float32),       # l_s
        pltpu.VMEM((h, hd), jnp.float32),      # ctxacc
        pltpu.VMEM((8, h * hd), jnp.bfloat16),  # ctx_s (flat rows)
        pltpu.VMEM((8, F), jnp.bfloat16),      # mh_s
        pltpu.VMEM((8, D), jnp.float32),       # acco
        pltpu.VMEM((8, D), jnp.float32),       # accf
        pltpu.VMEM((8, D), jnp.bfloat16),      # mbuf
        pltpu.VMEM((8, D), jnp.bfloat16),      # abuf
        pltpu.VMEM((8, dh_max), jnp.float32),  # ah
        pltpu.VMEM((8, D), jnp.float32),       # au
        pltpu.VMEM((8, bni), jnp.float32),     # acci
    ]

    kernel = functools.partial(
        _declayer_kernel, h=h, hd=hd, F=F, wf=wf, sblk=sblk, n_attn=n_attn,
        nko=nko, n_dual=n_dual, ad_a=ad_a, ad_m=ad_m, t_ep=t_ep, nki=nki,
        nj=nj, has_obias=has_obias, has_uin=has_uin,
        has_in=NI is not None, has_kvs=has_kvs, scale=scale, ln_eps=ln_eps)

    return pl.pallas_call(
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
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )


# ---------------------------------------------------------------------------
# ALL layers in ONE launch: 2-D (layer, step) grid
# ---------------------------------------------------------------------------


def _alllayer_kernel(refs, *, L, h, hd, F, wf, sblk, n_attn, nko, n_dual,
                     ad_a, ad_m, t_ep, nki, nj, has_obias, has_kvs,
                     scale, ln_eps, gpb=1):
    """All-layers decode kernel body.  Grid (L, T): dim 0 walks the layer
    stack, dim 1 the per-layer phases of :func:`_declayer_kernel`.
    Activations (residual x, LN output u, in_proj output ``fused``)
    chain across layers through VMEM scratch — 28 serial Pallas launches
    exposed ~25 us of fixed dispatch latency EACH (~0.7 ms/token), which
    is what this kernel removes."""
    D = h * hd
    it = iter(refs)
    pos_ref = next(it)                       # (1,): valid cache length
    fused0_ref, x0_ref, u0_ref, rot_ref, kc_ref, vc_ref = (
        next(it) for _ in range(6))
    if has_kvs:
        kst_ref, vst_ref = next(it), next(it)
    wd_ref = next(it)
    if wf == "int4":
        dsd_ref = next(it)
    else:
        s2_ref = next(it)
    bfi_ref = next(it)
    if ad_a is not None:
        awd, awu, asd, abd, asu, abu = (next(it) for _ in range(6))
    if ad_m is not None:
        mwd, mwu, msd, mbd, msu, mbu = (next(it) for _ in range(6))
    bfo_ref, lng_ref, lnb_ref = (next(it) for _ in range(3))
    obias_ref = next(it) if has_obias else None
    wi_ref = next(it)
    si_ref = next(it)
    y_ref, knew_ref, vnew_ref = (next(it) for _ in range(3))
    (q_s, m_s, l_s, ctxacc_s, ctx_s, mh_s, acco_s, accf_s, mbuf_s, abuf_s,
     ah_s, au_s, acci_s, fused_s, xres_s, u_s) = (next(it) for _ in range(16))

    l = pl.program_id(0)
    t = pl.program_id(1)
    pos = pos_ref[0]
    nkf = n_dual - nko

    # ---- phase 0: seed scratch (layer 0) + rotary + self-attn init ----
    @pl.when(t == 0)
    def _prologue():
        @pl.when(l == 0)
        def _seed():
            fused_s[0:1] = fused0_ref[...]
            xres_s[0:1] = x0_ref[...]
            u_s[0:1] = u0_ref[...]

        qh = fused_s[0:1, :D].reshape(h, hd)
        kh = fused_s[0:1, D:2 * D].reshape(h, hd)
        vh = fused_s[0:1, 2 * D:3 * D].reshape(h, hd)
        R = rot_ref[0]
        q_rot = jax.lax.dot(qh.astype(jnp.float32), R,
                            preferred_element_type=jnp.float32)
        k_rot = jax.lax.dot(kh.astype(jnp.float32), R,
                            preferred_element_type=jnp.float32)
        q_s[...] = q_rot * scale
        knew_ref[0] = k_rot.reshape(1, D).astype(jnp.bfloat16)
        vnew_ref[0] = fused_s[0:1, 2 * D:3 * D]
        s_self = jnp.sum(q_s[...] * k_rot, axis=1, keepdims=True)
        m_s[...] = s_self.T
        l_s[...] = jnp.ones_like(l_s)
        ctxacc_s[...] = vh.astype(jnp.float32)
        acco_s[...] = jnp.zeros_like(acco_s)
        accf_s[...] = jnp.zeros_like(accf_s)

    # ---- attention over valid cache position blocks ----
    @pl.when((t < n_attn) & (t * sblk < pos))
    def _attn_block():
        k3 = kc_ref[0, 0].astype(jnp.float32)
        s3 = jnp.sum(k3 * q_s[...][None], axis=2)
        if has_kvs:
            s3 = s3 * kst_ref[0, 0].astype(jnp.float32)
        jpos = t * sblk + jax.lax.broadcasted_iota(jnp.int32, (sblk, h), 0)
        s3 = jnp.where(jpos < pos, s3, NEG_INF)
        m_old = m_s[...]
        m_new = jnp.maximum(m_old, jnp.max(s3, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s3 - m_new)
        m_s[...] = m_new
        l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
        if has_kvs:
            p = p * vst_ref[0, 0].astype(jnp.float32)
        v3 = vc_ref[0, 0].astype(jnp.float32)
        ctxacc_s[...] = (ctxacc_s[...] * alpha.T
                         + jnp.sum(v3 * p[:, :, None], axis=0))

    # ---- finalize ctx + gelu(mh) ----
    @pl.when(t == n_attn)
    def _finalize():
        ctx = (ctxacc_s[...] / l_s[...].T).astype(jnp.bfloat16)
        ctx_s[0:1, :] = ctx.reshape(1, D)
        mh = (fused_s[0:1, 3 * D:3 * D + F].astype(jnp.float32)
              + bfi_ref[0].astype(jnp.float32))
        mh_s[0:1, :] = jax.nn.gelu(mh, approximate=True).astype(
            jnp.bfloat16)

    # ---- dual o_proj + fc_out ----
    # gpb = quantization groups (K blocks of INT4_GROUP rows) consumed
    # per grid step: at b=1 the dual/in_proj phases are fixed-cost-bound
    # (~1.5-2 us of grid bookkeeping per step vs <1 us of int4 DMA), so
    # wider blocks cut the step count without touching the stream
    nko_s, n_dual_s = nko // gpb, n_dual // gpb
    tp = t - n_attn

    def _dual_upd_int4(g, xlo, xhi):
        xlo_q, sxlo = _quantize_act_block(xlo)
        xhi_q, sxhi = _quantize_act_block(xhi)
        p32 = wd_ref[0, pl.dslice(g * INT4_GROUP, INT4_GROUP)].astype(
            jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.int8)
        hi = (p32 >> 4).astype(jnp.int8)
        plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
        phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
        pair = dsd_ref[0, tp * gpb + g]   # scales whole-resident
        return (plo.astype(jnp.float32) * sxlo * pair[0:1]
                + phi.astype(jnp.float32) * sxhi * pair[1:2])

    def _dual_upd_int8(g, x):
        w = wd_ref[0, pl.dslice(g * INT4_GROUP, INT4_GROUP)].astype(
            jnp.bfloat16)
        return jax.lax.dot(x.astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)

    def _dual_store(upd):
        @pl.when(tp < nko_s)
        def _o():
            acco_s[0:1] += upd

        @pl.when(tp >= nko_s)
        def _f():
            accf_s[0:1] += upd

    if wf == "int4":
        @pl.when((t >= n_attn) & (tp < n_dual_s))
        def _dual4():
            @pl.when(tp < nko_s)
            def _ctx_part():
                upd = 0.0
                for g in range(gpb):
                    j = tp * gpb + g
                    xlo = ctx_s[0:1, pl.dslice(j * hd, hd)]
                    xhi = ctx_s[0:1, pl.dslice((nko + j) * hd, hd)]
                    upd += _dual_upd_int4(g, xlo, xhi)
                _dual_store(upd)

            @pl.when(tp >= nko_s)
            def _mh_part():
                upd = 0.0
                for g in range(gpb):
                    j2 = (tp - nko_s) * gpb + g
                    xlo = mh_s[0:1, pl.dslice(j2 * hd, hd)]
                    xhi = mh_s[0:1, pl.dslice((nkf + j2) * hd, hd)]
                    upd += _dual_upd_int4(g, xlo, xhi)
                _dual_store(upd)
    else:
        @pl.when((t >= n_attn) & (tp < n_dual_s))
        def _dual8():
            @pl.when(tp < nko_s)
            def _ctx_part():
                upd = 0.0
                for g in range(gpb):
                    j = tp * gpb + g
                    upd += _dual_upd_int8(
                        g, ctx_s[0:1, pl.dslice(j * hd, hd)])
                _dual_store(upd)

            @pl.when(tp >= nko_s)
            def _mh_part():
                upd = 0.0
                for g in range(gpb):
                    j2 = (tp - nko_s) * gpb + g
                    upd += _dual_upd_int8(
                        g, mh_s[0:1, pl.dslice(j2 * hd, hd)])
                _dual_store(upd)

    def _branch_a():
        if wf == "int4":
            a = acco_s[0:1].astype(jnp.bfloat16)
        else:
            a = (acco_s[0:1] * s2_ref[0, 0:1]).astype(jnp.bfloat16)
        if obias_ref is not None:
            a = a + obias_ref[0].astype(jnp.bfloat16)
        return a

    def _branch_m_pre():
        if wf == "int4":
            return accf_s[0:1].astype(jnp.bfloat16)
        return (accf_s[0:1] * s2_ref[0, 1:2]).astype(jnp.bfloat16)

    # ---- adapter bottlenecks ----
    def _adapter_phases(ad, wdr, wur, sdr, bdr, src_buf):
        t0, nkd, nku, bk = ad["t0"], ad["nkd"], ad["nku"], ad["bk"]

        @pl.when((t >= t0) & (t < t0 + nkd))
        def _down():
            j = t - t0
            xb = src_buf(j, bk)
            ah_s[0:1, : wdr.shape[2]] += jax.lax.dot(
                xb, wdr[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

        @pl.when(t == t0 + nkd)
        def _relu():
            dh = wdr.shape[2]
            ah_s[0:1, :dh] = jax.nn.relu(ah_s[0:1, :dh] * sdr[0] + bdr[0])
            au_s[...] = jnp.zeros_like(au_s)

        @pl.when((t >= t0 + nkd) & (t < t0 + nkd + nku))
        def _up():
            j = t - (t0 + nkd)
            hs = ah_s[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)
            au_s[0:1] += jax.lax.dot(
                hs, wur[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

    if ad_a is not None:
        @pl.when(t == ad_a["t0"])
        def _a_start():
            abuf_s[0:1] = _branch_a()
            ah_s[...] = jnp.zeros_like(ah_s)

        def _a_src(j, bk):
            buf = u_s if ad_a["src"] == "in" else abuf_s
            return buf[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_a, awd, awu, asd, abd, _a_src)

    if ad_m is not None:
        @pl.when(t == ad_m["t0"])
        def _m_start():
            if ad_a is not None:
                abuf_s[0:1] += (au_s[0:1] * asu[0]
                                + abu[0]).astype(jnp.bfloat16)
            mbuf_s[0:1] = (_branch_m_pre()
                           + bfo_ref[0].astype(jnp.bfloat16))
            ah_s[...] = jnp.zeros_like(ah_s)

        def _m_src(j, bk):
            buf = u_s if ad_m["src"] == "in" else mbuf_s
            return buf[0:1, pl.dslice(j * bk, bk)].astype(jnp.bfloat16)

        _adapter_phases(ad_m, mwd, mwu, msd, mbd, _m_src)

    # ---- residual + next-layer LN epilogue (chains x/u scratch) ----
    @pl.when(t == t_ep)
    def _epilogue():
        if ad_a is not None and ad_m is None:
            abuf_s[0:1] += (au_s[0:1] * asu[0]
                            + abu[0]).astype(jnp.bfloat16)
        a = abuf_s[0:1] if ad_a is not None else _branch_a()
        if ad_m is not None:
            m2 = mbuf_s[0:1] + (au_s[0:1] * msu[0]
                                + mbu[0]).astype(jnp.bfloat16)
        else:
            m2 = _branch_m_pre() + bfo_ref[0].astype(jnp.bfloat16)
        y = xres_s[0:1] + a + m2
        xres_s[0:1] = y
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mu), axis=1, keepdims=True)
        un = (y32 - mu) * jax.lax.rsqrt(var + ln_eps)
        u_s[0:1] = (un * lng_ref[0] + lnb_ref[0]).astype(jnp.bfloat16)

        @pl.when(l == L - 1)
        def _emit():
            y_ref[...] = y

    # ---- next layer's in_proj on the just-written u ----
    nki_s = nki // gpb

    @pl.when((t >= t_ep) & (l < L - 1))
    def _inproj():
        rel = t - t_ep
        kb = rel % nki_s

        @pl.when(kb == 0)
        def _iinit():
            acci_s[...] = jnp.zeros_like(acci_s)

        if wf == "int4":
            for g in range(gpb):
                g2 = kb * gpb + g
                ulo = u_s[0:1, pl.dslice(g2 * INT4_GROUP, INT4_GROUP)]
                uhi = u_s[0:1, pl.dslice((nki + g2) * INT4_GROUP,
                                         INT4_GROUP)]
                ulo_q, sulo = _quantize_act_block(ulo)
                uhi_q, suhi = _quantize_act_block(uhi)
                p32 = wi_ref[0, pl.dslice(g * INT4_GROUP,
                                          INT4_GROUP)].astype(jnp.int32)
                lo = ((p32 << 28) >> 28).astype(jnp.int8)
                hi = (p32 >> 4).astype(jnp.int8)
                plo = jax.lax.dot(ulo_q, lo,
                                  preferred_element_type=jnp.int32)
                phi = jax.lax.dot(uhi_q, hi,
                                  preferred_element_type=jnp.int32)
                pair = si_ref[0, 0, g2]
                acci_s[0:1] += (
                    plo.astype(jnp.float32) * sulo * pair[0:1]
                    + phi.astype(jnp.float32) * suhi * pair[1:2])
        else:
            for g in range(gpb):
                g2 = kb * gpb + g
                ub = u_s[0:1, pl.dslice(g2 * INT4_GROUP, INT4_GROUP)]
                w = wi_ref[0, pl.dslice(g * INT4_GROUP,
                                        INT4_GROUP)].astype(jnp.bfloat16)
                acci_s[0:1] += jax.lax.dot(
                    ub.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)

        @pl.when(kb == nki_s - 1)
        def _istore():
            j = rel // nki_s
            if wf == "int4":
                blk = acci_s[0:1].astype(jnp.bfloat16)
            else:
                blk = (acci_s[0:1] * si_ref[0]).astype(jnp.bfloat16)
            fused_s[0:1, pl.dslice(j * blk.shape[1], blk.shape[1])] = blk


def decode_all_layers_fused(fused0, x0, u0, rotmat, k_cache, v_cache,
                            kv_scales, cache_pos, w_dual, w_in, b_fc_in,
                            b_fc_out, ln_g, ln_b, *, n_heads, fz_attn=None,
                            attn_src="out", fz_mlp=None, mlp_src="out",
                            o_bias=None, scale, ln_eps=1e-5):
    """The ENTIRE stack of decode layers in ONE Pallas launch.

    Inputs are layer-0 seeds: ``fused0`` (1, 3D+F) = in_proj_0(u_0),
    ``x0`` (1, D) the step's input hidden state, ``u0`` (1, D) =
    ln_1[0](x0).  Weights are the full stacked serving payloads (int4 or
    int8); caches are the stacked (L, 1, max_len, h, hd) pools.
    Returns (y (1, D) final hidden state, k_new (L, 1, D),
    v_new (L, 1, D)) — post-rotary flat rows for the caller's bulk
    cache write.  See _alllayer_kernel for why one launch.
    """
    h = n_heads
    D = x0.shape[1]
    hd = D // h
    F = b_fc_in.shape[-1]
    L = k_cache.shape[0]
    max_len = k_cache.shape[2]
    wf = _weight_format(w_dual)
    if jax.default_backend() != "tpu":
        return _all_layers_ref(
            fused0, x0, u0, rotmat, k_cache, v_cache, kv_scales, cache_pos,
            w_dual, w_in, b_fc_in, b_fc_out, ln_g, ln_b, n_heads=n_heads,
            fz_attn=fz_attn, attn_src=attn_src, fz_mlp=fz_mlp,
            mlp_src=mlp_src, o_bias=o_bias, scale=scale, ln_eps=ln_eps)

    kv_itemsize = 1 if k_cache.dtype == jnp.int8 else 2
    sblk = _pick_sblk(max_len, kv_itemsize)
    n_attn = max_len // sblk
    has_kvs = kv_scales is not None
    if wf == "int4":
        nko = (D // 2) // INT4_GROUP
        n_dual = nko + (F // 2) // INT4_GROUP
        nki = (D // 2) // INT4_GROUP
        NI = w_in["q4"].shape[-1]
    else:
        nko = D // INT4_GROUP
        n_dual = nko + F // INT4_GROUP
        nki = D // INT4_GROUP
        NI = w_in["q"].shape[-1]
    bni = _declayer_inproj_block(NI)
    nj = NI // bni
    # groups per grid step for the dual/in_proj weight streams: the b=1
    # phases are fixed-cost-bound, so wider blocks cut the step count
    # when the geometry splits evenly (see _alllayer_kernel).  Default 4
    # (v5e 6B int4 whole-call sweep: gpb 1/2/4/8 -> 149.7/159.7/163.4/
    # 161.0 tok/s); MAGMA_DECODE_GPB overrides for tuning.
    gpb_req = int(os.environ.get("MAGMA_DECODE_GPB", "4"))
    gpb = 1
    for cand in (8, 4, 2):
        if (cand <= gpb_req and nko % cand == 0
                and (n_dual - nko) % cand == 0 and nki % cand == 0):
            gpb = cand
            break

    def spec_of(fz, src):
        if fz is None:
            return None
        DH = fz["wd"].shape[2]
        return {"DH": DH, "bk": _adapter_bk(D, DH), "src": src}

    sa, sm = spec_of(fz_attn, attn_src), spec_of(fz_mlp, mlp_src)
    t0 = n_attn + n_dual // gpb
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
    T = t_ep + nj * (nki // gpb)

    pos = jnp.asarray(cache_pos, jnp.int32).reshape(1)

    args = [pos, fused0, x0, u0, rotmat, k_cache, v_cache]
    if has_kvs:
        kst, vst = kv_scales
        args += [kst, vst]
    if wf == "int4":
        dsd = w_dual.get("dsb")
        if dsd is None:
            dsd, _ = _pack_boundary_scales(w_dual, None, D, F)
        args += [w_dual["q4"], dsd]
    else:
        args += [w_dual["q"], w_dual["s"].reshape(L, 2, D)]
    args.append(b_fc_in.reshape(L, 1, F))
    for fz, ad in ((fz_attn, ad_a), (fz_mlp, ad_m)):
        if ad is not None:
            args.extend([fz["wd"], fz["wu"], fz["sd"], fz["bd"],
                         fz["su"], fz["bu"]])
    args.extend([b_fc_out.reshape(L, 1, D),
                 ln_g.reshape(L, 1, D), ln_b.reshape(L, 1, D)])
    if o_bias is not None:
        args.append(o_bias.reshape(L, 1, D))
    if wf == "int4":
        dsi = w_in.get("dsb2", w_in.get("dsb"))
        if dsi is None or dsi.shape[-1] != bni:
            dsi = _pack_inproj_scales(w_in, D, bni)
        args += [w_in["q4"], dsi]
    else:
        args += [w_in["q"], w_in["s"].reshape(L, 1, NI)]

    def freeze(ad):
        return None if ad is None else tuple(sorted(ad.items()))

    call = _alllayer_call(
        L, h, hd, F, max_len, wf, sblk, n_attn, nko, n_dual,
        freeze(ad_a), freeze(ad_m),
        None if ad_a is None else fz_attn["wd"].shape[2],
        None if ad_m is None else fz_mlp["wd"].shape[2],
        t_ep, nki, nj, NI, bni, has_kvs, o_bias is not None,
        float(scale), float(ln_eps), T, gpb)
    return call(*args)


def _all_layers_ref(fused0, x0, u0, rotmat, k_cache, v_cache, kv_scales,
                    cache_pos, w_dual, w_in, b_fc_in, b_fc_out, ln_g, ln_b,
                    *, n_heads, fz_attn, attn_src, fz_mlp, mlp_src, o_bias,
                    scale, ln_eps):
    """Layer-by-layer composition of _declayer_ref — the oracle and the
    non-TPU fallback for decode_all_layers_fused."""
    L = k_cache.shape[0]
    fused, x2, u2 = fused0, x0, u0
    k_news, v_news = [], []
    for l in range(L):
        outs = _declayer_ref(
            fused, x2, rotmat, k_cache, v_cache, kv_scales, cache_pos,
            w_dual, b_fc_in, b_fc_out, ln_g, ln_b, l, n_heads=n_heads,
            w_in=None if l == L - 1 else w_in, fz_attn=fz_attn,
            attn_src=attn_src, fz_mlp=fz_mlp, mlp_src=mlp_src, u_in=u2,
            o_bias=o_bias, scale=scale, ln_eps=ln_eps)
        if l == L - 1:
            x2, u2, kn, vn = outs
        else:
            x2, u2, fused, kn, vn = outs
        k_news.append(kn)
        v_news.append(vn)
    return x2, jnp.stack(k_news), jnp.stack(v_news)


@functools.lru_cache(maxsize=16)
def _alllayer_call(L, h, hd, F, max_len, wf, sblk, n_attn, nko, n_dual,
                   ad_a_f, ad_m_f, dha, dhm, t_ep, nki, nj, NI, bni,
                   has_kvs, has_obias, scale, ln_eps, T, gpb=1):
    """Build (and cache) the all-layers pallas_call for one static
    configuration — one Mosaic compile per serving config."""
    D = h * hd
    n_dual_s, nki_s = n_dual // gpb, nki // gpb
    ad_a = None if ad_a_f is None else dict(ad_a_f)
    ad_m = None if ad_m_f is None else dict(ad_m_f)

    def const2(l, t, s):
        return (0, 0)

    def lvec(l, t, s):
        return (l, 0, 0)

    def blk_idx(l, t, s):
        last = jnp.maximum(s[0] - 1, 0) // sblk
        return (l, 0, jnp.minimum(t, last), 0, 0)

    def sc_idx(l, t, s):
        last = jnp.maximum(s[0] - 1, 0) // sblk
        return (l, 0, jnp.minimum(t, last), 0)

    def wd_idx(l, t, s):
        return (l, jnp.clip(t - n_attn, 0, n_dual_s - 1), 0)

    in_specs = [
        pl.BlockSpec((1, 3 * D + F), const2),
        pl.BlockSpec((1, D), const2),
        pl.BlockSpec((1, D), const2),
        pl.BlockSpec((1, hd, hd), lambda l, t, s: (0, 0, 0)),
        pl.BlockSpec((1, 1, sblk, h, hd), blk_idx),
        pl.BlockSpec((1, 1, sblk, h, hd), blk_idx),
    ]
    if has_kvs:
        in_specs += [pl.BlockSpec((1, 1, sblk, h), sc_idx),
                     pl.BlockSpec((1, 1, sblk, h), sc_idx)]
    if wf == "int4":
        in_specs += [pl.BlockSpec((1, gpb * INT4_GROUP, D), wd_idx),
                     pl.BlockSpec((1, n_dual, 2, D),
                                  lambda l, t, s: (l, 0, 0, 0))]
    else:
        in_specs += [pl.BlockSpec((1, gpb * INT4_GROUP, D), wd_idx),
                     pl.BlockSpec((1, 2, D), lambda l, t, s: (l, 0, 0))]
    in_specs.append(pl.BlockSpec((1, 1, F), lvec))

    for ad, DH in ((ad_a, dha), (ad_m, dhm)):
        if ad is None:
            continue
        t0a, nkd, nku, bk = ad["t0"], ad["nkd"], ad["nku"], ad["bk"]

        def wd_i(l, t, s, t0a=t0a, nkd=nkd):
            return (l, jnp.clip(t - t0a, 0, nkd - 1), 0)

        def wu_i(l, t, s, t0a=t0a, nkd=nkd, nku=nku):
            return (l, jnp.clip(t - (t0a + nkd), 0, nku - 1), 0)

        in_specs.extend([
            pl.BlockSpec((1, bk, DH), wd_i),
            pl.BlockSpec((1, bk, D), wu_i),
            pl.BlockSpec((1, 1, DH), lvec),
            pl.BlockSpec((1, 1, DH), lvec),
            pl.BlockSpec((1, 1, D), lvec),
            pl.BlockSpec((1, 1, D), lvec),
        ])

    in_specs.extend([
        pl.BlockSpec((1, 1, D), lvec),
        pl.BlockSpec((1, 1, D), lvec),
        pl.BlockSpec((1, 1, D), lvec),
    ])
    if has_obias:
        in_specs.append(pl.BlockSpec((1, 1, D), lvec))

    # layer l's in_proj phase projects for layer l+1; at l == L-1 the
    # phase idles — freeze its maps at the last block already resident
    # so no fresh (and unused) DMA is issued
    def wi_idx(l, t, s):
        rel = jnp.clip(t - t_ep, 0, nj * nki_s - 1)
        rel = jnp.where(l < L - 1, rel, nj * nki_s - 1)
        return (jnp.minimum(l + 1, L - 1), rel % nki_s, rel // nki_s)

    if wf == "int4":
        def dsi_idx(l, t, s):
            rel = jnp.clip(t - t_ep, 0, nj * nki_s - 1)
            rel = jnp.where(l < L - 1, rel, nj * nki_s - 1)
            return (jnp.minimum(l + 1, L - 1), rel // nki_s, 0, 0, 0)

        in_specs += [pl.BlockSpec((1, gpb * INT4_GROUP, bni), wi_idx),
                     pl.BlockSpec((1, 1, nki, 2, bni), dsi_idx)]
    else:
        def si_idx(l, t, s):
            rel = jnp.clip(t - t_ep, 0, nj * nki_s - 1)
            rel = jnp.where(l < L - 1, rel, nj * nki_s - 1)
            return (jnp.minimum(l + 1, L - 1), 0, rel // nki_s)

        in_specs += [pl.BlockSpec((1, gpb * INT4_GROUP, bni), wi_idx),
                     pl.BlockSpec((1, 1, bni), si_idx)]

    out_shape = [jax.ShapeDtypeStruct((1, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((L, 1, D), jnp.bfloat16),
                 jax.ShapeDtypeStruct((L, 1, D), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, D), const2),
                 pl.BlockSpec((1, 1, D), lvec),
                 pl.BlockSpec((1, 1, D), lvec)]

    dh_max = max([1] + [d for d in (dha, dhm) if d is not None])
    scratch = [
        pltpu.VMEM((h, hd), jnp.float32),       # q_s
        pltpu.VMEM((1, h), jnp.float32),        # m_s
        pltpu.VMEM((1, h), jnp.float32),        # l_s
        pltpu.VMEM((h, hd), jnp.float32),       # ctxacc
        pltpu.VMEM((8, h * hd), jnp.bfloat16),  # ctx_s
        pltpu.VMEM((8, F), jnp.bfloat16),       # mh_s
        pltpu.VMEM((8, D), jnp.float32),        # acco
        pltpu.VMEM((8, D), jnp.float32),        # accf
        pltpu.VMEM((8, D), jnp.bfloat16),       # mbuf
        pltpu.VMEM((8, D), jnp.bfloat16),       # abuf
        pltpu.VMEM((8, dh_max), jnp.float32),   # ah
        pltpu.VMEM((8, D), jnp.float32),        # au
        pltpu.VMEM((8, bni), jnp.float32),      # acci
        pltpu.VMEM((8, 3 * D + F), jnp.bfloat16),  # fused chain
        pltpu.VMEM((8, D), jnp.bfloat16),       # xres chain
        pltpu.VMEM((8, D), jnp.bfloat16),       # u chain
    ]

    kernel = functools.partial(
        _alllayer_kernel, L=L, h=h, hd=hd, F=F, wf=wf, sblk=sblk,
        n_attn=n_attn, nko=nko, n_dual=n_dual, ad_a=ad_a, ad_m=ad_m,
        t_ep=t_ep, nki=nki, nj=nj, has_obias=has_obias, has_kvs=has_kvs,
        scale=scale, ln_eps=ln_eps, gpb=gpb)

    return pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, T),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )
