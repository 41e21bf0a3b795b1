"""Experiment: W4A8 int4-weight kernels — int8 MXU dots instead of bf16
(round-3 decode-roofline push, stage 2).

The r3 profile with the dual kernel in place (exp_profile_decode, BITS=4,
ctx=256) shows the two weight-stream kernels at 77-82% of their DMA
rooflines:

    in_proj  91 us/layer device vs ~75 us roofline
    out_proj 70 us/layer device vs ~54 us roofline

The suspected gap is VPU nibble-unpack cost: per weight element the
current kernels pay two shifts plus an int32->bf16 CONVERT before the
bf16 MXU dot, and at K*N = 117M elements/layer that is tens of us of VPU
time that only partially hides under the DMA.  This benches a W4A8
variant: activations are quantized to int8 per (row, k-block) INSIDE the
kernel (fine-grained, so quant error stays ~1e-3 relative), nibbles are
sign-extended in the int8 domain (no converts), and the dot runs
int8 x int8 -> int32 on the MXU (2x MXU throughput on v5e, irrelevant
here, but the convert removal is the point).

Variants:
  A. current production kernel (bf16 dots)       — baseline
  B. W4A8, scales applied per k-block on the f32 accumulator

Run: python scripts/exp_w4a8.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 28
STEPS = 48
B = 8
BKP = 256  # packed rows per k-block = one 256-row quantization group


def make_weights(key, kp, n, g):
    k1, k2 = jax.random.split(key)
    q4 = jax.random.randint(k1, (L, kp, n), -128, 128, jnp.int8)
    s4 = jax.random.uniform(k2, (L, g, n), jnp.float32, 1e-3, 2e-3)
    return q4, s4


def w4a8_kernel(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
                o_ref, acc_ref, *, n_k):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # per-(row, k-block) activation quantization: amax over the 256-wide
    # block -> int8.  f32 VPU work on an (B, 256) tile is negligible next
    # to the (256, bn) weight unpack.
    def qact(ref):
        xf = ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.round(xf / scale).astype(jnp.int8)
        return xq, scale

    xlo_q, slo_x = qact(xlo_ref)
    xhi_q, shi_x = qact(xhi_ref)

    # Mosaic can't legalize shifts on i8 vectors — unpack in int32 (as the
    # production kernel does) but convert to int8 for the MXU dot, skipping
    # the int32->bf16 converts the bf16 variant pays
    p32 = w_ref[0].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
    phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
    acc_ref[...] += (plo.astype(jnp.float32) * slo_x * slo_ref[0]
                     + phi.astype(jnp.float32) * shi_x * shi_ref[0])

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def w4a8_matmul(x, q4, s4, idx, *, bn):
    m, k = x.shape
    Ln, kp, n = q4.shape
    G = s4.shape[1]
    n_k = kp // BKP
    idx = jnp.asarray(idx, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(w4a8_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((B, BKP), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((B, BKP), lambda i, j, kb, ir: (i, n_k + kb)),
                pl.BlockSpec((1, BKP, bn),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, 1, bn),
                             lambda i, j, kb, ir: (ir[0] * G + kb, 0, j)),
                pl.BlockSpec((1, 1, bn),
                             lambda i, j, kb, ir:
                             (ir[0] * G + G // 2 + kb, 0, j)),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i, j, kb, ir: (i, j)),
            scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, x, q4, s4.reshape(Ln * G, 1, n), s4.reshape(Ln * G, 1, n))


def w4a8_dual_kernel(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
                     o_ref, acc_ref, *, nko, n_k):
    """W4A8 variant of quant._int4_dual_kernel: int8 activations, int8
    nibble dots, boundary-switching accumulator."""
    kb = pl.program_id(2)

    @pl.when((kb == 0) | (kb == nko))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def qact(ref):
        xf = ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(xf / scale).astype(jnp.int8), scale

    xlo_q, slo_x = qact(xlo_ref)
    xhi_q, shi_x = qact(xhi_ref)
    p32 = w_ref[0].astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    plo = jax.lax.dot(xlo_q, lo, preferred_element_type=jnp.int32)
    phi = jax.lax.dot(xhi_q, hi, preferred_element_type=jnp.int32)
    acc_ref[...] += (plo.astype(jnp.float32) * slo_x * slo_ref[0]
                     + phi.astype(jnp.float32) * shi_x * shi_ref[0])

    @pl.when((kb == nko - 1) | (kb == n_k - 1))
    def _store():
        o_ref[...] = acc_ref[...][None]


def w4a8_dual(ctx, h, q4, s4, layer_idx, *, bn):
    """Same layouts as quant._int4_dual_2d, W4A8 math."""
    ko, kf = ctx.shape[1], h.shape[1]
    kpo, kpf = ko // 2, kf // 2
    Ln, kptot, n = q4.shape
    G = s4.shape[1]
    nko, nkf = kpo // BKP, kpf // BKP
    n_k = nko + nkf
    x = jnp.concatenate(
        [ctx[:, :kpo], ctx[:, kpo:], h[:, :kpf], h[:, kpf:]], axis=1)
    m = x.shape[0]

    def xlo_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, kb, 2 * nko + (kb - nko)))

    def xhi_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, nko + kb, 2 * nko + nkf + (kb - nko)))

    def slo_idx(i, j, kb, ir):
        return (ir[0] * G + jnp.where(kb < nko, kb, kb + nko), 0, j)

    def shi_idx(i, j, kb, ir):
        return (ir[0] * G + jnp.where(kb < nko, kb + nko, kb + nko + nkf),
                0, j)

    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(w4a8_dual_kernel, nko=nko, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((2, m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((B, BKP), xlo_idx),
                pl.BlockSpec((B, BKP), xhi_idx),
                pl.BlockSpec((1, BKP, bn),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, 1, bn), slo_idx),
                pl.BlockSpec((1, 1, bn), shi_idx),
            ],
            out_specs=pl.BlockSpec(
                (1, B, bn),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j),
            ),
            scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, x, q4, s4.reshape(Ln * G, 1, n), s4.reshape(Ln * G, 1, n))
    return out[0], out[1]


def bench_chain(name, fn, x0, q4, s4, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(x0, q4, s4))
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(x0, q4, s4))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer-call", flush=True)
    return t


def run_shape(label, K, N, variants):
    print(f"== {label}: K={K} N={N} ==", flush=True)
    kp, g = K // 2, K // 256
    q4, s4 = make_weights(jax.random.PRNGKey(0), kp, N, g)
    np.asarray(q4[0, 0, :1])
    x0 = jnp.ones((B, K), jnp.bfloat16)
    gb = L * (kp * N + 4 * g * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.819/L*1e3:.1f} us/layer",
          flush=True)

    def feed(y, xc):
        y = y[:, : min(y.shape[1], xc.shape[1])].astype(jnp.bfloat16)
        reps = xc.shape[1] // y.shape[1]
        return (jnp.tile(y, (1, reps)) if reps > 1 else y) * 1e-4 + xc

    from magma_tpu.ops.quant import int4_matmul_stacked

    def chain(mm):
        def f(x, q4, s4):
            def step(i, x):
                def layer(xc, idx):
                    return feed(mm(xc, q4, s4, idx), xc), None
                x, _ = jax.lax.scan(layer, x, jnp.arange(L))
                return x
            return jax.lax.fori_loop(0, STEPS, step, x)
        return f

    bench_chain("current(prod)", chain(
        lambda xc, q4, s4, idx: int4_matmul_stacked(
            xc, q4, s4, idx, out_dtype=jnp.float32)), x0, q4, s4)
    for bn in variants:
        try:
            bench_chain(f"w4a8 bn={bn}", chain(
                lambda xc, q4, s4, idx, bn=bn: w4a8_matmul(
                    xc, q4, s4, idx, bn=bn)), x0, q4, s4)
        except Exception as e:
            print(f"  [w4a8 bn={bn}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    # correctness: W4A8 vs exact dequant reference — expect ~1e-3 relative
    # (activation int8 error), far under the int4 weight error itself
    from magma_tpu.ops.quant import dequantize_int4, int4_matmul_stacked

    q4, s4 = make_weights(jax.random.PRNGKey(1), 512, 512, 4)
    xs = jax.random.normal(jax.random.PRNGKey(2), (B, 1024), jnp.bfloat16)
    ref = int4_matmul_stacked(xs, q4, s4, 3, out_dtype=jnp.float32)
    got = w4a8_matmul(xs, q4, s4, 3, bn=512)
    denom = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / denom
    print(f"correctness w4a8: rel {err:.2e}", flush=True)
    assert err < 2e-2, err  # int8-activation noise; ~6e-3 measured

    run_shape("in_proj", 4096, 28672, (14336, 4096))
    run_shape("fc_out", 16384, 4096, (4096,))

    # ---- dual (out_proj) shape: Ko=4096, Kf=16384, N=4096 ----
    from magma_tpu.ops.quant import dual_matmul_stacked

    print("== dual out_proj: Ko=4096 Kf=16384 N=4096 ==", flush=True)
    KO, KF, N = 4096, 16384, 4096
    q4d, s4d = make_weights(jax.random.PRNGKey(3), (KO + KF) // 2, N,
                            (KO + KF) // 256)
    np.asarray(q4d[0, 0, :1])
    ctx0 = jnp.ones((B, KO), jnp.bfloat16)
    h0 = jnp.ones((B, KF), jnp.bfloat16)
    gb = L * ((KO + KF) // 2 * N + 4 * (KO + KF) // 256 * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.819/L*1e3:.1f} us/layer",
          flush=True)

    # correctness of the dual w4a8 vs production dual
    wd = {"q4": q4d, "s4": s4d}
    ctxr = jax.random.normal(jax.random.PRNGKey(4), ctx0.shape, jnp.bfloat16)
    ra, rm = dual_matmul_stacked(ctxr, h0, wd, 2)
    ga, gm = w4a8_dual(ctxr, h0, q4d, s4d, 2, bn=4096)
    for g, r, nmo in ((ga, ra, "a"), (gm, rm, "m")):
        err = float(jnp.max(jnp.abs(g - r)) / (jnp.max(jnp.abs(r)) + 1e-9))
        print(f"correctness dual-w4a8[{nmo}]: rel {err:.2e}", flush=True)
        assert err < 2e-2, err

    def chain_dual(mm):
        def f(x, q4, s4):
            def step(i, carry):
                ctx, h = carry
                def layer(c, idx):
                    cc, hh = c
                    a, m = mm(cc, hh, q4, s4, idx)
                    cc = cc + a[:, :KO].astype(jnp.bfloat16) * 1e-4
                    hh = hh + m[:, :1].astype(jnp.bfloat16) * 1e-4
                    return (cc, hh), None
                c, _ = jax.lax.scan(layer, (ctx, h), jnp.arange(L))
                return c
            return jax.lax.fori_loop(0, STEPS, step, (x[0], x[1]))
        return f

    def bench_dual(name, mm, reps=3):
        f = jax.jit(chain_dual(mm))
        args = ((ctx0, h0), q4d, s4d)
        t0 = time.time()
        np.asarray(f(*args)[0])
        print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(*args)[0])
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2] / STEPS / L * 1e6
        print(f"  [{name}] {t:.1f} us/layer-call", flush=True)

    bench_dual("dual prod(bf16)", lambda c, h, q4, s4, idx:
               dual_matmul_stacked(c, h, {"q4": q4, "s4": s4}, idx))
    bench_dual("dual w4a8 bn=4096", lambda c, h, q4, s4, idx:
               w4a8_dual(c, h, q4, s4, idx, bn=4096))
    bench_dual("dual w4a8 bn=2048", lambda c, h, q4, s4, idx:
               w4a8_dual(c, h, q4, s4, idx, bn=2048))
