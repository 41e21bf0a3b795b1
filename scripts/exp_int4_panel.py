"""Experiment: PANEL-packed int4 + multi-group k-blocks.

Two composable fixes for the int4 decode kernels (exp_int4_colpack.py
showed colpack wins in_proj 134.9 -> 117.7 us/layer but ties fc_out at
87 vs a 42.3 roofline — per-grid-step overhead dominates at small
blocks):

1. COLUMN packing, panel-local: byte (k, p*128 + j) holds original
   columns (p*256 + j) [low nibble, stored +8] and (p*256 + 128 + j)
   [high nibble] for panel p.  Both nibbles multiply the SAME activation
   row, so the MXU dots the raw bytes (one 0xF0 mask per byte, no
   shifts/converts), and the lo/hi output planes interleave back to
   NATURAL column order with one in-register relayout at store time —
   so concatenated payloads (in_proj = q|k|v|fc_in) and TP column
   sharding keep working, unlike global (j, j+N/2) pairing.

2. Multi-group k-blocks: one grid step walks GPB quantization groups
   (GPB*256 k-rows), amortizing the per-step Mosaic overhead that
   dominates when a (256, bn) block is only 1-4 MB.

Run: python scripts/exp_int4_panel.py
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
GROUP = 256


def pack_panel(q):
    """int8 nibble values (..., K, N) -> panel-packed bytes (..., K, N/2).
    Byte (k, 128p + j): lo = col 256p + j (offset +8), hi = col 256p+128+j."""
    lead = q.shape[:-2]
    K, N = q.shape[-2], q.shape[-1]
    qv = q.astype(jnp.int32).reshape(*lead, K, N // 256, 2, 128)
    lo = (qv[..., 0, :] + 8) & 0xF
    hi = qv[..., 1, :] & 0xF
    return ((hi << 4) | lo).astype(jnp.int8).reshape(*lead, K, N // 2)


def make_weights(key, K, N):
    k1, k2 = jax.random.split(key)
    G = K // GROUP

    def one_layer(k):
        q = jax.random.randint(k, (K, N), -7, 8, jnp.int8)
        return pack_panel(q)
    wp = jax.lax.map(jax.jit(one_layer), jax.random.split(k1, L))
    s4 = jax.random.uniform(k2, (L, G, N), jnp.float32, 1e-3, 2e-3)
    return wp, s4


def dequant_layer(key_layer, K, N, s4_l):
    q = jax.random.randint(key_layer, (K, N), -7, 8, jnp.int8)
    return (q.astype(jnp.float32)
            * jnp.repeat(s4_l, GROUP, axis=0).astype(jnp.float32))


def panel_kernel(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                 *, n_k, gpb, nko=None):
    """One grid step = gpb groups.  acc holds (2, bm, bnp) lo/hi planes;
    store interleaves panels back to natural (bm, 2*bnp) order.
    With nko (dual mode): accumulator resets and output switches at the
    k-block boundary between the two stacked matmuls."""
    kb = pl.program_id(2)

    reset = (kb == 0) if nko is None else ((kb == 0) | (kb == nko))

    @pl.when(reset)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for g in range(gpb):
        xf = x_ref[:, g * GROUP:(g + 1) * GROUP].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.round(xf / sx).astype(jnp.int8)
        rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)

        b = w_ref[0, g * GROUP:(g + 1) * GROUP]          # (GROUP, bnp)
        bhi = b & jnp.int8(-16)
        p1 = jax.lax.dot(xq, b, preferred_element_type=jnp.int32)
        p2 = jax.lax.dot(xq, bhi, preferred_element_type=jnp.int32)
        slo = s_ref[g, :, 0, :].reshape(1, -1)           # (1, bnp) natural->packed
        shi = s_ref[g, :, 1, :].reshape(1, -1)
        lo = (p1 - p2 - 8 * rs).astype(jnp.float32) * (sx * slo)
        hi = p2.astype(jnp.float32) * (sx * (shi * 0.0625))
        acc_ref[...] += jnp.stack([lo, hi])

    last = (kb == n_k - 1) if nko is None else ((kb == nko - 1) | (kb == n_k - 1))

    @pl.when(last)
    def _store():
        bm, bnp = acc_ref.shape[1], acc_ref.shape[2]
        lo = acc_ref[0].reshape(bm, bnp // 128, 1, 128)
        hi = acc_ref[1].reshape(bm, bnp // 128, 1, 128)
        nat = jnp.concatenate([lo, hi], axis=2).reshape(bm, 2 * bnp)
        if nko is None:
            o_ref[...] = nat
        else:
            o_ref[...] = nat[None]


def panel_matmul(x, wp, s4, layer_idx, *, bnp, gpb):
    m, K = x.shape
    Ln, K2, NP = wp.shape
    G = s4.shape[1]
    N = 2 * NP
    bkb = gpb * GROUP
    n_k = K // bkb
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s_view = s4.reshape(Ln * G, N // 256, 2, 128)        # pure view
    out = pl.pallas_call(
        functools.partial(panel_kernel, n_k=n_k, gpb=gpb),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, NP // bnp, n_k),
            in_specs=[
                pl.BlockSpec((B, bkb), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, bkb, bnp),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((gpb, bnp // 128, 2, 128),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + kb, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, 2 * bnp), lambda i, j, kb, ir: (i, j)),
            scratch_shapes=[pltpu.VMEM((2, B, bnp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_view)
    return out


def panel_dual(ctx, h, wp, s4, layer_idx, *, bnp, gpb):
    """[ctx | h] against K-concatenated panel payload -> (2, m, N)."""
    m = ctx.shape[0]
    ko, kf = ctx.shape[1], h.shape[1]
    Ln, K2, NP = wp.shape
    G = s4.shape[1]
    N = 2 * NP
    bkb = gpb * GROUP
    nko, n_k = ko // bkb, (ko + kf) // bkb
    x = jnp.concatenate([ctx, h], axis=1)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s_view = s4.reshape(Ln * G, N // 256, 2, 128)
    out = pl.pallas_call(
        functools.partial(panel_kernel, n_k=n_k, gpb=gpb, nko=nko),
        out_shape=jax.ShapeDtypeStruct((2, m, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, NP // bnp, n_k),
            in_specs=[
                pl.BlockSpec((B, bkb), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, bkb, bnp),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((gpb, bnp // 128, 2, 128),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + kb, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, B, 2 * bnp),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j)),
            scratch_shapes=[pltpu.VMEM((2, B, bnp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_view)
    return out[0], out[1]


def bench_chain(name, fn, x0, *ws, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(x0, *ws))
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(x0, *ws))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer-call", flush=True)
    return t


def feed(y, xc):
    y = y[:, : min(y.shape[1], xc.shape[1])].astype(jnp.bfloat16)
    reps = xc.shape[1] // y.shape[1]
    return (jnp.tile(y, (1, reps)) if reps > 1 else y) * 1e-4 + xc


def chain(mm):
    def f(x, *ws):
        def step(i, x):
            def layer(xc, idx):
                return feed(mm(xc, idx, *ws), xc), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)
    return f


def chain_dual(mm, ko):
    def f(x, *ws):
        def step(i, x):
            def layer(xc, idx):
                a, m = mm(xc[:, :ko], xc[:, ko:], idx, *ws)
                y = jnp.concatenate(
                    [a, jnp.tile(m, (1, xc.shape[1] // a.shape[1] - 1))],
                    axis=1)
                return y.astype(jnp.bfloat16) * 1e-4 + xc, None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)
    return f


def run_shape(label, K, N, configs):
    print(f"== {label}: K={K} N={N} ==", flush=True)
    wp, s4 = make_weights(jax.random.PRNGKey(0), K, N)
    np.asarray(wp[0, 0, :1])
    gb = L * (K * N / 2 + 4 * (K // GROUP) * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.819/L*1e3:.1f} us/layer",
          flush=True)
    x0 = jnp.ones((B, K), jnp.bfloat16)

    # correctness vs exact dequant of layer 3 (random x; tolerance covers
    # the ~6e-3 W4A8 activation-quantization error)
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    xr = jax.random.normal(
        jax.random.PRNGKey(9), (B, K), jnp.float32).astype(jnp.bfloat16)
    w3 = jax.jit(dequant_layer, static_argnums=(1, 2))(
        jax.random.split(k1, L)[3], K, N, s4[3])
    ref = jnp.dot(xr.astype(jnp.float32), w3)
    del w3
    got = panel_matmul(xr, wp, s4, 3,
                       bnp=configs[0][0], gpb=configs[0][1])
    mx = float(jnp.max(jnp.abs(ref))) + 1e-9
    rel = float(jnp.max(jnp.abs(got - ref))) / mx
    print(f"  correctness panel: rel {rel:.2e}", flush=True)
    assert rel < 2e-2, rel

    for bnp, gpb in configs:
        bench_chain(f"panel bnp={bnp} gpb={gpb}", chain(
            lambda xc, idx, wp, s4, bnp=bnp, gpb=gpb: panel_matmul(
                xc, wp, s4, idx, bnp=bnp, gpb=gpb)), x0, wp, s4)


def run_dual(ko, kf, N, configs):
    print(f"== dual: Ko={ko} Kf={kf} N={N} ==", flush=True)
    K = ko + kf
    wp, s4 = make_weights(jax.random.PRNGKey(1), K, N)
    np.asarray(wp[0, 0, :1])
    gb = L * (K * N / 2 + 4 * (K // GROUP) * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.819/L*1e3:.1f} us/layer",
          flush=True)
    x0 = jnp.ones((B, K), jnp.bfloat16)

    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    w3 = jax.jit(dequant_layer, static_argnums=(1, 2))(
        jax.random.split(k1, L)[3], K, N, s4[3])
    refa = jnp.dot(x0[:, :ko].astype(jnp.float32), w3[:ko])
    refm = jnp.dot(x0[:, ko:].astype(jnp.float32), w3[ko:])
    del w3
    a, m = panel_dual(x0[:, :ko], x0[:, ko:], wp, s4, 3,
                      bnp=configs[0][0], gpb=configs[0][1])
    mx = float(jnp.max(jnp.abs(refa))) + 1e-9
    rel = max(float(jnp.max(jnp.abs(a - refa))) / mx,
              float(jnp.max(jnp.abs(m - refm))) / (float(jnp.max(jnp.abs(refm))) + 1e-9))
    print(f"  correctness dual: rel {rel:.2e}", flush=True)
    assert rel < 2e-2, rel

    # production comparison
    from magma_tpu.ops.quant import dual_matmul_stacked, quantize_int4

    def mkprod(k):
        kq = jax.random.PRNGKey(7)
        q = jax.lax.map(
            jax.jit(lambda kk: quantize_int4(
                jax.random.normal(kk, (K, N), jnp.float32) * 0.02)),
            jax.random.split(kq, L))
        return q
    prod = mkprod(None)
    bench_chain("prod dual row-packed W4A8", chain_dual(
        lambda c, h, idx, w: dual_matmul_stacked(
            c, h, w, idx, out_dtype=jnp.float32), ko),
        x0, {"q4": prod["q4"], "s4": prod["s4"]})

    for bnp, gpb in configs:
        bench_chain(f"panel dual bnp={bnp} gpb={gpb}", chain_dual(
            lambda c, h, idx, wp, s4, bnp=bnp, gpb=gpb: panel_dual(
                c, h, wp, s4, idx, bnp=bnp, gpb=gpb), ko),
            x0, wp, s4)


if __name__ == "__main__":
    run_shape("in_proj", 4096, 28672, ((14336, 4), (14336, 2), (7168, 4)))
    run_shape("fc_out", 16384, 4096, ((2048, 8), (2048, 4), (2048, 16)))
    # vocab padded 50257 -> 50432 (= 197*256; the serving pad today is
    # 50304 = 393*128, which panel pairing can't split -- worth re-padding
    # if int4 lm_head wins).  NP = 25216 = 197*128: 197 prime, so the only
    # 128-multiple block is the full width.
    run_shape("lm_head", 4096, 50432, ((25216, 4), (25216, 2), (25216, 8)))
    run_dual(4096, 16384, 4096, ((2048, 8), (2048, 4), (2048, 16)))


# ---------------------------------------------------------------------------
# W4A16 variant: no activation quantization — mask + int8->bf16 converts +
# two bf16 dots on RAW bf16 activations.  Removes the ~17 us/layer AQ VPU
# cost AND the ~6e-3 activation error (weight-only int4 again).
# ---------------------------------------------------------------------------

def panel_kernel_a16(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                     *, n_k, gpb, nko=None):
    kb = pl.program_id(2)
    reset = (kb == 0) if nko is None else ((kb == 0) | (kb == nko))

    @pl.when(reset)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for g in range(gpb):
        xb = x_ref[:, g * GROUP:(g + 1) * GROUP]
        rs = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
        b = w_ref[0, g * GROUP:(g + 1) * GROUP]
        bhi = (b & jnp.int8(-16)).astype(jnp.bfloat16)
        p1 = jax.lax.dot(xb, b.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        p2 = jax.lax.dot(xb, bhi, preferred_element_type=jnp.float32)
        slo = s_ref[g, :, 0, :].reshape(1, -1)
        shi = s_ref[g, :, 1, :].reshape(1, -1)
        lo = (p1 - p2 - 8.0 * rs) * slo
        hi = p2 * (shi * 0.0625)
        acc_ref[...] += jnp.stack([lo, hi])

    last = (kb == n_k - 1) if nko is None else ((kb == nko - 1) | (kb == n_k - 1))

    @pl.when(last)
    def _store():
        bm, bnp = acc_ref.shape[1], acc_ref.shape[2]
        lo = acc_ref[0].reshape(bm, bnp // 128, 1, 128)
        hi = acc_ref[1].reshape(bm, bnp // 128, 1, 128)
        nat = jnp.concatenate([lo, hi], axis=2).reshape(bm, 2 * bnp)
        o_ref[...] = nat if nko is None else nat[None]


def panel_matmul_a16(x, wp, s4, layer_idx, *, bnp, gpb):
    m, K = x.shape
    Ln, K2, NP = wp.shape
    G = s4.shape[1]
    N = 2 * NP
    bkb = gpb * GROUP
    n_k = K // bkb
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s_view = s4.reshape(Ln * G, N // 256, 2, 128)
    return pl.pallas_call(
        functools.partial(panel_kernel_a16, n_k=n_k, gpb=gpb),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, NP // bnp, n_k),
            in_specs=[
                pl.BlockSpec((B, bkb), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, bkb, bnp),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((gpb, bnp // 128, 2, 128),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + kb, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, 2 * bnp), lambda i, j, kb, ir: (i, j)),
            scratch_shapes=[pltpu.VMEM((2, B, bnp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_view)


def panel_dual_a16(ctx, h, wp, s4, layer_idx, *, bnp, gpb):
    m = ctx.shape[0]
    ko, kf = ctx.shape[1], h.shape[1]
    Ln, K2, NP = wp.shape
    G = s4.shape[1]
    N = 2 * NP
    bkb = gpb * GROUP
    nko, n_k = ko // bkb, (ko + kf) // bkb
    x = jnp.concatenate([ctx, h], axis=1)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s_view = s4.reshape(Ln * G, N // 256, 2, 128)
    out = pl.pallas_call(
        functools.partial(panel_kernel_a16, n_k=n_k, gpb=gpb, nko=nko),
        out_shape=jax.ShapeDtypeStruct((2, m, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, NP // bnp, n_k),
            in_specs=[
                pl.BlockSpec((B, bkb), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, bkb, bnp),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((gpb, bnp // 128, 2, 128),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + kb, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, B, 2 * bnp),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j)),
            scratch_shapes=[pltpu.VMEM((2, B, bnp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_view)
    return out[0], out[1]
