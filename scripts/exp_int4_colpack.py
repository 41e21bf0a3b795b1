"""Experiment: COLUMN-packed int4 kernels — dot the raw packed bytes.

The r4 W4A8 kernels (exp_w4a8.py landed) still run at ~60% of the DMA
roofline (in_proj 117.9 us vs 73.9, dual 98.2 vs 52.8): the VPU nibble
unpack (2 shifts + 2 int32<->int8 converts per byte) can't hide under
the weight DMA at these shapes.

Idea: pack two output COLUMNS (n, n + N/2) per byte instead of two input
rows.  Both nibbles then multiply the SAME activation rows, so the MXU
can consume the packed bytes directly:

    b          = (hi << 4) | ((lo + 8) & 0xF)      signed byte = 16*hi + (lo+8)
    P1         = dot(x_q, b)                        = 16*H + L_u
    P2         = dot(x_q, b & 0xF0)                 = 16*H
    L          = P1 - P2 - 8 * rowsum(x_q)          (lo plane, offset removed)
    H          = P2 * (1/16)                        (hi plane)

Per byte of weights the VPU does ONE and-mask (for P2's operand) — no
shifts, no converts; everything else is two int8 MXU dots and f32
accumulator math on (bm, bn) tiles.  The x stream also halves (one
block, not lo/hi halves).

Run: python scripts/exp_int4_colpack.py
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
BK = 256  # activation rows per k-block = one quantization group


def pack_cols(q):
    """q int8 nibble values (..., K, N) -> column-packed bytes
    (..., K, N/2).  Low nibble = column j stored offset-8; high nibble =
    column j + N/2."""
    N = q.shape[-1]
    q = q.astype(jnp.int32)
    lo = (q[..., : N // 2] + 8) & 0xF
    hi = q[..., N // 2:] & 0xF
    return ((hi << 4) | lo).astype(jnp.int8)


def pack_rows(q):
    """Row-packed production layout (quantize_int4 packing rule)."""
    K = q.shape[-2]
    q = q.astype(jnp.int32)
    lo, hi = q[..., : K // 2, :], q[..., K // 2:, :]
    return ((hi & 0xF) << 4 | (lo & 0xF)).astype(jnp.int8)


def make_weights(key, K, N):
    """Both packings of the same random nibbles, built per layer under
    jit so peak HBM stays ~2 payloads (full int32 nibbles would be 13 GB
    at the in_proj shape)."""
    k1, k2 = jax.random.split(key)
    G = K // BK

    def one_layer(k):
        q = jax.random.randint(k, (K, N), -7, 8, jnp.int8)
        return pack_cols(q), pack_rows(q), q[:, :1] * 0  # drop q
    wc, wr, _ = jax.lax.map(jax.jit(one_layer), jax.random.split(k1, L))
    s4 = jax.random.uniform(k2, (L, G, N), jnp.float32, 1e-3, 2e-3)
    return wc, wr, s4


def dequant_layer(key_layer, K, N, s4_l):
    """Recompute layer nibbles from its per-layer key -> f32 weights."""
    q = jax.random.randint(key_layer, (K, N), -7, 8, jnp.int8)
    return (q.astype(jnp.float32)
            * jnp.repeat(s4_l, BK, axis=0).astype(jnp.float32))


def colpack_kernel(idx_ref, x_ref, w_ref, slo_ref, shi_ref, o_ref,
                   acc_ref, *, n_k):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)

    b = w_ref[0]                                   # (BK, bnp) raw bytes
    bhi = b & jnp.int8(-16)                        # 0xF0 mask, ONE vpu op
    p1 = jax.lax.dot(xq, b, preferred_element_type=jnp.int32)
    p2 = jax.lax.dot(xq, bhi, preferred_element_type=jnp.int32)
    lo = (p1 - p2 - 8 * rs).astype(jnp.float32) * (sx * slo_ref[0])
    hi = p2.astype(jnp.float32) * (sx * (shi_ref[0] * 0.0625))
    acc_ref[...] += jnp.stack([lo, hi])

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def colpack_matmul(x, wp, s4, layer_idx, *, bnp):
    m, K = x.shape
    Ln, K2, NP = wp.shape
    G = s4.shape[1]
    N = 2 * NP
    n_k = K // BK
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    # scales laid out (L*G, 1, N): lo cols [0, N/2), hi cols [N/2, N)
    s_flat = s4.reshape(Ln * G, 1, N)
    out = pl.pallas_call(
        functools.partial(colpack_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((2, m, NP), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, NP // bnp, n_k),
            in_specs=[
                pl.BlockSpec((B, BK), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, BK, bnp),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, 1, bnp),
                             lambda i, j, kb, ir: (ir[0] * G + kb, 0, j)),
                pl.BlockSpec((1, 1, bnp),
                             lambda i, j, kb, ir: (ir[0] * G + kb, 0,
                                                   j + NP // bnp)),
            ],
            out_specs=pl.BlockSpec((2, B, bnp),
                                   lambda i, j, kb, ir: (0, i, j)),
            scratch_shapes=[pltpu.VMEM((2, B, bnp), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_flat, s_flat)
    return jnp.concatenate([out[0], out[1]], axis=-1)   # (m, N)


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


def run_shape(label, K, N, bnps):
    print(f"== {label}: K={K} N={N} ==", flush=True)
    wc, wr, s4 = make_weights(jax.random.PRNGKey(0), K, N)
    np.asarray(wc[0, 0, :1])
    gb = L * (K * N / 2 + 4 * (K // BK) * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.819/L*1e3:.1f} us/layer",
          flush=True)
    x0 = jnp.ones((B, K), jnp.bfloat16)

    from magma_tpu.ops.quant import int4_matmul_stacked

    # correctness: colpack + prod vs exact dequant of layer 3
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    w3 = jax.jit(dequant_layer, static_argnums=(1, 2))(
        jax.random.split(k1, L)[3], K, N, s4[3])
    ref = jnp.dot(x0.astype(jnp.float32), w3)
    del w3
    got = colpack_matmul(x0, wc, s4, 3, bnp=bnps[0])
    gotr = int4_matmul_stacked(x0, wr, s4, 3, out_dtype=jnp.float32)
    mx = float(jnp.max(jnp.abs(ref))) + 1e-9
    print(f"  correctness colpack: rel "
          f"{float(jnp.max(jnp.abs(got - ref))) / mx:.2e}   "
          f"prod: rel {float(jnp.max(jnp.abs(gotr - ref))) / mx:.2e}",
          flush=True)
    assert float(jnp.max(jnp.abs(got - ref))) / mx < 2e-2

    bench_chain("prod row-packed W4A8", chain(
        lambda xc, idx, q4, s4: int4_matmul_stacked(
            xc, q4, s4, idx, out_dtype=jnp.float32)), x0, wr, s4)
    for bnp in bnps:
        bench_chain(f"colpack bnp={bnp}", chain(
            lambda xc, idx, wp, s4, bnp=bnp: colpack_matmul(
                xc, wp, s4, idx, bnp=bnp)), x0, wc, s4)


if __name__ == "__main__":
    run_shape("in_proj", 4096, 28672, (14336, 7168, 3584))
    run_shape("fc_out", 16384, 4096, (2048, 1024))
