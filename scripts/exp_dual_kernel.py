"""Experiment: fuse the o_proj and fc_out int4 matmuls into ONE Pallas
launch with two outputs (round-3 decode-roofline push).

The r3 profile (scripts/exp_profile_decode.py, BITS=4) shows o_proj +
fc_out as two separate launches costing ~72 us/layer vs a ~52 us combined
HBM roofline — i.e. paying the ~100 us serial-chain launch latency twice
for what is one weight stream.  The GPT-J parallel block needs the two
branch outputs SEPARATELY (post-adapters act on each branch), so a plain
concat-K matmul (which would sum them) is out; instead one kernel walks
the concatenated packed-K weight stream and switches its accumulator /
output window at the o->fc_out boundary, producing a (M, 2, N) output.

Layouts (packed rows, bkp = 256 per block):
  x_cat (M, K_o + K_f):  [o_lo | o_hi | f_lo | f_hi]
  w_cat (L, (K_o+K_f)/2, N): o rows [0, kpo), f rows [kpo, kpo+kpf)
  s_cat (L, G_o + G_f, N):  o groups [0, G_o), f groups [G_o, ...)

Run: python scripts/exp_dual_kernel.py
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
D = 4096          # K_o = N_o = N_f = D
F = 16384         # K_f
BKP = 256         # packed rows per block = one 256-row group per nibble half


def dual_kernel(xcat, wcat, scat, idx, *, kpo, kpf, bn):
    """One launch: (M, K_o)@W_o and (M, K_f)@W_f -> (M, 2, N) f32."""
    m, kcat = xcat.shape
    Ln, kptot, n = wcat.shape
    G = scat.shape[1]
    assert kptot == kpo + kpf and kcat == 2 * kptot
    nko, nkf = kpo // BKP, kpf // BKP
    n_k = nko + nkf

    def kern(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
             o_ref, acc_ref):
        kb = pl.program_id(2)

        @pl.when((kb == 0) | (kb == nko))
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p32 = w_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        plo = jax.lax.dot(xlo_ref[...].astype(jnp.bfloat16), lo,
                          preferred_element_type=jnp.float32)
        phi = jax.lax.dot(xhi_ref[...].astype(jnp.bfloat16), hi,
                          preferred_element_type=jnp.float32)
        acc_ref[...] += plo * slo_ref[0] + phi * shi_ref[0]

        @pl.when((kb == nko - 1) | (kb == n_k - 1))
        def _store():
            o_ref[...] = acc_ref[...][None]

    idx = jnp.asarray(idx, jnp.int32).reshape(1)

    def xlo_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, kb, 2 * nko + (kb - nko)))

    def xhi_idx(i, j, kb, ir):
        return (i, jnp.where(kb < nko, nko + kb,
                             2 * nko + nkf + (kb - nko)))

    def slo_idx(i, j, kb, ir):
        return (ir[0] * G + jnp.where(kb < nko, kb, kb + nko), 0, j)

    def shi_idx(i, j, kb, ir):
        return (ir[0] * G
                + jnp.where(kb < nko, kb + nko, kb + nko + nkf), 0, j)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((m, BKP), xlo_idx),
                pl.BlockSpec((m, BKP), xhi_idx),
                pl.BlockSpec((1, BKP, bn),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, 1, bn), slo_idx),
                pl.BlockSpec((1, 1, bn), shi_idx),
            ],
            out_specs=pl.BlockSpec(
                (1, m, bn),
                lambda i, j, kb, ir: (jnp.where(kb < nko, 0, 1), i, j)),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, xcat, xcat, wcat, scat.reshape(Ln * G, 1, n),
      scat.reshape(Ln * G, 1, n))
    return out


def make(key, kp, n, g):
    k1, k2 = jax.random.split(key)
    q = jax.random.randint(k1, (L, kp, n), -128, 128, jnp.int8)
    s = jax.random.uniform(k2, (L, g, n), jnp.float32, 1e-3, 2e-3)
    return q, s


def bench(name, fn, x0, *args, reps=3):
    # weights as jit ARGS (closure would constant-embed 1.6 GB -> 5 min
    # compile) and numpy readback (block_until_ready is a no-op on axon)
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(x0, *args))
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(x0, *args))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer", flush=True)
    return t


if __name__ == "__main__":
    from magma_tpu.ops.quant import int4_matmul_stacked

    kpo, kpf = D // 2, F // 2
    go, gf = D // 256, F // 256
    qo, so = make(jax.random.PRNGKey(0), kpo, D, go)
    qf, sf = make(jax.random.PRNGKey(1), kpf, D, gf)
    wcat = jnp.concatenate([qo, qf], axis=1)
    scat = jnp.concatenate([so, sf], axis=1)

    # --- correctness vs two production calls ---
    key = jax.random.PRNGKey(2)
    ctx = jax.random.normal(key, (B, D), jnp.bfloat16)
    h = jax.random.normal(key, (B, F), jnp.bfloat16)
    xcat = jnp.concatenate(
        [ctx[:, :kpo], ctx[:, kpo:], h[:, :kpf], h[:, kpf:]], axis=1)
    ref_a = int4_matmul_stacked(ctx, qo, so, 3, out_dtype=jnp.float32)
    ref_m = int4_matmul_stacked(h, qf, sf, 3, out_dtype=jnp.float32)
    got = dual_kernel(xcat, wcat, scat, 3, kpo=kpo, kpf=kpf, bn=D)
    ea = float(jnp.max(jnp.abs(got[0] - ref_a)) / jnp.max(jnp.abs(ref_a)))
    em = float(jnp.max(jnp.abs(got[1] - ref_m)) / jnp.max(jnp.abs(ref_m)))
    print(f"correctness: a rel {ea:.2e}  m rel {em:.2e}", flush=True)
    assert ea < 1e-5 and em < 1e-5, (ea, em)

    gb = L * (kpo * D + kpf * D) / 1e9
    print(f"weights {gb:.2f} GB -> roofline {gb/0.8/L*1e3:.1f} us/layer",
          flush=True)

    # --- serial chains ---
    def cur(x, qo, so, qf, sf):  # x = (B, D) "ctx"; h derived for the dep chain
        def step(i, x):
            def layer(xc, idx):
                a = int4_matmul_stacked(xc, qo, so, idx,
                                        out_dtype=jnp.float32)
                hh = jnp.tile(xc, (1, F // D)).astype(jnp.bfloat16)
                mm = int4_matmul_stacked(hh, qf, sf, idx,
                                         out_dtype=jnp.float32)
                return (xc + (a + mm).astype(jnp.bfloat16) * 1e-4), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    def fused(x, wcat, scat):
        def step(i, x):
            def layer(xc, idx):
                hh = jnp.tile(xc, (1, F // D)).astype(jnp.bfloat16)
                xcat = jnp.concatenate(
                    [xc[:, :kpo], xc[:, kpo:], hh[:, :kpf], hh[:, kpf:]],
                    axis=1)
                out = dual_kernel(xcat, wcat, scat, idx,
                                  kpo=kpo, kpf=kpf, bn=D)
                return (xc + (out[0] + out[1])
                        .astype(jnp.bfloat16) * 1e-4), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    gb = L * (kpo * D + kpf * D) / 1e9
    print(f"combined roofline {gb/0.8/L*1e3:.1f} us/layer", flush=True)
    x0 = jnp.ones((B, D), jnp.bfloat16)
    bench("two-calls(prod)", cur, x0, qo, so, qf, sf)
    bench("dual-fused", fused, x0, wcat, scat)
