"""Experiment: int4 stacked-matmul block-shape variants on the serial
decode chain (round-3 decode-roofline push).

The r3 profile (scripts/exp_profile_decode.py, BITS=4) shows the in_proj
kernel at ~99.5 us/layer vs a ~74.5 us HBM roofline (75% of peak) and
o/fc_out paying two separate ~25 us launch overheads.  This benches:

  A. current kernel (bn from the 4096-max prefer list)
  B. full-N blocks (bn = N): 8 big DMAs instead of 56 small ones
  C. gpb = 2 (two quantization groups per k-block, 2 sub-dots)
  D. B + C combined

on the in_proj (K=4096, N=28672) and fc_out (K=16384, N=4096) shapes,
chained serially 28 layers x STEPS tokens inside one jit (decode has a
strict serial dependency — parallel-grid throughput numbers lie here).

Timing notes (learned the hard way on the axon tunnel):
  * weights MUST be jit arguments — closed-over device arrays are
    constant-embedded and a 1.6 GB constant costs a ~5 min compile;
  * jax.block_until_ready does NOT sync on this platform — force a
    numpy readback of the (tiny) output instead;
  * one dispatch costs ~40 ms of tunnel latency, so STEPS is large and
    the per-layer figure subtracts nothing (variants share the offset).

Run: python scripts/exp_kernel_blocks.py
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
B = 8  # padded decode row block


def make_weights(key, kp, n, g):
    k1, k2 = jax.random.split(key)
    q4 = jax.random.randint(k1, (L, kp, n), -128, 128, jnp.int8)
    s4 = jax.random.uniform(k2, (L, g, n), jnp.float32, 1e-3, 2e-3)
    return q4, s4


def kernel_var(x, q4, s4, idx, *, bn, groups_per_block):
    """int4 stacked matmul with configurable (bn, groups-per-k-block)."""
    m, k = x.shape
    Ln, kp, n = q4.shape
    G = s4.shape[1]
    gsz = kp // (G // 2)              # packed rows per group
    bkp = gsz * groups_per_block
    n_k = kp // bkp

    def kern(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,
             o_ref, acc_ref):
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p32 = w_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        for g in range(groups_per_block):
            sl = slice(g * gsz, (g + 1) * gsz)
            plo = jax.lax.dot(
                xlo_ref[:, sl].astype(jnp.bfloat16), lo[sl],
                preferred_element_type=jnp.float32)
            phi = jax.lax.dot(
                xhi_ref[:, sl].astype(jnp.bfloat16), hi[sl],
                preferred_element_type=jnp.float32)
            acc_ref[...] += plo * slo_ref[0, g] + phi * shi_ref[0, g]

        @pl.when(kb == n_k - 1)
        def _store():
            o_ref[...] = acc_ref[...]

    idx = jnp.asarray(idx, jnp.int32).reshape(1)
    gpb = groups_per_block
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // B, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((B, bkp), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((B, bkp), lambda i, j, kb, ir: (i, n_k + kb)),
                pl.BlockSpec((1, bkp, bn),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((1, gpb, bn),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + kb, 0, j)),
                pl.BlockSpec((1, gpb, bn),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // gpb) + (G // 2) // gpb + kb, 0, j)),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i, j, kb, ir: (i, j)),
            scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, x, q4, s4.reshape(Ln * G // gpb, gpb, n),
      s4.reshape(Ln * G // gpb, gpb, n))


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


def run_shape(label, K, N, feed_cols, variants):
    print(f"== {label}: K={K} N={N} ==", flush=True)
    kp, g = K // 2, K // 256
    q4, s4 = make_weights(jax.random.PRNGKey(0), kp, N, g)
    np.asarray(q4[0, 0, :1])  # materialize
    x0 = jnp.ones((B, K), jnp.bfloat16)
    gb = L * (kp * N + 4 * g * N) / 1e9
    print(f"  weights {gb:.2f} GB -> roofline {gb/0.8/L*1e3:.1f} us/layer"
          f" @819GB/s", flush=True)

    def feed(y, xc):
        y = y[:, feed_cols[0]:feed_cols[1]].astype(jnp.bfloat16)
        reps = xc.shape[1] // y.shape[1]
        return (jnp.tile(y, (1, reps)) if reps > 1 else y) * 1e-4 + xc

    def chain(bn, gpb):
        def f(x, q4, s4):
            def step(i, x):
                def layer(xc, idx):
                    y = kernel_var(xc, q4, s4, idx, bn=bn,
                                   groups_per_block=gpb)
                    return feed(y, xc), None
                x, _ = jax.lax.scan(layer, x, jnp.arange(L))
                return x
            return jax.lax.fori_loop(0, STEPS, step, x)
        return f

    from magma_tpu.ops.quant import int4_matmul_stacked

    def cur(x, q4, s4):
        def step(i, x):
            def layer(xc, idx):
                y = int4_matmul_stacked(xc, q4, s4, idx,
                                        out_dtype=jnp.float32)
                return feed(y, xc), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    bench_chain("current(prod)", cur, x0, q4, s4)
    for bn, gpb in variants:
        try:
            bench_chain(f"bn={bn} gpb={gpb}", chain(bn, gpb), x0, q4, s4)
        except Exception as e:
            print(f"  [bn={bn} gpb={gpb}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    # correctness spot-check vs production kernel (K=1024 -> G=4 so a
    # 2-group k-block is representable)
    from magma_tpu.ops.quant import int4_matmul_stacked
    q4, s4 = make_weights(jax.random.PRNGKey(1), 512, 512, 4)
    xs = jax.random.normal(jax.random.PRNGKey(2), (B, 1024), jnp.bfloat16)
    ref = int4_matmul_stacked(xs, q4, s4, 3, out_dtype=jnp.float32)
    for bn, gpb in [(512, 1), (512, 2)]:
        got = kernel_var(xs, q4, s4, 3, bn=bn, groups_per_block=gpb)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"correctness bn={bn} gpb={gpb}: rel {err:.2e}", flush=True)
        assert err < 1e-5, err

    run_shape("in_proj", 4096, 28672, (0, 4096),
              [(28672, 1), (28672, 2), (4096, 2), (14336, 1)])
    run_shape("fc_out", 16384, 4096, (0, 4096),
              [(4096, 2), (4096, 4)])
