"""Anatomy of the int4 decode kernel cost: which stage eats the 2x gap
to the DMA roofline?

exp_int4_panel.py showed neither colpack (VPU unpack removal) nor
multi-group blocks (grid-step overhead removal) get fc_out below ~84
us/layer vs a 42.3 roofline.  This strips the panel kernel stage by
stage on the fc_out shape (K=16384, N=4096) to locate the cost:

  full        act-quant + mask + 2 int8 dots + scale math  (production)
  noquant     precomputed int8 x (drops per-group act quantization)
  onedot      single int8 dot (wrong math, measures MXU occupancy)
  nodot       VPU block-sum only (the pure DMA floor)
  bf16dot     2 bf16 dots (int8 vs bf16 MXU rate at m=8)
  m128        full kernel at m=128 (does time scale with m? if flat,
              the MXU pads m to its native tile and dots are the limiter)

Run: python scripts/exp_int4_anatomy.py
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
GROUP = 256
K, N = 16384, 4096
NP = N // 2
GPB = 4
BNP = 2048


def make(key):
    k1, k2 = jax.random.split(key)
    wp = jax.random.randint(k1, (L, K, NP), -128, 128, jnp.int8)
    s4 = jax.random.uniform(k2, (L, K // GROUP, N), jnp.float32, 1e-3, 2e-3)
    return wp, s4


def kernel(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, mode):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for g in range(GPB):
        b = w_ref[0, g * GROUP:(g + 1) * GROUP]
        if mode == "nodot":
            acc_ref[0] += jnp.sum(b, axis=0).astype(jnp.float32)[None, :]
            continue
        if mode == "noquant":
            xq = x_ref[:, g * GROUP:(g + 1) * GROUP]
            sx = jnp.float32(1.0)
            rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        else:
            xf = x_ref[:, g * GROUP:(g + 1) * GROUP].astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            sx = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.round(xf / sx).astype(jnp.int8)
            rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        slo = s_ref[g, :, 0, :].reshape(1, -1)
        shi = s_ref[g, :, 1, :].reshape(1, -1)
        if mode == "bf16dot":
            p1 = jax.lax.dot(xq.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            p2 = jax.lax.dot(xq.astype(jnp.bfloat16),
                             (b & jnp.int8(-16)).astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            lo = (p1 - p2 - 8.0 * rs.astype(jnp.float32)) * (sx * slo)
            hi = p2 * (sx * (shi * 0.0625))
        elif mode == "onedot":
            p1 = jax.lax.dot(xq, b, preferred_element_type=jnp.int32)
            lo = p1.astype(jnp.float32) * (sx * slo)
            hi = lo * 0.5
        else:
            bhi = b & jnp.int8(-16)
            p1 = jax.lax.dot(xq, b, preferred_element_type=jnp.int32)
            p2 = jax.lax.dot(xq, bhi, preferred_element_type=jnp.int32)
            lo = (p1 - p2 - 8 * rs).astype(jnp.float32) * (sx * slo)
            hi = p2.astype(jnp.float32) * (sx * (shi * 0.0625))
        acc_ref[...] += jnp.stack([lo, hi])

    @pl.when(kb == n_k - 1)
    def _store():
        bm, bnp = acc_ref.shape[1], acc_ref.shape[2]
        lo = acc_ref[0].reshape(bm, bnp // 128, 1, 128)
        hi = acc_ref[1].reshape(bm, bnp // 128, 1, 128)
        o_ref[...] = jnp.concatenate([lo, hi], axis=2).reshape(bm, 2 * bnp)


def matmul(x, wp, s4, layer_idx, *, mode):
    m = x.shape[0]
    G = s4.shape[1]
    bkb = GPB * GROUP
    n_k = K // bkb
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s_view = s4.reshape(L * G, N // 256, 2, 128)
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k, mode=mode),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, NP // BNP, n_k),
            in_specs=[
                pl.BlockSpec((m, bkb), lambda i, j, kb, ir: (i, kb)),
                pl.BlockSpec((1, bkb, BNP),
                             lambda i, j, kb, ir: (ir[0], kb, j)),
                pl.BlockSpec((GPB, BNP // 128, 2, 128),
                             lambda i, j, kb, ir:
                             (ir[0] * (G // GPB) + kb, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((m, 2 * BNP), lambda i, j, kb, ir: (i, j)),
            scratch_shapes=[pltpu.VMEM((2, m, BNP), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x, wp, s_view)


def bench(name, mode, m):
    wp, s4 = make(jax.random.PRNGKey(0))
    np.asarray(wp[0, 0, :1])
    x0 = jnp.ones((m, K), jnp.bfloat16)

    def f(x, wp, s4):
        def step(i, x):
            def layer(xc, idx):
                xin = (jnp.clip(jnp.round(xc.astype(jnp.float32)), -127, 127)
                       .astype(jnp.int8) if mode == "noquant" else xc)
                y = matmul(xin, wp, s4, idx, mode=mode)
                y = y[:, : K // 4].astype(jnp.bfloat16)
                return jnp.tile(y, (1, 4)) * 1e-4 + xc, None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    jf = jax.jit(f)
    t0 = time.time()
    np.asarray(jf(x0, wp, s4))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jf(x0, wp, s4))
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer-call", flush=True)
    return t


if __name__ == "__main__":
    gb = L * K * NP / 1e9
    print(f"fc_out shape K={K} N={N}; weights {gb:.2f} GB "
          f"-> DMA roofline {gb/0.819/L*1e3:.1f} us/layer", flush=True)
    bench("full m=8", "full", 8)
    bench("noquant m=8", "noquant", 8)
    bench("onedot m=8", "onedot", 8)
    bench("nodot m=8", "nodot", 8)
    bench("bf16dot m=8", "bf16dot", 8)
    bench("full m=128", "full", 128)
