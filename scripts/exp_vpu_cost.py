"""Per-byte VPU/MXU cost vs pure DMA: what does each kernel body pattern
cost per streamed weight block?

exp_dma_streams.py's "floor" used a full-block int8->int32 convert +
reduce — itself bytes-proportional VPU work, so it measured VPU, not
DMA.  Variants on the fc_out int4 payload shape (L, 16384, 2048) int8:

  touch8        sum 8 rows of the block only  (true DMA floor)
  fullsum       convert+reduce whole block    (the flawed floor)
  convert_dot   int8->bf16 whole block + one bf16 dot   (prod int8 body)
  mask2dot      0xF0 mask + two int8 dots     (colpack int4 body, no AQ)
  mask2dot_aq   ... plus per-group activation quantization (full body)

Run: python scripts/exp_vpu_cost.py
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
import os as _os
K, N = (65536, 2048) if _os.environ.get("BIG") else (16384, 2048)
BYTES = K * N
GROUP = 256


def body(mode, x_ref, w_ref, acc_ref, gpb):
    if mode == "touch8":
        s = jnp.sum(w_ref[0, :8, :].astype(jnp.int32), axis=0)
        acc_ref[...] += jnp.sum(
            s.reshape(-1, 128), axis=0).astype(jnp.float32)[None, :128]
        return
    if mode == "fullsum":
        s = jnp.sum(w_ref[0].astype(jnp.int32), axis=0)
        acc_ref[...] += jnp.sum(
            s.reshape(-1, 128), axis=0).astype(jnp.float32)[None, :128]
        return
    if mode == "convert_dot":
        w = w_ref[0].astype(jnp.bfloat16)
        p = jax.lax.dot(x_ref[...].astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
        acc_ref[...] += p[:, :128]
        return
    for g in range(gpb):
        b = w_ref[0, g * GROUP:(g + 1) * GROUP]
        if mode == "mask2dot":
            xq = jnp.ones((8, GROUP), jnp.int8)
            sx = jnp.float32(1.0)
            rs = jnp.full((8, 1), GROUP, jnp.int32)
        else:
            xf = x_ref[:, g * GROUP:(g + 1) * GROUP].astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            sx = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.round(xf / sx).astype(jnp.int8)
            rs = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        bhi = b & jnp.int8(-16)
        p1 = jax.lax.dot(xq, b, preferred_element_type=jnp.int32)
        p2 = jax.lax.dot(xq, bhi, preferred_element_type=jnp.int32)
        lo = (p1 - p2 - 8 * rs).astype(jnp.float32) * sx
        hi = p2.astype(jnp.float32) * (sx * 0.0625)
        acc_ref[...] += (lo + hi)[:, :128]


def run(w, layer_idx, *, bk, mode):
    Ln, Kk, Nn = w.shape
    n_k = Kk // bk
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    def kern(idx_ref, x_ref, w_ref, o_ref, acc_ref):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        body(mode, x_ref, w_ref, acc_ref, bk // GROUP)

        @pl.when(kb == n_k - 1)
        def _store():
            o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n_k),
            in_specs=[
                pl.BlockSpec((8, bk), lambda i, kb, ir: (0, kb)),
                pl.BlockSpec((1, bk, Nn), lambda i, kb, ir: (ir[0], kb, 0)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, kb, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, jnp.ones((8, Kk), jnp.bfloat16), w)


def bench(name, fn, *args):
    def f(*a):
        def step(i, acc):
            def layer(c, idx):
                return c + jnp.sum(fn(*a, idx)), None
            c, _ = jax.lax.scan(layer, acc, jnp.arange(L))
            return c
        return jax.lax.fori_loop(0, STEPS, step, jnp.float32(0))
    jf = jax.jit(f)
    np.asarray(jf(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jf(*args))
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer  ->  {BYTES/t/1e3:.0f} GB/s",
          flush=True)
    return t


if __name__ == "__main__":
    print(f"payload {BYTES/1e6:.1f} MB/layer; roofline @819GB/s = "
          f"{BYTES/819e3:.1f} us", flush=True)
    w = jax.random.randint(jax.random.PRNGKey(0), (L, K, N),
                           -128, 128, jnp.int8)
    np.asarray(w[0, 0, :1])
    for mode in ("touch8", "fullsum", "convert_dot", "mask2dot",
                 "mask2dot_aq"):
        for bk in (1024, 2048):
            bench(f"{mode} bk={bk}", lambda w, i, bk=bk, mode=mode: jnp.sum(
                run(w, i, bk=bk, mode=mode)), w)
