"""Isolate Pallas weight-stream DMA bandwidth per block geometry.

exp_int4_anatomy.py showed the int4 panel kernel's DMA FLOOR (no dots,
no scales math) is 78.8 us/layer on the fc_out shape = 426 GB/s — while
the int8 production decode path sustains >=616 GB/s end to end.  This
measures exactly what the DMA engine achieves for different block
shapes/strides on the same 0.94 GB int8 weight array, plus the cost of
the 4D scales block (64 x 1KB segments per step in the panel kernel).

Run: python scripts/exp_dma_floor.py
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
KB_TOT = 16384 * 2048  # bytes per layer (fc_out int4 payload size)


def stream_kernel(idx_ref, w_ref, o_ref, acc_ref, *, n_k):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    sums = jnp.sum(w_ref[0].astype(jnp.int32), axis=0)
    v = jnp.sum(sums.reshape(-1, 128), axis=0).astype(jnp.float32)
    acc_ref[...] += v[None, :]

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def stream(w, layer_idx, *, bk, bn):
    Ln, K, N = w.shape
    n_k = (K // bk) * (N // bn)
    nj = N // bn
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(stream_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n_k),
            in_specs=[
                pl.BlockSpec((1, bk, bn),
                             lambda i, kb, ir: (ir[0], kb // nj, kb % nj)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, kb, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, w)


def stream_with_scales(w, s, layer_idx, *, bk, bn, layout):
    """Weight stream plus a scales operand in one of two layouts:
    'flat'  — (L*G, 1, N) contiguous (1,1,bn) blocks (colpack style)
    'panel' — (L*G, N//256, 2, 128) 4D blocks (GPB, bn//128, 2, 128)"""
    Ln, K, N = w.shape
    N = s.shape[-1]
    G = K // 256
    gpb = bk // 256
    n_k = K // bk
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    if layout == "flat":
        s_in = s.reshape(Ln * G, 1, N)
        s_spec = pl.BlockSpec((gpb, 1, bn),
                              lambda i, kb, ir: (ir[0] * (G // gpb) + kb, 0, 0))
    else:
        s_in = s.reshape(Ln * G, N // 256, 2, 128)
        s_spec = pl.BlockSpec((gpb, bn // 256, 2, 128),
                              lambda i, kb, ir:
                              (ir[0] * (G // gpb) + kb, 0, 0, 0))

    def kern(idx_ref, w_ref, s_ref, o_ref, acc_ref):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        sums = jnp.sum(w_ref[0].astype(jnp.int32), axis=0)
        v = jnp.sum(sums.reshape(-1, 128), axis=0).astype(jnp.float32)
        acc_ref[...] += v[None, :] + jnp.sum(s_ref[...])

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
                pl.BlockSpec((1, bk, bn), lambda i, kb, ir: (ir[0], kb, 0)),
                s_spec,
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, kb, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, w, s_in)


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
    bw = KB_TOT / t / 1e3
    print(f"  [{name}] {t:.1f} us/layer  ->  {bw:.0f} GB/s", flush=True)
    return t


if __name__ == "__main__":
    print(f"payload {KB_TOT/1e6:.0f} MB/layer; roofline @819GB/s = "
          f"{KB_TOT/819e3:.1f} us", flush=True)

    # XLA reduction over the same array: achievable-BW sanity baseline
    w = jax.random.randint(jax.random.PRNGKey(0), (L, 16384, 2048),
                           -128, 128, jnp.int8)
    np.asarray(w[0, 0, :1])
    jr = jax.jit(lambda w: jnp.sum(jnp.abs(w.astype(jnp.int32))))
    np.asarray(jr(w))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jr(w))
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / L * 1e6
    print(f"  [xla sum whole array] {t:.1f} us/layer -> "
          f"{KB_TOT/t/1e3:.0f} GB/s", flush=True)

    for bk, bn in ((1024, 2048), (512, 2048), (2048, 2048), (4096, 2048)):
        bench(f"contig bk={bk}", lambda w, i, bk=bk, bn=bn: jnp.sum(
            stream(w, i, bk=bk, bn=bn)), w)

    # strided like the int8 production kernel: (512, 4096) of (4096, 8192)
    w2 = w.reshape(L, 4096, 8192)
    for bk, bn in ((512, 4096), (512, 8192), (1024, 8192)):
        bench(f"view4096 bk={bk} bn={bn}", lambda w2, i, bk=bk, bn=bn: jnp.sum(
            stream(w2, i, bk=bk, bn=bn)), w2)

    # dtype variants: same BYTES per layer, different element type
    wb = jax.random.normal(jax.random.PRNGKey(2), (L, 8192, 2048), jnp.bfloat16)
    np.asarray(wb[0, 0, :1])
    bench("bf16 bk=1024", lambda wb, i: jnp.sum(
        stream(wb, i, bk=1024, bn=2048)), wb)
    w32 = jax.random.randint(jax.random.PRNGKey(3), (L, 4096, 2048),
                             -2**30, 2**30, jnp.int32)
    np.asarray(w32[0, 0, :1])
    bench("int32 bk=512", lambda w32, i: jnp.sum(
        stream(w32, i, bk=512, bn=2048)), w32)
    bench("int32 bk=1024", lambda w32, i: jnp.sum(
        stream(w32, i, bk=1024, bn=2048)), w32)

    s = jax.random.uniform(jax.random.PRNGKey(1), (L, 64, 4096), jnp.float32)
    bench("w+scales flat", lambda w, s, i: jnp.sum(
        stream_with_scales(w, s, i, bk=1024, bn=2048, layout="flat")), w, s)
    bench("w+scales panel4d", lambda w, s, i: jnp.sum(
        stream_with_scales(w, s, i, bk=1024, bn=2048, layout="panel")), w, s)
