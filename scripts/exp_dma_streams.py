"""Does splitting the weight stream across multiple Pallas operands
(= multiple concurrent DMAs per grid step) raise aggregate bandwidth?

exp_dma_floor.py measured a flat ~505-517 GB/s single-operand DMA floor
(dtype- and geometry-independent) on this v5e chip, while the production
bf16 decode path sustains ~640 GB/s implied — so the chip can do better
than one operand stream.  This passes the SAME int8 array 1/2/4 times
with disjoint block index maps, so each grid step issues 1/2/4
concurrent block DMAs.

Also calibrates the chain tax: the production int8 stacked kernel on the
in_proj shape, measured the same way, with its implied GB/s.

Run: python scripts/exp_dma_streams.py
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
K, N = 16384, 2048          # int8 payload, 33.5 MB/layer
BYTES = K * N


def kernel(idx_ref, *refs, n_k, ns):
    w_refs, o_ref, acc_ref = refs[:ns], refs[ns], refs[ns + 1]
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    v = jnp.zeros((128,), jnp.float32)
    for r in w_refs:
        s = jnp.sum(r[0].astype(jnp.int32), axis=0)
        v += jnp.sum(s.reshape(-1, 128), axis=0).astype(jnp.float32)
    acc_ref[...] += v[None, :]

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def stream(w, layer_idx, *, bk, ns):
    Ln, Kk, Nn = w.shape
    n_k = Kk // (bk * ns)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    in_specs = [
        pl.BlockSpec((1, bk, Nn),
                     (lambda s: lambda i, kb, ir: (ir[0], kb * ns + s, 0))(s))
        for s in range(ns)
    ]
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k, ns=ns),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), lambda i, kb, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, *([w] * ns))


def bench(name, fn, *args, per_layer_bytes=BYTES):
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
    print(f"  [{name}] {t:.1f} us/layer  ->  {per_layer_bytes/t/1e3:.0f} GB/s",
          flush=True)
    return t


if __name__ == "__main__":
    print(f"payload {BYTES/1e6:.1f} MB/layer; roofline @819GB/s = "
          f"{BYTES/819e3:.1f} us", flush=True)
    w = jax.random.randint(jax.random.PRNGKey(0), (L, K, N),
                           -128, 128, jnp.int8)
    np.asarray(w[0, 0, :1])

    for ns, bk in ((1, 1024), (2, 512), (2, 1024), (4, 512), (4, 256)):
        bench(f"ns={ns} bk={bk}", lambda w, i, bk=bk, ns=ns: jnp.sum(
            stream(w, i, bk=bk, ns=ns)), w)

    # chain-tax calibration: the production int8 stacked kernel, in_proj
    # shape (4096 x 28672 int8 = 117 MB/layer)
    from magma_tpu.ops.quant import int8_matmul_stacked
    wq = jax.random.randint(jax.random.PRNGKey(1), (L, 4096, 28672),
                            -128, 128, jnp.int8)
    sq = jnp.ones((L, 28672), jnp.float32)
    np.asarray(wq[0, 0, :1])
    x0 = jnp.ones((8, 4096), jnp.bfloat16)

    def prod(x, idx, wq, sq):
        y = int8_matmul_stacked(x, wq, sq, idx, out_dtype=jnp.bfloat16)
        return y[:, :4096] * 1e-4 + x

    def fchain(x, wq, sq):
        def step(i, x):
            def layer(xc, idx):
                return prod(xc, idx, wq, sq), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)
    jf = jax.jit(fchain)
    np.asarray(jf(x0, wq, sq))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(jf(x0, wq, sq))
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / STEPS / L * 1e6
    print(f"  [prod int8 in_proj] {t:.1f} us/layer -> "
          f"{4096*28672/t/1e3:.0f} GB/s", flush=True)
