"""Microbench: int4 nibble-unpack variants for the stacked matmul kernel.

The profiler shows the int4 kernel at ~565 GB/s vs the int8 kernel's
~745 GB/s — the VPU unpack (int32 sign-extending shifts) throttles the
DMA stream.  Variants:

  v0  current: int8 -> int32, (x<<28)>>28 / (x<<24)>>28, -> bf16
  v1  int8-native shifts: (p<<4)>>4 and p>>4 on int8 lanes, -> bf16
  v2  unsigned AND + correction: lo = p & 15, hi = (p >> 4) & 15 as
      uint8->bf16, dot, then subtract 8 * rowsum(x) * scale (offset-8
      storage is simulated by biasing the test weights)

Each timed as (8, 4096) @ (4096, 28672) x 28 serial calls (one decode
step's in_proj stream) inside a jitted fori_loop.
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

L, K, N = 28, 4096, 28672
GROUP = 256
G = K // GROUP
BM, BKP, BN = 8, GROUP, int(os.environ.get("BN", "4096"))
STEPS = 28 * int(os.environ.get("REPS", "8"))

# generate ON-device: 1.6 GB host->device through the tunnel takes ~10 min
q4, s4, x = jax.jit(lambda k: (
    jax.random.randint(k, (L, K // 2, N), -128, 128, jnp.int32).astype(jnp.int8),
    jax.random.uniform(k, (L, G, N), jnp.float32) * 1e-2,
    jax.random.uniform(k, (BM, K), jnp.float32).astype(jnp.bfloat16),
))(jax.random.PRNGKey(0))
jax.block_until_ready(q4)


def kernel(idx_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref,
           acc_ref, *, n_k, variant):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if variant == 0:
        p32 = w_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
        hi = ((p32 << 24) >> 28).astype(jnp.bfloat16)
    elif variant == 1:
        # 3 int32 shifts instead of 4: sext(b) >> 4 IS the signed hi nibble
        p32 = w_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
    elif variant == 2:  # unsigned nibbles + dot-side correction
        p32 = w_ref[0].astype(jnp.int32)
        lo = (p32 & 0xF).astype(jnp.bfloat16)
        hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)
    elif variant == 3:
        # pre-scale both nibble planes by their group scales, concat along
        # K, ONE MXU dot per block (half the dot-issue count; scales move
        # off the accumulator onto the unpacked weights)
        p32 = w_ref[0].astype(jnp.int32)
        lo = ((p32 << 28) >> 28).astype(jnp.bfloat16) * slo_ref[0].astype(
            jnp.bfloat16
        )
        hi = (p32 >> 4).astype(jnp.bfloat16) * shi_ref[0].astype(
            jnp.bfloat16
        )
        wcat = jnp.concatenate([lo, hi], axis=0)
        xcat = jnp.concatenate(
            [xlo_ref[...], xhi_ref[...]], axis=1
        ).astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot(
            xcat, wcat, preferred_element_type=jnp.float32
        )
    if variant != 3:
        plo = jax.lax.dot(xlo_ref[...].astype(jnp.bfloat16), lo,
                          preferred_element_type=jnp.float32)
        phi = jax.lax.dot(xhi_ref[...].astype(jnp.bfloat16), hi,
                          preferred_element_type=jnp.float32)
        if variant == 2:
            sxlo = jnp.sum(xlo_ref[...].astype(jnp.float32), axis=1,
                           keepdims=True)
            sxhi = jnp.sum(xhi_ref[...].astype(jnp.float32), axis=1,
                           keepdims=True)
            plo = plo - 8.0 * sxlo
            phi = phi - 8.0 * sxhi
        acc_ref[...] += plo * slo_ref[0] + phi * shi_ref[0]

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def matmul(x2, q4, s4, layer_idx, variant):
    kp = K // 2
    n_k = kp // BKP
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(kernel, n_k=n_k, variant=variant),
        out_shape=jax.ShapeDtypeStruct((BM, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, N // BN, n_k),
            in_specs=[
                pl.BlockSpec((BM, BKP), lambda i, j, kb, idx_ref: (i, kb)),
                pl.BlockSpec((BM, BKP),
                             lambda i, j, kb, idx_ref: (i, n_k + kb)),
                pl.BlockSpec((1, BKP, BN),
                             lambda i, j, kb, idx_ref: (idx_ref[0], kb, j)),
                pl.BlockSpec((1, 1, BN),
                             lambda i, j, kb, idx_ref:
                                 (idx_ref[0] * G + kb, 0, j)),
                pl.BlockSpec((1, 1, BN),
                             lambda i, j, kb, idx_ref:
                                 (idx_ref[0] * G + G // 2 + kb, 0, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN),
                                   lambda i, j, kb, idx_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idx, x2, x2, q4, s4.reshape(L * G, 1, N), s4.reshape(L * G, 1, N))


def bench(variant):
    @jax.jit
    def run(x0, q4, s4):
        def step(i, xc):
            out = matmul(xc, q4, s4, i % L, variant)
            return xc + out[:, :K].astype(xc.dtype) * 1e-30
        return jax.lax.fori_loop(0, STEPS, step, x0)

    r = run(x, q4, s4)
    float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = run(x, q4, s4)
        float(jnp.asarray(r).astype(jnp.float32).ravel()[0])
        ts.append(time.time() - t0)
    t = sorted(ts)[1] / STEPS
    gbps = (K / 2 * N + 0) / t / 1e9
    print(f"v{variant} bn={BN}: {t*1e6:.1f} us/call  ({gbps:.0f} GB/s)",
          flush=True)


# correctness cross-check v0 vs v1 (must be bit-identical)
o0 = matmul(x, q4, s4, 3, 0)
o1 = matmul(x, q4, s4, 3, 1)
print("v1 == v0:", bool(jnp.all(o0 == o1)), flush=True)

o3 = matmul(x, q4, s4, 3, 3)
err = float(jnp.max(jnp.abs(o3 - o0)) / (jnp.max(jnp.abs(o0)) + 1e-9))
print(f"v3 rel err vs v0: {err:.2e}", flush=True)

for v in (0, 1, 3) if os.environ.get('ALLV') else (1,):
    bench(v)
