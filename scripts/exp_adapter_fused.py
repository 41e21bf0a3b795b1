"""Experiment: fused adapter-bottleneck kernel (round-3 decode push, #3).

The r3 post-dual-kernel profile (exp_profile_decode, BITS=4, ctx=256)
shows the mlp adapter costing ~450 us/tok as XLA bf16 ops:

    fusion bf16[1024] x28/step  347 us/tok   (down matmul, 4096x1024 bf16)
    fusion bf16[16,256] x28     105 us/tok   (up matmul)

i.e. ~16 us/layer streaming 16.8 MB of bf16 adapter weights.  This
benches a SINGLE dual-phase Pallas launch per layer:

  phase 1 (k-blocks over D):    h += x_kb @ Wd_kb      (int8, scaled)
  boundary:                     h = relu(h * sd + bd)
  phase 2 (k-blocks over Dh):   o += h_kb @ Wu_kb      (int8, scaled)

int8 weights halve the stream to 8.4 MB (~10.5 us/layer) and one launch
replaces the 2-fusion + bias/relu chain.  Variants: int8 and bf16 (same
fusion, no quantization) to separate launch-count wins from byte wins.

Run: python scripts/exp_adapter_fused.py
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
D = 4096
DH = 1024          # D // downsample_factor(4)
BK = 512           # contraction block


def fused_adapter_kernel(idx_ref, x_ref, wd_ref, wu_ref, sd_ref, su_ref,
                         bd_ref, bu_ref, o_ref, h_ref, acc_ref, *, nkd, n_k):
    """One launch: down (k-blocks [0,nkd)), relu boundary, up ([nkd,n_k))."""
    kb = pl.program_id(0)

    @pl.when(kb == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kb < nkd)
    def _down():
        w = wd_ref[0].astype(jnp.bfloat16)
        h_ref[...] += jax.lax.dot(x_ref[...].astype(jnp.bfloat16), w,
                                  preferred_element_type=jnp.float32)

    @pl.when(kb >= nkd)
    def _up():
        @pl.when(kb == nkd)
        def _relu():
            h_ref[...] = jax.nn.relu(
                h_ref[...] * sd_ref[0] + bd_ref[0].astype(jnp.float32))

        j = kb - nkd
        w = wu_ref[0].astype(jnp.bfloat16)
        hs = h_ref[:, pl.dslice(j * BK, BK)].astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot(hs, w,
                                    preferred_element_type=jnp.float32)

    @pl.when(kb == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * su_ref[0]
                      + bu_ref[0].astype(jnp.float32))


def fused_adapter(x, wd, wu, sd, su, bd, bu, idx):
    """x (B, D) -> up(relu(down(x)*sd+bd))*su+bu, one launch.  Weights are
    stacked (L, ., .) int8 with f32 per-channel scales."""
    m = x.shape[0]
    nkd = D // BK
    n_k = nkd + DH // BK
    idxa = jnp.asarray(idx, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(fused_adapter_kernel, nkd=nkd, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_k,),
            in_specs=[
                pl.BlockSpec((m, BK),
                             lambda kb, ir: (0, jnp.where(kb < nkd, kb, 0))),
                pl.BlockSpec((1, BK, DH),
                             lambda kb, ir:
                             (ir[0], jnp.where(kb < nkd, kb, 0), 0)),
                pl.BlockSpec((1, BK, D),
                             lambda kb, ir:
                             (ir[0], jnp.where(kb >= nkd, kb - nkd, 0), 0)),
                pl.BlockSpec((1, 1, DH), lambda kb, ir: (ir[0], 0, 0)),
                pl.BlockSpec((1, 1, D), lambda kb, ir: (ir[0], 0, 0)),
                pl.BlockSpec((1, 1, DH), lambda kb, ir: (ir[0], 0, 0)),
                pl.BlockSpec((1, 1, D), lambda kb, ir: (ir[0], 0, 0)),
            ],
            out_specs=pl.BlockSpec((m, D), lambda kb, ir: (0, 0)),
            scratch_shapes=[pltpu.VMEM((m, DH), jnp.float32),
                            pltpu.VMEM((m, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(idxa, x, wd, wu, sd, su, bd, bu)


def make():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    wd8 = jax.random.randint(ks[0], (L, D, DH), -128, 128, jnp.int8)
    wu8 = jax.random.randint(ks[1], (L, DH, D), -128, 128, jnp.int8)
    sd = jax.random.uniform(ks[2], (L, 1, DH), jnp.float32, 1e-4, 2e-4)
    su = jax.random.uniform(ks[3], (L, 1, D), jnp.float32, 1e-4, 2e-4)
    bd = jax.random.normal(ks[4], (L, 1, DH), jnp.float32) * 1e-3
    bu = jax.random.normal(ks[5], (L, 1, D), jnp.float32) * 1e-3
    return wd8, wu8, sd, su, bd, bu


def bench(name, fn, args, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    np.asarray(f(*args))
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(*args))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2] / STEPS / L * 1e6
    print(f"  [{name}] {t:.1f} us/layer-call", flush=True)


if __name__ == "__main__":
    wd8, wu8, sd, su, bd, bu = make()
    x = jax.random.normal(jax.random.PRNGKey(9), (B, D), jnp.bfloat16)

    # correctness vs dequant reference
    li = 3
    ref_h = jax.nn.relu(
        x.astype(jnp.float32) @ (wd8[li].astype(jnp.float32) * sd[li])
        + bd[li])
    # the kernel (like the production bf16 XLA path) feeds the up matmul a
    # bf16 hidden state; mirror that rounding in the oracle
    ref_h = ref_h.astype(jnp.bfloat16).astype(jnp.float32)
    ref = ref_h @ (wu8[li].astype(jnp.float32) * su[li]) + bu[li]
    got = fused_adapter(x, wd8, wu8, sd, su, bd, bu, li)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"correctness: rel {err:.2e}", flush=True)
    # bf16-dot-level agreement: both the kernel and the production XLA
    # path run the bottleneck dots in bf16 (and jnp's f32 dots on TPU run
    # at bf16 precision by default), so ~3e-3 relative is the compute
    # dtype's own rounding, not a kernel bug
    assert err < 1e-2, err

    # serial chains
    def chain_fused(x, wd8, wu8, sd, su, bd, bu):
        def step(i, x):
            def layer(xc, idx):
                y = fused_adapter(xc, wd8, wu8, sd, su, bd, bu, idx)
                return xc + y.astype(jnp.bfloat16) * 1e-3, None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    # current production shape: bf16 weights, XLA dots
    wdb = (wd8.astype(jnp.float32) * sd).astype(jnp.bfloat16)
    wub = (wu8.astype(jnp.float32) * su).astype(jnp.bfloat16)
    bdb, bub = bd.astype(jnp.bfloat16), bu.astype(jnp.bfloat16)

    def chain_xla(x, wdb, wub, bdb, bub):
        def step(i, x):
            def layer(xc, idx):
                wd_l = jnp.take(wdb, idx, axis=0)
                wu_l = jnp.take(wub, idx, axis=0)
                h = jax.nn.relu(xc @ wd_l + jnp.take(bdb, idx, axis=0))
                y = h @ wu_l + jnp.take(bub, idx, axis=0)
                return xc + y * 1e-3, None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)

    bench("xla bf16 (prod-like)", chain_xla, (x, wdb, wub, bdb, bub))
    bench("fused int8 1-launch", chain_fused, (x, wd8, wu8, sd, su, bd, bu))
