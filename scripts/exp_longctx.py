"""Experiment: where does long-context decode time go? (VERDICT item 5)

The tunneled TPU has ~50ms host round-trip latency, so each variant runs
STEPS iterations inside ONE jitted fori_loop and we divide by STEPS.
Run on the real TPU: python scripts/exp_longctx.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

CTX = int(os.environ.get("CTX", "2048"))   # cache max_len
CUR = CTX - 64                              # valid positions
L, B, H, HD = 28, int(os.environ.get("B", "1")), 16, 256
STEPS = 64


def bench(make_loop, *args, reps=3):
    fn = jax.jit(make_loop)
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2] / STEPS


def main():
    from magma_tpu.ops.attention import decode_attention
    from magma_tpu.ops.decode_kernel import decode_attention_stacked

    k_cache = jnp.zeros((L, B, CTX, H, HD), jnp.bfloat16)
    v_cache = jnp.zeros((L, B, CTX, H, HD), jnp.bfloat16)
    q0 = jnp.ones((B, 1, H, HD), jnp.bfloat16)
    kv_new = (jnp.ones((B, 1, H, HD), jnp.bfloat16),
              jnp.ones((B, 1, H, HD), jnp.bfloat16))
    cache_gb = 2 * L * B * CTX * H * HD * 2 / 1e9
    print(f"ctx={CTX} b={B} cache={cache_gb:.2f} GB", flush=True)

    def attn_loop(layer_body):
        """STEPS outer iterations; each runs the 28-layer attention stack."""
        def run(q, kc, vc):
            def outer(i, q):
                return layer_body(q, kc, vc)
            return jax.lax.fori_loop(0, STEPS, outer, q)
        return run

    # --- (a) scan + XLA dynamic-slice (current default)
    def xla_layers(q, kc, vc):
        def body(carry, idx):
            k_l = jax.lax.dynamic_index_in_dim(kc, idx, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(vc, idx, 0, keepdims=False)
            o = decode_attention(carry, k_l, v_l, jnp.int32(CUR),
                                 scale=1 / 16.0, self_kv=kv_new)
            return o.astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, jnp.arange(L))
        return out

    t = bench(attn_loop(xla_layers), q0, k_cache, v_cache)
    print(f"[scan+xla dyn-slice]  {t*1e3:.2f} ms/tok  "
          f"({cache_gb/t:.0f} GB/s effective)", flush=True)

    # --- (b) scan + Pallas stacked kernel
    def pallas_layers(q, kc, vc):
        def body(carry, idx):
            o = decode_attention_stacked(carry, kc, vc, idx, jnp.int32(CUR),
                                         kv_new, scale=1 / 16.0)
            return o.astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, jnp.arange(L))
        return out

    t = bench(attn_loop(pallas_layers), q0, k_cache, v_cache)
    print(f"[scan+pallas stacked] {t*1e3:.2f} ms/tok  "
          f"({cache_gb/t:.0f} GB/s effective)", flush=True)

    # --- (c) unrolled python loop, static per-layer slice
    def unrolled_layers(q, kc, vc):
        out = q
        for i in range(L):
            o = decode_attention(out, kc[i], vc[i], jnp.int32(CUR),
                                 scale=1 / 16.0, self_kv=kv_new)
            out = o.astype(q.dtype)
        return out

    t = bench(attn_loop(unrolled_layers), q0, k_cache, v_cache)
    print(f"[unrolled static]     {t*1e3:.2f} ms/tok  "
          f"({cache_gb/t:.0f} GB/s effective)", flush=True)

    # --- (d) cache write cost: STEPS deferred bulk writes in one loop
    k_new = jnp.ones((L, B, 1, H, HD), jnp.bfloat16)
    v_new = jnp.ones((L, B, 1, H, HD), jnp.bfloat16)

    def write_loop(kc, vc):
        def body(i, carry):
            kc, vc = carry
            kc = jax.lax.dynamic_update_slice(kc, k_new, (0, 0, i, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v_new, (0, 0, i, 0, 0))
            return kc, vc
        return jax.lax.fori_loop(0, STEPS, body, (kc, vc))

    t = bench(write_loop, k_cache, v_cache)
    print(f"[cache write x{STEPS}]    {t*1e3:.2f} ms/tok", flush=True)


if __name__ == "__main__":
    main()
