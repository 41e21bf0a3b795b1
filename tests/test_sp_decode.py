"""Sequence-sharded KV-cache decode (context-parallel serving) on the
8-device CPU mesh.

The reference holds the whole HF past_key_values on one GPU
(magma/sampling.py:87-90); `parallel/sp_decode.py` shards the cache's
position axis over the mesh's ``sp`` axis and combines per-shard partial
attention through two tiny collectives.  These tests pin (a) the
distributed softmax against the single-device oracle, (b) end-to-end
`generate_tokens(mesh=...)` token-identity, and (c) that the compiled
program never all-gathers the cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from magma_tpu.models import gptj
from magma_tpu.ops.attention import decode_attention
from magma_tpu.ops.sampling import generate_tokens
from magma_tpu.parallel.sp_decode import sp_decode_attention


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("sp",))


def _attn_case(b=2, max_len=64, h=2, hd=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, 1, h, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, max_len, h, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, max_len, h, hd), jnp.float32)
    k_self = jax.random.normal(ks[3], (b, 1, h, hd), jnp.float32)
    v_self = jax.random.normal(ks[4], (b, 1, h, hd), jnp.float32)
    return q, k, v, (k_self, v_self)


@pytest.mark.parametrize("cur_len", [17, "per_row"])
def test_sp_decode_attention_matches_oracle(cur_len):
    q, k, v, self_kv = _attn_case()
    cur = (jnp.array([13, 42], jnp.int32) if cur_len == "per_row"
           else jnp.int32(cur_len))
    ref = decode_attention(q, k, v, cur, scale=0.17, self_kv=self_kv)
    out = sp_decode_attention(
        q, k, v, cur, self_kv, _mesh(), "sp", scale=0.17)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_sp_decode_attention_int8_scales_match_oracle():
    q, k, v, self_kv = _attn_case(seed=7)
    b, max_len, h, _ = k.shape
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    k_sc = jax.random.uniform(ks[0], (b, h, max_len), jnp.float32, 0.5, 2.0)
    v_sc = jax.random.uniform(ks[1], (b, h, max_len), jnp.float32, 0.5, 2.0)
    k8 = jnp.clip(jnp.round(k * 20), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v * 20), -127, 127).astype(jnp.int8)
    cur = jnp.int32(33)
    ref = decode_attention(q, k8, v8, cur, scale=0.17, self_kv=self_kv,
                           kv_scales=(k_sc, v_sc))
    out = sp_decode_attention(q, k8, v8, cur, self_kv, _mesh(), "sp",
                              scale=0.17, kv_scales=(k_sc, v_sc))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


_TINY = dict(n_layers=2, n_heads=2, d_model=64, d_ff=128, rotary_dim=16,
             vocab_size=256, max_seq_len=128, remat=False,
             compute_dtype=jnp.float32, param_dtype=jnp.float32)


def _gen(cfg, params, emb, mesh=None, **kw):
    toks, steps = generate_tokens(
        cfg, params, emb, jax.random.PRNGKey(2), max_steps=12,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1, mesh=mesh, **kw)
    return np.asarray(toks), int(steps)


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_sp_generate_token_identical(kv_dtype):
    cfg_ref = gptj.GPTJConfig(attention_impl="xla",
                              kv_cache_dtype=kv_dtype, **_TINY)
    cfg_sp = gptj.GPTJConfig(attention_impl="ring",
                             kv_cache_dtype=kv_dtype, **_TINY)
    params = gptj.init_params(jax.random.PRNGKey(0), cfg_ref)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (2, 9, 64), jnp.float32) * 0.1
    ref, ref_steps = _gen(cfg_ref, params, emb)
    out, steps = _gen(cfg_sp, params, emb, mesh=_mesh())
    assert steps == ref_steps
    np.testing.assert_array_equal(out, ref)


def test_sp_generate_ragged_prompt_len_token_identical():
    cfg_ref = gptj.GPTJConfig(attention_impl="xla", **_TINY)
    cfg_sp = gptj.GPTJConfig(attention_impl="ring", **_TINY)
    params = gptj.init_params(jax.random.PRNGKey(0), cfg_ref)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (2, 9, 64), jnp.float32) * 0.1
    pl = jnp.array([9, 5], jnp.int32)
    ref, _ = _gen(cfg_ref, params, emb, prompt_len=pl)
    out, _ = _gen(cfg_sp, params, emb, mesh=_mesh(), prompt_len=pl)
    np.testing.assert_array_equal(out, ref)


def test_sp_generate_never_gathers_the_cache():
    """The point of the path: the compiled program must not move the
    cache — no all-gather anywhere (only the tiny pmax/psum combines,
    which lower to all-reduce)."""
    cfg = gptj.GPTJConfig(attention_impl="ring", **_TINY)
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 64), jnp.float32)
    mesh = _mesh()
    txt = jax.jit(lambda p, e: generate_tokens(
        cfg, p, e, jax.random.PRNGKey(2), max_steps=55, temperature=0.0,
        top_k=0, top_p=0.0, eos_token=-1, mesh=mesh,
    )).lower(params, emb).compile().as_text()
    assert "all-gather" not in txt
