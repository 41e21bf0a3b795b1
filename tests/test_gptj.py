"""GPT-J core tests: cache consistency, rotary, adapters, near-zero init."""

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.models import gptj
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.rotary import apply_rotary, rotary_sincos


def test_rotary_matches_naive():
    """Vectorized rotary == per-pair naive rotation."""
    b, s, h, hd, rd = 1, 4, 2, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, hd))
    pos = jnp.arange(s)
    sin, cos = rotary_sincos(pos, rd)
    out = apply_rotary(x, sin, cos, rd)

    ref = np.array(x, np.float64)
    half = rd // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(half) / half))
    for t in range(s):
        for i in range(half):
            angle = t * inv_freq[i]
            c, sn = np.cos(angle), np.sin(angle)
            x1 = np.array(x[0, t, :, 2 * i], np.float64)
            x2 = np.array(x[0, t, :, 2 * i + 1], np.float64)
            ref[0, t, :, 2 * i] = x1 * c - x2 * sn
            ref[0, t, :, 2 * i + 1] = x2 * c + x1 * sn
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # pass-through dims untouched
    np.testing.assert_allclose(
        np.asarray(out[..., rd:]), np.asarray(x[..., rd:]), atol=0
    )


def test_cache_decode_matches_full_forward(tiny_lm_config):
    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg.vocab_size)
    e = gptj.embed_tokens(cfg, params, ids)

    full, _ = gptj.forward(cfg, params, e)

    cache = gptj.init_kv_cache(cfg, 2, 16)
    _, cache = gptj.forward(cfg, params, e[:, :6], cache=cache,
                            cache_index=jnp.int32(0))
    outs = []
    for t in range(6, 10):
        lg, cache = gptj.forward(cfg, params, e[:, t:t + 1], cache=cache,
                                 cache_index=jnp.int32(t))
        outs.append(lg[:, 0])
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full[:, 6:10]), atol=2e-2
    )


def test_prefill_respects_kv_len_padding(tiny_lm_config):
    """Right-padding a prompt must not change logits at true positions."""
    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size)
    e = gptj.embed_tokens(cfg, params, ids)

    short, _ = gptj.forward(cfg, params, e)

    pad = jnp.zeros((1, 4, cfg.d_model), e.dtype)
    padded = jnp.concatenate([e, pad], axis=1)
    long, _ = gptj.forward(
        cfg, params, padded, kv_len=jnp.array([6], jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(long[:, :6]), np.asarray(short), atol=2e-2
    )


def test_adapters_near_zero_init_preserves_base_model():
    """Near-zero adapter init (clamped N(0,1e-3), adapters.py:28-36) must
    leave the LM's function essentially unperturbed at init."""
    base = gptj.GPTJConfig.tiny()
    with_ad = gptj.GPTJConfig.tiny(
        mlp_adapter=AdapterSpec("normal", 4),
        attn_adapter=AdapterSpec("scaled_parallel", 8),
    )
    p0 = gptj.init_params(jax.random.PRNGKey(0), base)
    p1 = gptj.init_params(jax.random.PRNGKey(0), with_ad)
    # non-adapter params identical (same key split order)
    for k in ("wte",):
        np.testing.assert_array_equal(np.asarray(p0[k]), np.asarray(p1[k]))

    e = jax.random.normal(jax.random.PRNGKey(2), (1, 8, base.d_model)) * 0.02
    l0, _ = gptj.forward(base, p0, e)
    l1, _ = gptj.forward(with_ad, p1, e)
    diff = float(jnp.max(jnp.abs(l0 - l1)))
    assert diff < 0.1, f"adapter init perturbs logits too much: {diff}"


def test_adapter_param_shapes():
    spec = AdapterSpec("scaled_parallel", downsample_factor=4, add_layernorm=True)
    cfg = gptj.GPTJConfig.tiny(attn_adapter=spec)
    p = gptj.init_params(jax.random.PRNGKey(0), cfg)
    ad = p["blocks"]["adapter_attn"]
    L, D = cfg.n_layers, cfg.d_model
    assert ad["down"]["kernel"].shape == (L, D, D // 4)
    assert ad["up"]["kernel"].shape == (L, D // 4, D)
    assert ad["scale"].shape == (L,)
    assert ad["ln"]["scale"].shape == (L, D)
    # clamped init
    assert float(jnp.max(jnp.abs(ad["down"]["kernel"]))) <= 2e-3 + 1e-9


def test_vocab_padding():
    cfg = gptj.GPTJConfig.tiny()
    assert cfg.padded_vocab_size % 128 == 0
    assert cfg.padded_vocab_size >= cfg.vocab_size
    mask = gptj.logits_mask(cfg)
    assert int(mask.sum()) == cfg.vocab_size


def test_chunked_prefill_matches_monolithic(tiny_lm_config):
    """Prefilling a prompt in chunks with read_history=True produces the
    same cache and the same next-token logits as one-shot prefill."""
    import numpy as np

    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    S, C = 24, 8  # prompt length, chunk size
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, S, cfg.d_model)) * 0.02

    mono = gptj.init_kv_cache(cfg, 1, 32)
    h_mono, mono = gptj.forward(cfg, params, emb, cache=mono,
                                cache_index=jnp.int32(0),
                                kv_len=jnp.full((1,), S, jnp.int32),
                                return_hidden=True)

    chunked = gptj.init_kv_cache(cfg, 1, 32)
    for off in range(0, S, C):
        h_chunk, chunked = gptj.forward(
            cfg, params, emb[:, off:off + C], cache=chunked,
            cache_index=jnp.int32(off),
            kv_len=jnp.full((1,), C, jnp.int32),
            return_hidden=True, read_history=True,
        )

    for name in mono:
        np.testing.assert_allclose(
            np.asarray(mono[name][:, :, :S], np.float32),
            np.asarray(chunked[name][:, :, :S], np.float32),
            atol=2e-2, rtol=0, err_msg=name,
        )
    # last hidden row drives the first sampled token: must agree closely
    np.testing.assert_allclose(
        np.asarray(h_mono[:, -1], np.float32),
        np.asarray(h_chunk[:, -1], np.float32), atol=3e-2, rtol=0,
    )

    # a decode step from either cache gives matching logits
    step = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.d_model)) * 0.02
    l1, _ = gptj.forward(cfg, params, step, cache=mono,
                         cache_index=jnp.int32(S))
    l2, _ = gptj.forward(cfg, params, step, cache=chunked,
                         cache_index=jnp.int32(S))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=5e-2, rtol=0)


def test_cached_decode_with_f32_compute_dtype():
    """compute_dtype != bfloat16 must still write the bf16 cache (new
    entries are cast at the single write point)."""
    cfg = gptj.GPTJConfig.tiny(compute_dtype=jnp.float32)
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.d_model)) * 0.02
    cache = gptj.init_kv_cache(cfg, 1, 8)
    _, cache = gptj.forward(cfg, params, emb, cache=cache,
                            cache_index=jnp.int32(0))
    assert cache["k"].dtype == jnp.bfloat16
    step = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.d_model)) * 0.02
    logits, cache = gptj.forward(cfg, params, step, cache=cache,
                                 cache_index=jnp.int32(4))
    assert logits.shape[1] == 1
