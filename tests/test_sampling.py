"""Sampling tests: filters (reference semantics), greedy decode, EOS stop."""

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.models import gptj
from magma_tpu.ops.sampling import (
    generate_tokens,
    sample_token,
    strip_after_eos,
    top_k_filter,
    top_p_filter,
)


def test_top_k_keeps_k_largest():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 2]) and np.isinf(out[0, 3])


def test_top_p_reference_semantics():
    """Replicates the reference filter (sampling.py:7-19): with the
    shifted cumulative rule, rank 0 is always kept and ranks are removed
    while the cumulative probability is below (1 - threshold)."""
    logits = jnp.log(jnp.array([[0.4, 0.3, 0.2, 0.1]]))
    # threshold 0.9 -> remove while cum < 0.1 (nothing: cum after rank0 = 0.4)
    out = np.asarray(top_p_filter(logits, 0.9, mode="reference"))
    assert not np.isinf(out).any()
    # threshold 0.3 -> remove ranks with shifted cum < 0.7: ranks 1 (cum .4)
    # and 2 (cum .7 is not < .7) -> only rank 1 removed
    out = np.asarray(top_p_filter(logits, 0.3, mode="reference"))
    assert np.isinf(out[0, 1])
    assert not np.isinf(out[0, 0]) and not np.isinf(out[0, 2])


def test_top_p_standard_semantics():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(top_p_filter(logits, 0.7, mode="standard"))
    # keep ranks until cum > 0.7 (shifted): ranks 0, 1 kept; 2, 3 removed
    assert not np.isinf(out[0, 0]) and not np.isinf(out[0, 1])
    assert np.isinf(out[0, 2]) and np.isinf(out[0, 3])


def test_temperature_zero_is_argmax():
    logits = jnp.array([[0.1, 0.9, 0.2], [0.7, 0.1, 0.2]])
    tok = sample_token(
        jax.random.PRNGKey(0), logits, temperature=0.0, top_k=0, top_p=0.0,
        vocab_size=3,
    )
    assert list(np.asarray(tok)) == [1, 0]


def test_padded_vocab_never_sampled():
    logits = jnp.zeros((4, 8))  # uniform over 8 columns, true vocab = 5
    for t in (0.0, 1.0):
        toks = sample_token(
            jax.random.PRNGKey(0), logits, temperature=t, top_k=0, top_p=0.9,
            vocab_size=5,
        )
        assert np.asarray(toks).max() < 5


def test_generate_greedy_deterministic(tiny_lm_config):
    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.d_model)) * 0.02
    t1, _ = generate_tokens(cfg, params, emb, jax.random.PRNGKey(2),
                            max_steps=8, temperature=0.0, top_k=0, top_p=0.0)
    t2, _ = generate_tokens(cfg, params, emb, jax.random.PRNGKey(3),
                            max_steps=8, temperature=0.0, top_k=0, top_p=0.0)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_generate_early_eos_stop(tiny_lm_config):
    """A model that deterministically emits EOS must stop after step 1."""
    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    eos = 50256
    # zero the blocks (identity residual path) and give the prompt token and
    # EOS the same embedding f: the final hidden state is LN(f), whose dot
    # with f is the (positive) variance of f -> logits peak at EOS exactly.
    params = dict(params)
    params["blocks"] = jax.tree_util.tree_map(jnp.zeros_like, params["blocks"])
    f = jax.random.normal(jax.random.PRNGKey(9), (cfg.d_model,))
    # EOS gets 2f: LayerNorm is scale-invariant so the hidden state stays
    # LN(f) either way, but the EOS logit (2 * LN(f)@f) dominates token 7's.
    wte = jnp.zeros_like(params["wte"])
    params["wte"] = wte.at[7].set(f).at[eos].set(2 * f)
    emb = gptj.embed_tokens(cfg, params, jnp.full((1, 4), 7, jnp.int32))
    toks, steps = generate_tokens(cfg, params, emb, jax.random.PRNGKey(1),
                                  max_steps=10, temperature=0.0, top_k=0,
                                  top_p=0.0)
    assert int(steps) == 1
    assert int(toks[0, 0]) == eos
    assert (np.asarray(toks[0, 1:]) == eos).all()


def test_strip_after_eos():
    row = [5, 50257, 7, 50256, 9, 11]
    assert strip_after_eos(row, 50256, 50257) == [5, 7]


def test_ragged_batched_decode_matches_individual():
    """Per-row prompt_len: a batch of right-padded prompts of different
    lengths must decode exactly like one-at-a-time generation."""
    import numpy as np

    cfg = gptj.GPTJConfig.tiny(d_model=128, n_heads=4, d_ff=512)
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(7)
    emb = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 128)) * 0.3
    lens = [5, 12, 9]

    toks_b, _ = generate_tokens(
        cfg, params, emb, rng, max_steps=6, temperature=0.0, top_k=0,
        top_p=0.0, eos_token=-1, prompt_len=jnp.asarray(lens, jnp.int32),
    )
    for i, L in enumerate(lens):
        t, _ = generate_tokens(
            cfg, params, emb[i:i + 1, :L], rng, max_steps=6,
            temperature=0.0, top_k=0, top_p=0.0, eos_token=-1,
        )
        assert np.array_equal(np.asarray(t[0]), np.asarray(toks_b[i]))


def test_generate_int8_kv_cache_matches_bf16(tiny_lm_config):
    """Greedy decode with the int8 KV cache tracks the bf16-cache decode.

    Per-(position, head) int8 quantization perturbs scores by <1%; on a
    deterministic greedy path over a random tiny model the emitted tokens
    should be identical for the first steps and the forward numerics for
    the whole run close."""
    import dataclasses

    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.d_model)) * 0.02
    t_bf16, _ = generate_tokens(cfg, params, emb, jax.random.PRNGKey(2),
                                max_steps=8, temperature=0.0, top_k=0,
                                top_p=0.0, eos_token=-1)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    t_int8, _ = generate_tokens(cfg8, params, emb, jax.random.PRNGKey(2),
                                max_steps=8, temperature=0.0, top_k=0,
                                top_p=0.0, eos_token=-1)
    # random-init logits are near-uniform (argmax ties flip easily); require
    # agreement on the early steps where quantization noise is the only delta
    match = (np.asarray(t_bf16) == np.asarray(t_int8)).mean()
    assert match >= 0.5, f"int8-cache decode diverged: agreement {match}"


def test_int8_cache_write_then_read_roundtrip(tiny_lm_config):
    """Prefill writes quantized entries; a decode step must read them back
    dequantized (forward numerics close to the bf16 cache)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_lm_config, kv_cache_dtype="int8")
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.d_model)) * 0.02

    cache8 = gptj.init_kv_cache(cfg, 1, 8)
    logits8, cache8 = gptj.forward(cfg, params, emb, cache=cache8,
                                   cache_index=jnp.int32(0))
    cache16 = gptj.init_kv_cache(tiny_lm_config, 1, 8)
    logits16, cache16 = gptj.forward(tiny_lm_config, params, emb,
                                     cache=cache16, cache_index=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits8), np.asarray(logits16),
                               atol=1e-3, rtol=0)

    step = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.d_model)) * 0.02
    l8, _ = gptj.forward(cfg, params, step, cache=cache8,
                         cache_index=jnp.int32(6))
    l16, _ = gptj.forward(tiny_lm_config, params, step, cache=cache16,
                          cache_index=jnp.int32(6))
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l16),
                               atol=0.05, rtol=0)


def test_generate_tokens_split_identical(tiny_lm_config):
    """The split prefill/decode-window path must reproduce the monolithic
    while-loop generate token-for-token: greedy AND sampled (same rng
    stream), with per-row ragged prompts and early-EOS rows."""
    from magma_tpu.ops.sampling import generate_tokens_split

    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = (
        jax.random.normal(jax.random.PRNGKey(1), (3, 12, cfg.d_model)) * 0.02
    )
    prompt_len = jnp.array([12, 7, 9], jnp.int32)
    for kwargs in (
        dict(temperature=0.0, top_k=0, top_p=0.0),
        dict(temperature=0.8, top_k=50, top_p=0.9),
    ):
        ref, ref_steps = generate_tokens(
            cfg, params, emb, jax.random.PRNGKey(7), max_steps=11,
            eos_token=-1, prompt_len=prompt_len, **kwargs,
        )
        out, _ = generate_tokens_split(
            cfg, params, emb, jax.random.PRNGKey(7), max_steps=11,
            eos_token=-1, prompt_len=prompt_len, window=4, **kwargs,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert int(ref_steps) == 11

    # early exit: pick an eos that the greedy path actually emits
    first, _ = generate_tokens(
        cfg, params, emb, jax.random.PRNGKey(7), max_steps=6,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1,
    )
    eos = int(np.asarray(first)[0, 2])  # token row 0 emits at step 2
    ref, _ = generate_tokens(
        cfg, params, emb, jax.random.PRNGKey(7), max_steps=10,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=eos,
    )
    out, _ = generate_tokens_split(
        cfg, params, emb, jax.random.PRNGKey(7), max_steps=10,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=eos, window=3,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_generate_tokens_split_chunked_prefill_identical(tiny_lm_config):
    """Chunked split prefill (history attention, per-row ragged lengths,
    padded final chunk) must still be token-identical to the monolithic
    while-loop generate."""
    from magma_tpu.ops.sampling import generate_tokens_split

    cfg = tiny_lm_config
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    emb = (
        jax.random.normal(jax.random.PRNGKey(4), (3, 21, cfg.d_model)) * 0.02
    )
    prompt_len = jnp.array([21, 9, 14], jnp.int32)
    ref, _ = generate_tokens(
        cfg, params, emb, jax.random.PRNGKey(7), max_steps=9,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1,
        prompt_len=prompt_len,
    )
    out, _ = generate_tokens_split(
        cfg, params, emb, jax.random.PRNGKey(7), max_steps=9,
        temperature=0.0, top_k=0, top_p=0.0, eos_token=-1,
        prompt_len=prompt_len, window=4, prefill_chunk=8,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batched_sampler_greedy_rows_are_argmax():
    from magma_tpu.ops.sampling import sample_token_batched

    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    tok = sample_token_batched(
        jax.random.PRNGKey(0), logits,
        jnp.zeros(4), jnp.zeros(4, jnp.int32), jnp.zeros(4),
        vocab_size=16,
    )
    assert list(np.asarray(tok)) == list(np.asarray(jnp.argmax(logits, -1)))


def test_batched_sampler_per_row_support():
    """Each row samples only inside ITS OWN filter support: row 0 greedy,
    row 1 top-k=3, row 2 reference top-p, row 3 unfiltered."""
    from magma_tpu.ops.sampling import sample_token_batched

    V = 12
    logits = jax.random.normal(jax.random.PRNGKey(2), (4, V)) * 3.0
    temps = jnp.array([0.0, 1.0, 1.0, 1.0])
    tks = jnp.array([0, 3, 0, 0], jnp.int32)
    tps = jnp.array([0.0, 0.0, 0.5, 0.0])
    top3 = set(np.asarray(jnp.argsort(-logits[1]))[:3].tolist())
    tp_keep = set(
        np.nonzero(~np.isinf(np.asarray(
            top_p_filter(logits[2:3], 0.5, mode="reference")
        ))[0])[0].tolist()
    )
    argmax0 = int(jnp.argmax(logits[0]))
    for seed in range(40):
        tok = np.asarray(sample_token_batched(
            jax.random.PRNGKey(100 + seed), logits, temps, tks, tps,
            vocab_size=V,
        ))
        assert tok[0] == argmax0
        assert tok[1] in top3
        assert tok[2] in tp_keep
        assert 0 <= tok[3] < V


def test_batched_sampler_masks_padded_vocab():
    from magma_tpu.ops.sampling import sample_token_batched

    logits = jnp.zeros((3, 8))  # uniform over 8 columns, true vocab = 5
    temps = jnp.array([0.0, 1.0, 2.0])
    for seed in range(20):
        tok = np.asarray(sample_token_batched(
            jax.random.PRNGKey(seed), logits, temps,
            jnp.zeros(3, jnp.int32), jnp.array([0.0, 0.9, 0.0]),
            vocab_size=5,
        ))
        assert (tok < 5).all()


def test_batched_sampler_topk1_deterministic():
    """top_k=1 with any temperature is argmax — the engine's mixed path
    relies on this for its determinism test."""
    from magma_tpu.ops.sampling import sample_token_batched

    logits = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    for seed in range(10):
        tok = np.asarray(sample_token_batched(
            jax.random.PRNGKey(seed), logits,
            jnp.array([1.0, 0.5]), jnp.array([1, 1], jnp.int32),
            jnp.zeros(2),
            vocab_size=32,
        ))
        assert list(tok) == list(np.asarray(jnp.argmax(logits, -1)))
