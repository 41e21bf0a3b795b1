"""Continuous-batching serving engine tests (tiny LM, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magma_tpu.models import gptj
from magma_tpu.ops.sampling import generate_tokens
from magma_tpu.serving import LMServingEngine


@pytest.fixture(scope="module")
def lm():
    cfg = gptj.GPTJConfig.tiny()
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _reference_tokens(cfg, params, embeds, max_steps, eos):
    """Oracle: single-request greedy generate, truncated after first EOS."""
    toks, n = generate_tokens(
        cfg, params, embeds[None] if embeds.ndim == 2 else embeds,
        jax.random.PRNGKey(0), max_steps=max_steps, temperature=0.0,
        top_k=0, top_p=0.0, eos_token=eos,
    )
    row = [int(t) for t in np.asarray(toks)[0][: int(n)]]
    if eos in row:
        row = row[: row.index(eos) + 1]
    return row


def _prompt(seed, s, d):
    return jax.random.normal(jax.random.PRNGKey(seed), (s, d)) * 0.02


EOS = 50256


def test_engine_matches_individual_generate(lm):
    """Three ragged greedy requests served together == served alone."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=4, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    prompts = [_prompt(i, s, cfg.d_model) for i, s in ((1, 5), (2, 11), (3, 8))]
    ids = [eng.submit(p, max_new_tokens=12) for p in prompts]
    results = eng.run()
    assert set(results) == set(ids)
    for rid, p in zip(ids, prompts):
        ref = _reference_tokens(cfg, params, p, 12, EOS)
        assert results[rid].tokens == ref, (
            f"req {rid}: {results[rid].tokens} != {ref}"
        )


def test_engine_mid_stream_admission(lm):
    """A request submitted while others are decoding is still correct."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=4, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    p0 = _prompt(10, 9, cfg.d_model)
    p1 = _prompt(11, 6, cfg.d_model)
    id0 = eng.submit(p0, max_new_tokens=14)
    for _ in range(3):
        eng.step()
    id1 = eng.submit(p1, max_new_tokens=14)
    results = eng.run()
    for rid, p in ((id0, p0), (id1, p1)):
        ref = _reference_tokens(cfg, params, p, 14, EOS)
        assert results[rid].tokens == ref


def test_engine_slot_reuse_under_oversubscription(lm):
    """5 requests through 2 slots: all complete, all correct."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    prompts = {
        eng.submit(_prompt(20 + i, 4 + 3 * i, cfg.d_model),
                   max_new_tokens=6): 20 + i
        for i in range(5)
    }
    results = eng.run()
    assert set(results) == set(prompts)
    for rid, seed in prompts.items():
        s = 4 + 3 * (seed - 20)
        ref = _reference_tokens(cfg, params, _prompt(seed, s, cfg.d_model),
                                6, EOS)
        assert results[rid].tokens == ref
        assert results[rid].finish_reason in ("eos", "length")


def test_engine_int8_kv_cache(lm):
    """The engine runs on an int8 engine cache; greedy output stays close
    to the bf16-cache engine (quantization noise only)."""
    cfg, params = lm
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    out = {}
    for name, c in (("bf16", cfg), ("int8", cfg8)):
        eng = LMServingEngine(c, params, max_batch=2, max_len=128,
                              eos_token=EOS, prefill_bucket=8)
        rid = eng.submit(_prompt(30, 7, cfg.d_model), max_new_tokens=8)
        out[name] = eng.run()[rid].tokens
    a, b = out["bf16"], out["int8"]
    n = min(len(a), len(b))
    agree = np.mean([x == y for x, y in zip(a[:n], b[:n])])
    assert agree >= 0.5, (a, b)


def test_engine_streaming_and_budget(lm):
    """step() emits tokens incrementally; max_new_tokens is respected."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    rid = eng.submit(_prompt(40, 5, cfg.d_model), max_new_tokens=4)
    seen = []
    while eng.has_work:
        emitted = eng.step()
        seen.extend(emitted.get(rid, []))
    res = eng.finished[rid]
    assert res.tokens == seen
    assert len(res.tokens) <= 4


def test_decode_window_invariance(lm):
    """Greedy results are identical for any decode_window size."""
    cfg, params = lm
    outs = []
    for window in (1, 3, 8):
        eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                              eos_token=EOS, prefill_bucket=8,
                              decode_window=window)
        ids = [eng.submit(_prompt(50 + i, 5 + i, cfg.d_model),
                          max_new_tokens=10) for i in range(3)]
        res = eng.run()
        outs.append([res[r].tokens for r in ids])
    assert outs[0] == outs[1] == outs[2]


def test_chunked_prefill_engine_matches_monolithic(lm):
    """prefill_chunk > 0 gives identical greedy results to monolithic
    prefill, including while other slots are decoding."""
    cfg, params = lm
    outs = []
    for chunk in (0, 8):
        eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                              eos_token=EOS, prefill_bucket=8,
                              decode_window=2, prefill_chunk=chunk)
        a = eng.submit(_prompt(60, 6, cfg.d_model), max_new_tokens=10)
        eng.step()  # a is decoding...
        b = eng.submit(_prompt(61, 29, cfg.d_model), max_new_tokens=10)
        c = eng.submit(_prompt(62, 17, cfg.d_model), max_new_tokens=10)
        res = eng.run()
        outs.append([res[r].tokens for r in (a, b, c)])
    assert outs[0] == outs[1], outs
    # and both match individual generation
    for rid_tokens, (seed, s) in zip(outs[0], ((60, 6), (61, 29), (62, 17))):
        ref = _reference_tokens(cfg, params, _prompt(seed, s, cfg.d_model),
                                10, EOS)
        assert rid_tokens == ref


def test_magma_serving_engine_end_to_end():
    """MagmaServingEngine: multimodal prompts in, decoded strings out."""
    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma
    from magma_tpu.serving import MagmaServingEngine

    cfg = MultimodalConfig(
        batch_size=1, train_steps=1, encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal",
                                "downsample_factor": 4}},
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=128,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=32),
        image_size=32,
    )
    m = Magma(cfg)
    eng = MagmaServingEngine(m, max_batch=2, max_len=128, prefill_bucket=8,
                             decode_window=2)
    img = np.zeros((1, 3, 32, 32), np.float32)
    r0 = eng.submit_prompt([img, "a picture of"], max_new_tokens=5)
    r1 = eng.submit_prompt([img, "describe:"], max_new_tokens=5)
    eng.run()
    texts = eng.text_results()
    assert set(texts) == {r0, r1}
    assert all(isinstance(t, str) for t in texts.values())
    assert all(1 <= len(eng.finished[r].tokens) <= 5 for r in (r0, r1))


def test_chunk_size_not_dividing_max_len(lm):
    """A padded final chunk must not corrupt the cache when prefill_chunk
    does not divide max_len (the scratch rounds up; install trims)."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=1, max_len=40,
                          eos_token=EOS, prefill_bucket=8,
                          decode_window=2, prefill_chunk=16)
    p = _prompt(70, 35, cfg.d_model)  # 3 chunks: 16+16+3(pad 13), > 40
    rid = eng.submit(p, max_new_tokens=4)
    res = eng.run()[rid]
    ref = _reference_tokens(cfg, params, p, 4, EOS)
    assert res.tokens == ref


def test_prompt_near_max_len_gets_second_token(lm):
    """s = max_len - 1 leaves room for exactly one decode write: the
    request must yield two tokens (prefill + one decode), not one."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=1, max_len=32,
                          eos_token=-1, prefill_bucket=8, decode_window=1)
    rid = eng.submit(_prompt(71, 31, cfg.d_model), max_new_tokens=10)
    res = eng.run()[rid]
    assert len(res.tokens) == 2, res
    assert res.finish_reason == "length"


def test_bucket_padding_clamped_to_max_len(lm):
    """A prompt whose bucket-rounded length exceeds max_len must still
    prefill (padding clamps to the cache length)."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=1, max_len=36,
                          eos_token=-1, prefill_bucket=16, decode_window=1)
    # s=33 bucket-rounds to 48 > max_len=36: only the clamp makes this work
    rid = eng.submit(_prompt(72, 33, cfg.d_model), max_new_tokens=3)
    res = eng.run()[rid]
    assert len(res.tokens) == 3


def test_size_classed_pools_route_and_match(lm):
    """Two cache classes: short requests land in the small pool, a long
    one in the big pool; greedy outputs equal the single-request oracle;
    total residency is far below a single uniform pool of the same slot
    count."""
    cfg, params = lm
    eng = LMServingEngine(
        cfg, params, cache_classes=((2, 128), (4, 32)),
        eos_token=-1, prefill_bucket=8, decode_window=2,
    )
    long_p = _prompt(80, 60, cfg.d_model)
    shorts = [_prompt(81 + i, 6, cfg.d_model) for i in range(4)]
    rid_long = eng.submit(long_p, max_new_tokens=6)
    rid_short = [eng.submit(p, max_new_tokens=5) for p in shorts]
    # routing: the long prompt cannot fit the 32-class
    eng._admit({})
    big, small = eng.groups[1], eng.groups[0]
    assert small.max_len == 32 and big.max_len == 128
    assert any(s is not None and s.req_id == rid_long for s in big.slots)
    assert sum(s is not None for s in small.slots) >= 3
    res = eng.run()
    assert res[rid_long].tokens == _reference_tokens(
        cfg, params, long_p, 6, -1
    )
    for rid, p in zip(rid_short, shorts):
        assert res[rid].tokens == _reference_tokens(cfg, params, p, 5, -1)
    # residency: 2*128 + 4*32 = 384 << 6 slots x 128 = 768
    assert eng.resident_cache_positions == 384


def test_piggybacked_chunk_with_active_decode(lm):
    """A chunked prefill advancing while another slot decodes must ride
    the decode dispatch (no standalone chunk dispatches once windows run)
    and still produce oracle-identical tokens for both requests."""
    cfg, params = lm
    eng = LMServingEngine(
        cfg, params, max_batch=2, max_len=96, eos_token=-1,
        prefill_bucket=8, decode_window=2, prefill_chunk=16,
    )
    short = _prompt(90, 5, cfg.d_model)
    long_p = _prompt(91, 60, cfg.d_model)   # 4 chunks
    rid_s = eng.submit(short, max_new_tokens=10)
    rid_l = eng.submit(long_p, max_new_tokens=4)
    calls = {"fused": 0}
    import magma_tpu.serving.engine as eng_mod
    orig = eng_mod._decode_with_chunk

    def counting(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    eng_mod._decode_with_chunk = counting
    try:
        res = eng.run()
    finally:
        eng_mod._decode_with_chunk = orig
    assert calls["fused"] >= 2  # chunks rode decode dispatches
    assert res[rid_s].tokens == _reference_tokens(cfg, params, short, 10, -1)
    assert res[rid_l].tokens == _reference_tokens(cfg, params, long_p, 4, -1)


def test_mixed_trace_drains_with_classes(lm):
    """A 24-request mixed-length trace over two pools drains completely
    with every greedy output oracle-identical (the VERDICT r2 item-6
    capability bar, scaled to the tiny model)."""
    cfg, params = lm
    eng = LMServingEngine(
        cfg, params, cache_classes=((2, 128), (6, 32)),
        eos_token=-1, prefill_bucket=8, decode_window=3, prefill_chunk=32,
    )
    rng = np.random.RandomState(0)
    prompts, rids = [], []
    for i in range(24):
        s = int(rng.choice([4, 9, 20, 70]))
        p = _prompt(100 + i, s, cfg.d_model)
        prompts.append(p)
        rids.append(eng.submit(p, max_new_tokens=int(rng.choice([3, 6]))))
    res = eng.run()
    assert set(res) == set(rids)
    for rid, p in zip(rids, prompts):
        n = len(res[rid].tokens)
        assert res[rid].tokens == _reference_tokens(cfg, params, p, n, -1)


def test_per_request_sampling_mixed_batch(lm):
    """Per-request sampling params: a greedy request and a top_k=1
    stochastic request (argmax-deterministic) served TOGETHER both match
    the greedy oracle, and the window runs the mixed-params program."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=4, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    p0 = _prompt(200, 6, cfg.d_model)
    p1 = _prompt(201, 9, cfg.d_model)
    r0 = eng.submit(p0, max_new_tokens=8)  # engine default: greedy
    r1 = eng.submit(p1, max_new_tokens=8, temperature=0.8, top_k=1)
    calls = {"mixed": 0}
    import magma_tpu.serving.engine as eng_mod
    orig = eng_mod._decode_mixed

    def counting(*a, **k):
        calls["mixed"] += 1
        return orig(*a, **k)

    eng_mod._decode_mixed = counting
    try:
        res = eng.run()
    finally:
        eng_mod._decode_mixed = orig
    assert calls["mixed"] >= 1
    assert res[r0].tokens == _reference_tokens(cfg, params, p0, 8, EOS)
    assert res[r1].tokens == _reference_tokens(cfg, params, p1, 8, EOS)


def test_per_request_sampling_static_path_when_uniform(lm):
    """All-default requests must keep the cheap static program (no
    per-step sort): the mixed program is never invoked."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    eng.submit(_prompt(210, 5, cfg.d_model), max_new_tokens=6)
    eng.submit(_prompt(211, 7, cfg.d_model), max_new_tokens=6)
    calls = {"mixed": 0}
    import magma_tpu.serving.engine as eng_mod
    orig = eng_mod._decode_mixed

    def counting(*a, **k):
        calls["mixed"] += 1
        return orig(*a, **k)

    eng_mod._decode_mixed = counting
    try:
        eng.run()
    finally:
        eng_mod._decode_mixed = orig
    assert calls["mixed"] == 0


def test_per_request_sampling_with_chunked_prefill(lm):
    """A top_k=1 stochastic request with a CHUNKED prefill alongside a
    decoding greedy slot: both oracle-identical (exercises
    _decode_with_chunk_mixed and the traced-params install)."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=2, max_len=96,
                          eos_token=-1, prefill_bucket=8, decode_window=2,
                          prefill_chunk=16)
    short = _prompt(220, 5, cfg.d_model)
    long_p = _prompt(221, 40, cfg.d_model)  # 3 chunks
    r_s = eng.submit(short, max_new_tokens=8)
    r_l = eng.submit(long_p, max_new_tokens=4, temperature=1.0, top_k=1)
    res = eng.run()
    assert res[r_s].tokens == _reference_tokens(cfg, params, short, 8, -1)
    assert res[r_l].tokens == _reference_tokens(cfg, params, long_p, 4, -1)


def test_per_request_sampling_varies_output(lm):
    """A temperature>0 unfiltered request actually samples: across seeds
    the outputs differ from always-greedy at least once (tiny random LM
    logits are near-uniform, so sampling diverges almost surely)."""
    cfg, params = lm
    greedy = None
    diverged = False
    for seed in range(4):
        eng = LMServingEngine(cfg, params, max_batch=1, max_len=64,
                              eos_token=-1, prefill_bucket=8, seed=seed)
        rid = eng.submit(_prompt(230, 6, cfg.d_model), max_new_tokens=10,
                         temperature=1.5)
        toks = eng.run()[rid].tokens
        if greedy is None:
            greedy = _reference_tokens(cfg, params,
                                       _prompt(230, 6, cfg.d_model), 10, -1)
        if toks != greedy:
            diverged = True
            break
    assert diverged


def test_engine_tensor_parallel_matches_single_device(lm):
    """LMServingEngine(mesh=tp2): the engine's full production path —
    pools, scratch caches, prefill/install/decode-window programs —
    under GSPMD with head-sharded params/caches must be token-identical
    to the single-device engine (VERDICT r3 item 5)."""
    from jax.sharding import Mesh

    cfg, params = lm
    prompts = [_prompt(i, s, cfg.d_model)
               for i, s in ((1, 5), (2, 11), (3, 8))]

    ref = {}
    eng0 = LMServingEngine(cfg, params, max_batch=4, max_len=128,
                           eos_token=EOS, prefill_bucket=8,
                           decode_window=3)
    ids0 = [eng0.submit(p, max_new_tokens=10) for p in prompts]
    for rid, r in eng0.run().items():
        ref[ids0.index(rid)] = r.tokens

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("tp",))
    eng = LMServingEngine(cfg, params, max_batch=4, max_len=128,
                          eos_token=EOS, prefill_bucket=8,
                          decode_window=3, mesh=mesh)
    # pools actually live head-sharded on the tp mesh
    sh = eng.groups[0].cache["k"].sharding
    assert sh.spec[3] == "tp", sh
    # and the params carry Megatron layouts, not replication
    assert eng.params["blocks"]["attn"]["q"].sharding.spec[2] == "tp"
    ids = [eng.submit(p, max_new_tokens=10) for p in prompts]
    results = eng.run()
    for i, rid in enumerate(ids):
        assert results[rid].tokens == ref[i], (
            f"req {i}: tp {results[rid].tokens} != single {ref[i]}"
        )


def test_engine_tp_rejects_unsplittable_heads(lm):
    from jax.sharding import Mesh

    cfg, params = lm
    mesh = Mesh(np.array(jax.devices()[:3]), axis_names=("tp",))
    with pytest.raises(ValueError, match="n_heads"):
        LMServingEngine(cfg, params, mesh=mesh)  # 4 heads, tp=3


def test_pipelined_matches_unpipelined(lm):
    """pipeline_windows=True (default, dispatch-then-collect with a
    one-window lag) must be token-identical to the synchronous engine on
    an oversubscribed greedy trace with mixed sampling params."""
    cfg, params = lm
    outs = []
    for pipelined in (False, True):
        eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                              eos_token=EOS, prefill_bucket=8,
                              decode_window=3, pipeline_windows=pipelined)
        ids = [
            eng.submit(_prompt(300 + i, 4 + 3 * i, cfg.d_model),
                       max_new_tokens=7,
                       **({"temperature": 0.8, "top_k": 1} if i == 2 else {}))
            for i in range(5)
        ]
        res = eng.run()
        outs.append([res[r].tokens for r in ids])
        for r in ids:
            assert res[r].finish_reason in ("eos", "length")
    assert outs[0] == outs[1], outs


def test_pipelined_streaming_lags_but_completes(lm):
    """step() in pipelined mode may emit a window late, but the stream
    union equals the final tokens and respects the budget."""
    cfg, params = lm
    eng = LMServingEngine(cfg, params, max_batch=2, max_len=128,
                          eos_token=EOS, prefill_bucket=8, decode_window=2)
    rid = eng.submit(_prompt(310, 5, cfg.d_model), max_new_tokens=5)
    seen = []
    while eng.has_work:
        seen.extend(eng.step().get(rid, []))
    res = eng.finished[rid]
    assert res.tokens == seen
    assert len(res.tokens) <= 5


def test_engine_int4_weights_match_generate(lm):
    """The engine is weight-format agnostic: int4-quantized params (the
    boundary-kernel serving layout) served through the engine must be
    token-identical to the monolithic generate on the SAME int4 params
    (on chip the b<=8 decode windows ride the boundary kernel)."""
    cfg, params = lm
    params_q = gptj.quantize_lm_params_int4(params)
    eng = LMServingEngine(cfg, params_q, max_batch=4, max_len=128,
                          eos_token=EOS, prefill_bucket=8)
    prompts = [_prompt(i, s, cfg.d_model)
               for i, s in ((41, 5), (42, 11), (43, 8))]
    ids = [eng.submit(p, max_new_tokens=12) for p in prompts]
    results = eng.run()
    for rid, p in zip(ids, prompts):
        ref = _reference_tokens(cfg, params_q, p, 12, EOS)
        assert results[rid].tokens == ref, (
            f"req {rid}: {results[rid].tokens} != {ref}")
