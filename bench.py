"""Benchmark: flagship MAGMA (GPT-J 6B + CLIP-RN50x16) on one TPU chip.

Measures the BASELINE.md north-star path — single-image preprocess ->
RN50x16 encode -> ImagePrefix -> 149-token prefill -> greedy KV-cached
decode — and reports decode throughput as the primary metric.

Prints ONE json line to stdout:
  {"metric": "generate_tokens_per_sec_per_chip", "value": N,
   "unit": "tokens/s", "vs_baseline": N, ...}

vs_baseline: the reference publishes no numbers (BASELINE.md); we baseline
against a GPT-J 6B fp16 single-stream decode on A100 (~32 tok/s, standard
HF transformers measurement) since the driver's north star is ">= 2x A100
end-to-end throughput".
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

A100_GPTJ_DECODE_TOKS = 32.0  # fp16 single-stream, HF transformers


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from magma_tpu.models import gptj, image_prefix as ip_mod
    from magma_tpu.models.adapters import AdapterSpec
    from magma_tpu.ops.preprocess import clip_preprocess
    from magma_tpu.ops.sampling import generate_tokens

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # ---- flagship config: GPT-J 6B + RN50x16 + v1 adapters ----
    lm_cfg = gptj.GPTJConfig.gptj_6b(
        param_dtype=jnp.bfloat16,
        mlp_adapter=AdapterSpec("normal", 4),
        remat=False,
        attention_impl="flash",
    )
    prefix_cfg = ip_mod.ImagePrefixConfig(
        encoder_name="clip_resnet_large", out_dim=lm_cfg.d_model,
        dropout_prob=0.1, use_layernorm=True,
    )

    # ---- stage 1: preprocess + encode + prefix (1 x 384px image) ----
    # vision runs (and is timed) first, then its ~0.7 GB of parameters are
    # freed before the 12 GB LM initializes — everything must coexist with
    # the LM weights + KV cache inside 16 GB HBM otherwise
    log("initializing vision tower...")
    ip_params, ip_stats = jax.jit(
        lambda k: ip_mod.init_params(k, prefix_cfg)
    )(jax.random.PRNGKey(1))
    # serving transform: fold BN into conv weights, bf16 end to end
    # (same call quantize_for_serving/pack_for_serving make)
    ip_params = jax.jit(
        lambda p, s: ip_mod.fold_for_serving(p, s, prefix_cfg)
    )(ip_params, ip_stats)

    raw = jax.random.randint(
        jax.random.PRNGKey(2), (1, 480, 640, 3), 0, 256, jnp.uint8
    )

    @jax.jit
    def image_to_prefix(raw, params, stats):
        pixels = clip_preprocess(raw, 384)
        emb, _ = ip_mod.apply(params, stats, pixels, prefix_cfg, train=False)
        return emb

    emb = image_to_prefix(raw, ip_params, ip_stats)
    jax.block_until_ready(emb)
    n_img_tokens = emb.shape[1]
    log(f"image prefix: {emb.shape}")

    times = []
    for _ in range(5):
        t0 = time.time()
        e = image_to_prefix(raw, ip_params, ip_stats)
        # scalar fetch forces a real device sync (block_until_ready has
        # proven unreliable for timing through the tunneled TPU transport)
        float(e.astype(jnp.float32).sum())
        times.append(time.time() - t0)
    t_vision_ms = sorted(times)[len(times) // 2] * 1e3
    log(f"vision p50: {t_vision_ms:.1f} ms (incl. host sync)")

    # device-time view: the tunneled transport adds ~25-30 ms of dispatch
    # + sync per call, swamping the ~2.5 ms the BN-folded tower actually
    # takes on device (scripts/exp_profile_vision.py) — amortize 8
    # encodes inside one jit to report compute honestly alongside the
    # dispatch-bound p50
    VLOOP = 8

    @jax.jit
    def image_to_prefix_loop(raw, params, stats):
        def body(i, acc):
            pixels = clip_preprocess(raw, 384)
            emb, _ = ip_mod.apply(params, stats, pixels, prefix_cfg,
                                  train=False)
            return acc + emb.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, VLOOP, body, jnp.float32(0.0))

    float(image_to_prefix_loop(raw, ip_params, ip_stats))
    times = []
    for _ in range(3):
        t0 = time.time()
        float(image_to_prefix_loop(raw, ip_params, ip_stats))
        times.append(time.time() - t0)
    t_vision_dev_ms = sorted(times)[len(times) // 2] * 1e3 / VLOOP
    log(f"vision device (amortized x{VLOOP}): {t_vision_dev_ms:.2f} ms")
    del ip_params, ip_stats
    image_to_prefix.clear_cache()
    image_to_prefix_loop.clear_cache()

    # ---- stage 2: prefill + greedy decode (149-token prompt) ----
    log("initializing LM params on device...")
    t0 = time.time()
    lm_params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(lm_params["wte"])
    log(f"LM init done in {time.time() - t0:.1f}s")

    text_tokens = jnp.array([[44, 45, 46, 47, 48]], jnp.int32)  # 5 text toks
    text_emb = gptj.embed_tokens(lm_cfg, lm_params, text_tokens)
    prompt = jnp.concatenate([emb.astype(jnp.bfloat16), text_emb], axis=1)
    log(f"prompt embeddings: {prompt.shape}")  # (1, 149, 4096)

    max_steps = 64
    latencies = {}  # label -> single-call p50 seconds (tunnel RTT incl.)
    steadies = {}   # label -> steady-state tok/s (slope between 2x/1x steps)

    def bench_generate(params, prompt_embeds, label, reps=3, cfg=None,
                       steady=False):
        """Tokens/sec over full-length greedy decodes, two denominators:

        * **throughput** (returned, the recorded metric): ``reps`` generate
          calls dispatched back to back, ONE device sync at the end.  On
          this sandbox the TPU is reached through a network tunnel that
          costs ~33 ms per synchronous dispatch+fetch round trip (measured:
          a trivial jitted scalar op takes 33 ms wall at <10 us device) —
          pure infrastructure RTT a production host-attached TPU never
          pays.  Pipelining amortizes it to the async dispatch cost
          (~3 ms), so the throughput number tracks the device, not the
          tunnel.
        * **p50 single-call latency** (also logged/recorded): median wall
          time of one synchronous generate call, tunnel RTT included —
          directly comparable to rounds 1-4, which timed this way.

        eos_token=-1 disables the early-exit so all max_steps decode steps
        run (a random-init model would otherwise emit EOS immediately and
        fake a huge tokens/sec)."""
        cfg = lm_cfg if cfg is None else cfg
        b = prompt_embeds.shape[0]
        # compiled executables pin their temp arenas on tunneled TPUs; free
        # the previous stage's arena before compiling this one
        jax.clear_caches()

        def run(seed):
            return generate_tokens(
                cfg, params, prompt_embeds, jax.random.PRNGKey(seed),
                max_steps=max_steps, temperature=0.0, top_k=0, top_p=0.0,
                eos_token=-1,
            )

        def sync(out):
            toks, steps = out
            jax.block_until_ready(toks)
            assert int(steps) == max_steps, (
                f"expected {max_steps} steps, got {int(steps)}"
            )

        t0 = time.time()
        sync(run(0))
        log(f"[{label}] compile+run: {time.time() - t0:.1f}s")
        times = []
        for i in range(reps):
            t0 = time.time()
            sync(run(i))
            times.append(time.time() - t0)
        t_lat = sorted(times)[len(times) // 2]
        t0 = time.time()
        outs = [run(i) for i in range(reps)]
        for o in outs:
            sync(o)
        t = (time.time() - t0) / reps
        tps = b * max_steps / t
        latencies[label] = round(t_lat, 4)
        log(f"[{label}] pipelined {t:.3f}s -> {tps:.1f} tok/s "
            f"(single-call p50 {t_lat:.3f}s -> {b*max_steps/t_lat:.1f})")
        if steady:
            # steady-state per-token rate: slope of SINGLE-CALL p50 wall
            # time between 2x- and 1x-step generates — the shared prefill
            # intercept (~11 ms device), sampler glue, and the per-call
            # tunnel RTT all cancel in the subtraction, leaving the
            # marginal decode cost a long generation actually pays.
            # (p50-of-synced-calls, not pipelined deltas: a pipelined
            # difference of two ~3-rep averages is exposed to host
            # scheduling noise at both points and once produced a
            # non-physical 1.7 ms/tok int4 figure under CPU load;
            # medians of synced calls are robust to it)
            def run2(seed):
                toks, steps = generate_tokens(
                    cfg, params, prompt_embeds, jax.random.PRNGKey(seed),
                    max_steps=2 * max_steps, temperature=0.0, top_k=0,
                    top_p=0.0, eos_token=-1,
                )
                jax.block_until_ready(toks)
                assert int(steps) == 2 * max_steps
            run2(0)  # compile
            times2 = []
            for i in range(reps):
                t0 = time.time()
                run2(i)
                times2.append(time.time() - t0)
            t_lat2 = sorted(times2)[len(times2) // 2]
            s_tps = b * max_steps / (t_lat2 - t_lat)
            steadies[label] = round(s_tps, 2)
            log(f"[{label}] steady-state slope ({2*max_steps}-{max_steps} "
                f"steps, single-call p50s): "
                f"{(t_lat2-t_lat)/max_steps*1e3:.2f} ms/tok -> "
                f"{s_tps:.1f} tok/s")
        return tps, t_lat

    # (a) bf16 single-stream + (b) batched decode (interleaved prompts,
    # BASELINE config 3).  Weights are packed for the Pallas stacked-matmul
    # path: under the XLA scan, b=8 needed 4.5 GB of hoisted weight-relayout
    # temps and OOM'd; packed, it runs (and is faster at b=1 too).
    lm_params = gptj.pack_lm_params_bf16(lm_params)
    tps_bf16, t_bf16 = bench_generate(lm_params, prompt, "bf16 b=1")
    batch = 8
    prompt_b = jnp.broadcast_to(prompt, (batch, *prompt.shape[1:]))
    tps_bf16_b8, _ = bench_generate(lm_params, prompt_b, f"bf16 b={batch}")

    # serving-engine mixed workload (shared by the int4 and int8 engine
    # stages): continuous batching of interleaved long-context requests —
    # the regime the monolithic generate program cannot even compile at
    import dataclasses

    from magma_tpu.serving import LMServingEngine

    eng_lens = [max(64, 1920 * (i % 4 + 1) // 4) for i in range(8)]
    eng_embs = [jax.random.normal(jax.random.PRNGKey(i),
                                  (L, lm_cfg.d_model), jnp.bfloat16) * 0.02
                for i, L in enumerate(eng_lens)]

    def bench_engine(params, tag):
        """One compile round + one timed round of the mixed workload;
        returns (output tok/s, total tok/s incl. prompt tokens)."""
        jax.clear_caches()
        eng = LMServingEngine(
            dataclasses.replace(lm_cfg, kv_cache_dtype="int8"), params,
            max_batch=8, max_len=2048, eos_token=-1, prefill_bucket=64,
            decode_window=8, prefill_chunk=0,
        )

        def engine_round():
            done_before = sum(len(r.tokens) for r in eng.finished.values())
            t0 = time.time()
            for e in eng_embs:
                eng.submit(e, max_new_tokens=64)
            eng.run()
            dt = time.time() - t0
            out_toks = sum(
                len(r.tokens) for r in eng.finished.values()) - done_before
            # both denominators (VERDICT r4 weak #5): the workload is
            # prefill-dominated, so output-tok/s alone hides most work
            total_toks = out_toks + sum(eng_lens)
            return out_toks / dt, total_toks / dt

        engine_round()  # compiles
        out_tps, total_tps = engine_round()
        log(f"[engine {tag} b=8 mixed ctx<=1920] steady "
            f"{out_tps:.0f} output tok/s ({total_tps:.0f} total "
            f"tok/s incl. {sum(eng_lens)} prompt tokens)")
        del eng
        jax.clear_caches()
        return out_tps, total_tps

    # (c) int4 weight-only serving mode (nibble-packed kernel, int8 head).
    # Runs before int8 because each quantizer consumes the bf16 originals;
    # the LM re-initializes from the same PRNG key for the int8 stages.
    log("quantizing to int4...")
    lm_params = gptj.quantize_lm_params_int4(lm_params)
    tps_int4, _ = bench_generate(lm_params, prompt, "int4 b=1", steady=True)
    prompt_b8 = jnp.broadcast_to(prompt, (8, *prompt.shape[1:]))
    tps_int4_b8, _ = bench_generate(lm_params, prompt_b8, "int4 b=8")
    # int4 engine: decode windows ride the boundary kernel at b <= 8
    # (engine parity vs monolithic generate: tests/test_serving.py)
    tps_engine4, tps_engine4_total = bench_engine(lm_params,
                                                  "int4w/int8kv")
    del lm_params
    jax.clear_caches()

    # (d) int8 weight-only serving mode (fused dequant Pallas kernel) —
    # the quality-conservative default and the headline metric
    log("re-initializing LM + quantizing to int8...")
    lm_params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(lm_params["wte"])
    lm_params = gptj.quantize_lm_params(lm_params)  # frees bf16 originals
    tps_int8, t_int8 = bench_generate(lm_params, prompt, "int8 b=1",
                                  steady=True)
    tps_int8_b8, _ = bench_generate(lm_params, prompt_b8, "int8 b=8")

    # (e) long-context: 1984-token prompt + 64 decode steps (prefill
    # incl.), int8 KV cache (the measured-best long-context config:
    # halves the decode cache stream)
    lm_cfg_kv8 = dataclasses.replace(lm_cfg, kv_cache_dtype="int8")
    prompt_long = jnp.concatenate(
        [jnp.zeros((1, 1984 - prompt.shape[1], prompt.shape[2]),
                   jnp.bfloat16), prompt], axis=1,
    )
    tps_int8_long, _ = bench_generate(
        lm_params, prompt_long, "int8 b=1 ctx=1984 kv=int8",
        cfg=lm_cfg_kv8,
    )

    # ---- stage 3: prefill throughput (1984-token prompt, one pass) ----
    jax.clear_caches()
    cache0 = gptj.init_kv_cache(lm_cfg_kv8, 1, 2048)

    @jax.jit
    def prefill(p, e, c):
        logits, c = gptj.forward(lm_cfg_kv8, p, e, cache=c,
                                 cache_index=jnp.int32(0))
        return logits[:, -1].sum(), c

    s_pref = prompt_long.shape[1]
    _, cache0 = prefill(lm_params, prompt_long, cache0)
    times = []
    for _ in range(3):
        t0 = time.time()
        out, cache0 = prefill(lm_params, prompt_long, cache0)
        float(out)
        times.append(time.time() - t0)
    tps_prefill = s_pref / sorted(times)[1]
    log(f"[prefill int8 s={s_pref}] p50 {sorted(times)[1]*1e3:.0f} ms -> "
        f"{tps_prefill:.0f} tok/s")
    del cache0

    # ---- stage 4: serving-engine mixed workload (BASELINE config 3-ish),
    # int8 weights — the quality-conservative default ----
    tps_engine, tps_engine_total = bench_engine(lm_params, "int8w/int8kv")
    del lm_params
    jax.clear_caches()

    # ---- stage 5: QLoRA finetuning step (BASELINE config 5: adapters
    # against the frozen int8 6B + trainable image prefix, the v1 recipe
    # at single-chip scale; scripts/train_6b_onchip.py measured history)
    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma
    from magma_tpu.training.train_loop import Trainer

    seq = 256
    t_cfg = MultimodalConfig(
        batch_size=1, train_steps=8, gradient_accumulation_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config={
            "mlp": {"adapter_type": "normal", "downsample_factor": 4}},
        use_image_embed_layernorm=True, image_embed_dropout_prob=0.1,
        freeze_lm=True, freeze_img_encoder=True, train_lm_int8=True,
        seq_len=seq, image_size=384,
        lm_overrides=dict(remat=False, attention_impl="flash"),
        lr=8.0e-4,
    )
    model = Magma(t_cfg)
    jax.clear_caches()
    trainer = Trainer(model, t_cfg)
    jax.clear_caches()
    rng_np = __import__("numpy").random.RandomState(0)
    t_images = jnp.asarray(rng_np.rand(1, 3, 384, 384).astype("float32"))
    caps = __import__("numpy").full((1, seq), 50256, "int32")
    caps[:, : seq // 2] = rng_np.randint(0, 50000, (1, seq // 2))
    t_caps = jnp.asarray(caps)
    # two warm steps before timing: the first call compiles, and the
    # SECOND triggers one more compile (donated outputs come back with
    # different layouts than the freshly-initialized state, ~16 s once);
    # steady state starts at step 3 (scripts/profile_train_6b.py: 28.5 /
    # 16.5 / 0.159 s for warm steps 0/1/2)
    trainer.train_step(t_images, t_caps)
    trainer.train_step(t_images, t_caps)
    t0 = time.time()
    n_steps = 6
    for _ in range(n_steps - 1):
        trainer.train_step(t_images, t_caps, sync=False)
    loss = trainer.train_step(t_images, t_caps)  # sync once at the end
    t_train_step = (time.time() - t0) / n_steps
    tps_train = seq / t_train_step
    log(f"[QLoRA 6B train b=1 seq={seq}] {t_train_step*1e3:.0f} ms/step "
        f"-> {tps_train:.0f} train tok/s/chip (loss {loss:.3f})")
    del trainer, model
    jax.clear_caches()

    # ---- stage 6: recipe-scale training step (VERDICT r4 item 6): the
    # v1 recipe trains at seq 2048 with grad accumulation
    # (/root/reference/configs/MAGMA_v1.yml:8-20); measure that cost, not
    # just the demo-scale one.  b=1 x ga=2 = 2 microbatches/step.
    seq2 = 2048
    # remat ON here: seq-2048 backward activations (28 x 2048 x 16384
    # bf16 FFN stack alone is 1.75 GB x layers of temps) blow the 16 GB
    # chip without it — measured 22.6 GB requested; recompute is the
    # right trade at this scale (the seq-256 stage keeps remat off, its
    # activations are only ~56 MB)
    t_cfg2 = dataclasses.replace(
        t_cfg, seq_len=seq2, gradient_accumulation_steps=2, train_steps=6,
        lm_overrides=dict(t_cfg.lm_overrides, remat=True),
    )
    model2 = Magma(t_cfg2)
    jax.clear_caches()
    trainer2 = Trainer(model2, t_cfg2)
    jax.clear_caches()
    caps2 = __import__("numpy").full((2, seq2), 50256, "int32")
    caps2[:, : seq2 // 2] = rng_np.randint(0, 50000, (2, seq2 // 2))
    t_caps2 = jnp.asarray(caps2)          # (ga*b, seq)
    t_images2 = jnp.asarray(
        rng_np.rand(2, 3, 384, 384).astype("float32"))
    trainer2.train_step(t_images2, t_caps2)
    trainer2.train_step(t_images2, t_caps2)  # step-2 donation recompile
    t0 = time.time()
    n_steps = 4
    for _ in range(n_steps - 1):
        trainer2.train_step(t_images2, t_caps2, sync=False)
    loss2 = trainer2.train_step(t_images2, t_caps2)
    t_train2 = (time.time() - t0) / n_steps
    tps_train2 = 2 * seq2 / t_train2
    log(f"[QLoRA 6B train b=1 seq={seq2} ga=2] {t_train2*1e3:.0f} ms/step "
        f"-> {tps_train2:.0f} train tok/s/chip (loss {loss2:.3f})")
    del trainer2, model2
    jax.clear_caches()

    tps = tps_int8
    result = {
        "metric": "generate_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / A100_GPTJ_DECODE_TOKS, 3),
        "model": "gptj-6b+rn50x16 (int8 weight-only serving; int4 mode "
                 "benched in detail)",
        "detail": {
            "decode_tps_bf16_b1": round(tps_bf16, 2),
            "decode_tps_bf16_b8": round(tps_bf16_b8, 2),
            "decode_tps_int8_b1": round(tps_int8, 2),
            "decode_tps_int8_b8": round(tps_int8_b8, 2),
            "decode_tps_int4_b1": round(tps_int4, 2),
            "decode_tps_int4_b8": round(tps_int4_b8, 2),
            "decode_tps_int8_b1_ctx1984_kvint8": round(tps_int8_long, 2),
            "prefill_tps_int8_s1984": round(tps_prefill, 1),
            "engine_mixed_tps_int8_b8": round(tps_engine, 1),
            "engine_mixed_tps_int4_b8": round(tps_engine4, 1),
            "engine_mixed_total_tps_int4_b8": round(tps_engine4_total, 1),
            "engine_mixed_total_tps_int8_b8": round(tps_engine_total, 1),
            "engine_prompt_tokens": int(sum(eng_lens)),
            "engine_output_tokens_per_round": 8 * 64,
            "train_qlora_s_per_step_b1_seq256": round(t_train_step, 4),
            "train_qlora_tokens_per_s_per_chip": round(tps_train, 1),
            "train_qlora_s_per_step_b1_seq2048_ga2": round(t_train2, 4),
            "train_qlora_tokens_per_s_per_chip_seq2048": round(tps_train2, 1),
            "caption_e2e_p50_s": round(t_int8 + t_vision_ms / 1e3, 3),
            "vision_p50_ms": round(t_vision_ms, 1),
            "vision_device_ms": round(t_vision_dev_ms, 2),
            "prompt_tokens": int(prompt.shape[1]),
            "image_tokens": int(n_img_tokens),
            "decode_steps": max_steps,
            "decode_p50_call_s": latencies,  # single sync call, RTT incl.
            "decode_tps_b1_steady": steadies,  # slope, intercept-free
            "timing": "decode_tps_* are pipelined (3 calls, 1 sync) to "
                      "amortize this sandbox's ~33 ms/dispatch tunnel RTT; "
                      "decode_p50_call_s keeps the rounds-1-4 single-call "
                      "method",
            "device": str(dev),
            "baseline_assumption": "A100 fp16 GPT-J-6B single-stream ~32 tok/s",
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
