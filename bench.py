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

    log("initializing params on device...")
    t0 = time.time()
    lm_params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(
        jax.random.PRNGKey(0)
    )
    ip_params, ip_stats = jax.jit(
        lambda k: ip_mod.init_params(k, prefix_cfg)
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(lm_params["wte"])
    log(f"init done in {time.time() - t0:.1f}s")

    # ---- stage 1: preprocess + encode + prefix (1 x 384px image) ----
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
        jax.block_until_ready(image_to_prefix(raw, ip_params, ip_stats))
        times.append(time.time() - t0)
    t_vision_ms = sorted(times)[len(times) // 2] * 1e3
    log(f"vision p50: {t_vision_ms:.1f} ms")

    # ---- stage 2: prefill + greedy decode (149-token prompt) ----
    text_tokens = jnp.array([[44, 45, 46, 47, 48]], jnp.int32)  # 5 text toks
    text_emb = gptj.embed_tokens(lm_cfg, lm_params, text_tokens)
    prompt = jnp.concatenate([emb.astype(jnp.bfloat16), text_emb], axis=1)
    log(f"prompt embeddings: {prompt.shape}")  # (1, 149, 4096)

    max_steps = 64

    def run(seed):
        # eos_token=-1 disables the early-exit so all max_steps decode steps
        # run (a random-init model would otherwise emit EOS immediately and
        # fake a huge tokens/sec)
        toks, steps = generate_tokens(
            lm_cfg, lm_params, prompt, jax.random.PRNGKey(seed),
            max_steps=max_steps, temperature=0.0, top_k=0, top_p=0.0,
            eos_token=-1,
        )
        toks = jax.block_until_ready(toks)
        assert int(steps) == max_steps, f"expected {max_steps} steps, got {int(steps)}"
        return toks, steps

    log("compiling generate...")
    t0 = time.time()
    run(0)
    log(f"generate compile+run: {time.time() - t0:.1f}s")

    e2e, decode_tps = [], []
    for i in range(3):
        t0 = time.time()
        toks, steps = run(i)
        dt = time.time() - t0
        e2e.append(dt + t_vision_ms / 1e3)
        decode_tps.append(max_steps / dt)
        log(f"run {i}: {dt:.3f}s total, {max_steps / dt:.1f} tok/s")

    tps = sorted(decode_tps)[len(decode_tps) // 2]
    p50_latency_s = sorted(e2e)[len(e2e) // 2]

    result = {
        "metric": "generate_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / A100_GPTJ_DECODE_TOKS, 3),
        "model": "gptj-6b+rn50x16",
        "detail": {
            "caption_e2e_p50_s": round(p50_latency_s, 3),
            "vision_p50_ms": round(t_vision_ms, 1),
            "prompt_tokens": int(prompt.shape[1]),
            "image_tokens": int(n_img_tokens),
            "decode_steps": max_steps,
            "dtype": "bfloat16",
            "device": str(dev),
            "baseline_assumption": "A100 fp16 GPT-J-6B single-stream ~32 tok/s",
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
