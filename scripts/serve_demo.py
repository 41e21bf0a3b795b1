"""Full serving-stack drive on one chip: CLIP-RN50x16 vision tower +
int4 GPT-J 6B + the continuous-batching MagmaServingEngine, end to end
(image+text prompts in, decoded caption strings out, tokens streamed)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np


def main():
    import jax

    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma
    from magma_tpu.serving import MagmaServingEngine

    print(f"device: {jax.devices()[0]}", flush=True)
    config = MultimodalConfig(
        batch_size=1, train_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal",
                                "downsample_factor": 4}},
        use_image_embed_layernorm=True, image_embed_dropout_prob=0.1,
        image_size=384, seq_len=2048,
        lm_overrides=dict(remat=False, attention_impl="flash",
                          kv_cache_dtype="int8"),
    )
    t0 = time.time()
    model = Magma(config)
    model.quantize_for_serving(bits=int(os.environ.get("BITS", "4")))
    jax.clear_caches()
    print(f"flagship built + quantized in {time.time() - t0:.1f}s", flush=True)

    eng = MagmaServingEngine(model, max_batch=4, max_len=512,
                             prefill_bucket=64, decode_window=8,
                             temperature=0.0)
    rng = np.random.RandomState(0)
    prompts = [
        [rng.rand(1, 3, 384, 384).astype(np.float32), "Describe the painting:"],
        [rng.rand(1, 3, 384, 384).astype(np.float32), "A picture of"],
        [rng.rand(1, 3, 384, 384).astype(np.float32),
         "Q: What is in this image? A:"],
        [rng.rand(1, 3, 384, 384).astype(np.float32), "This is"],
    ]
    t0 = time.time()
    ids = [eng.submit_prompt(p, max_new_tokens=24) for p in prompts]
    streamed = {rid: 0 for rid in ids}
    while eng.has_work:
        for rid, toks in eng.step().items():
            streamed[rid] += len(toks)
    dt = time.time() - t0
    texts = eng.text_results()
    total = sum(len(r.tokens) for r in eng.finished.values())
    for rid in ids:
        res = eng.finished[rid]
        print(f"req {rid}: {len(res.tokens)} tokens ({res.finish_reason}) "
              f"-> {texts[rid][:60]!r}", flush=True)
    assert set(texts) == set(ids)
    assert all(streamed[r] == len(eng.finished[r].tokens) for r in ids)
    print(f"SERVE DEMO OK: {len(ids)} multimodal requests, {total} tokens "
          f"in {dt:.1f}s (incl. first-compiles)", flush=True)

    # steady-state: same prompts again, compiles cached
    t0 = time.time()
    ids2 = [eng.submit_prompt(p, max_new_tokens=24) for p in prompts]
    while eng.has_work:
        eng.step()
    dt2 = time.time() - t0
    total2 = sum(len(eng.finished[r].tokens) for r in ids2)
    print(f"steady: {total2} tokens in {dt2:.2f}s -> "
          f"{total2 / dt2:.1f} tok/s aggregate (incl. vision+prefill)",
          flush=True)


if __name__ == "__main__":
    main()
