"""Run REAL QLoRA training steps of the flagship 6B MAGMA on one TPU chip.

VERDICT r1 item 8: convert "CPU-verified gradients" into "executed on TPU".
Flagship = GPT-J 6B (int8 frozen weights, train_lm_int8) + CLIP-RN50x16 @
384px + MAGMA_v1 adapters; differentiated set = adapters + image prefix +
encoder (at image_enc_lr; FREEZE_ENC=1 freezes it).  seq_len reduced to
256 total positions (144 image tokens + 112 caption tokens) so
activations fit alongside the quantized LM on 16 GB.

Measured (TPU v5e-1): 0.225 s/step encoder-trainable, 0.169 s/step
encoder-frozen at round-2 start; now 0.079 s/step encoder-frozen with
remat off (seq-256 activations are only ~56 MB — recomputing them bought
nothing) + device-resident batches + async stepping (sync every N steps;
the per-step loss fetch blocked the host for ~40 ms of dead device
time).  Loss decreases on a repeated batch either way.

Usage: python scripts/train_6b_onchip.py   (on the real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np


def main():
    import jax

    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma
    from magma_tpu.training.train_loop import Trainer

    print(f"device: {jax.devices()[0]}", flush=True)
    seq = int(os.environ.get("SEQ", "256"))
    steps = int(os.environ.get("STEPS", "4"))

    config = MultimodalConfig(
        batch_size=1,
        train_steps=steps,
        gradient_accumulation_steps=1,
        encoder_name="clip_resnet_large",      # RN50x16, 144 image tokens
        adapter_config={
            "mlp": {"adapter_type": "normal", "downsample_factor": 4},
        },
        use_image_embed_layernorm=True,
        image_embed_dropout_prob=0.1,
        freeze_lm=True,
        freeze_img_encoder=os.environ.get("FREEZE_ENC", "0") == "1",
        train_lm_int8=True,                    # QLoRA: int8 frozen LM
        seq_len=seq,
        image_size=384,
        lm_overrides=dict(remat=os.environ.get("REMAT", "0") == "1",
                          attention_impl="flash"),
        lr=8.0e-4, image_enc_lr=2.0e-6,
    )

    t0 = time.time()
    model = Magma(config)   # init + quantize fused under one jit
    jax.clear_caches()      # free init-phase temp arenas (axon pins them)
    trainer = Trainer(model, config)
    jax.clear_caches()      # ditto for the trainer's init-phase jits
    print(f"model+trainer built in {time.time() - t0:.1f}s", flush=True)

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 3, 384, 384).astype(np.float32))
    captions_np = np.full((1, seq), 50256, np.int32)
    captions_np[:, : seq // 2] = rng.randint(0, 50000, (1, seq // 2))
    captions = jnp.asarray(captions_np)

    t0 = time.time()
    loss = trainer.train_step(images, captions)
    print(f"step 1 (compile+run): {time.time() - t0:.1f}s  loss={loss:.4f}",
          flush=True)
    assert np.isfinite(loss), loss

    # the SECOND step triggers one more ~16 s compile (donated outputs
    # return with different layouts than the fresh state); warm it out of
    # the timed window (scripts/profile_train_6b.py warm-step timings)
    loss2 = trainer.train_step(images, captions)
    print(f"step 2 (recompile+run): warm", flush=True)

    # async stepping: sync only at the end — per-step loss fetches stall
    # the device for ~40 ms each on the tunneled transport
    losses = [loss, loss2]
    lazy = loss
    t0 = time.time()
    for i in range(steps - 1):
        lazy = trainer.train_step(images, captions, sync=False)
    losses.append(float(lazy))
    per_step = (time.time() - t0) / max(steps - 1, 1)
    assert all(np.isfinite(l) for l in losses)
    # same batch every step: adapter training must reduce the loss
    assert losses[-1] < losses[0], losses
    print(f"RESULT 6B QLoRA on-chip: {per_step:.3f}s/step "
          f"(b=1, seq={seq} incl. 144 image tokens, async), loss "
          f"{losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
