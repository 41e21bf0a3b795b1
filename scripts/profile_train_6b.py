"""Profile the 6B QLoRA train step with the device profiler and print the
top ops — chasing the gap between the measured step time and the
~55 ms compute roofline (fwd 3.1 TF + bwd-dx ~6 TF + int8 weight
re-streaming)."""
import os
import sys
import time
import glob

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
    config = MultimodalConfig(
        batch_size=1, train_steps=8, gradient_accumulation_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal",
                                "downsample_factor": 4}},
        use_image_embed_layernorm=True, image_embed_dropout_prob=0.1,
        freeze_lm=True,
        freeze_img_encoder=os.environ.get("FREEZE_ENC", "1") == "1",
        train_lm_int8=True, seq_len=seq, image_size=384,
        lm_overrides=dict(remat=os.environ.get("REMAT", "1") == "1",
                          attention_impl="flash"),
        lr=8.0e-4, image_enc_lr=2.0e-6,
    )
    model = Magma(config)
    jax.clear_caches()
    trainer = Trainer(model, config)
    jax.clear_caches()
    print("built", flush=True)

    rng = np.random.RandomState(0)
    images = rng.rand(1, 3, 384, 384).astype(np.float32)
    captions = np.full((1, seq), 50256, np.int32)
    captions[:, : seq // 2] = rng.randint(0, 50000, (1, seq // 2))

    for i in range(3):  # compile + warm
        t0 = time.time()
        loss = trainer.train_step(images, captions)
        print(f"warm step {i}: {time.time()-t0:.3f}s loss={loss:.4f}",
              flush=True)

    logdir = "/tmp/prof_train6b"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            trainer.train_step(images, captions)
    print("trace captured", flush=True)

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    import json
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    # op stats arrives as json/csv-ish; dump the head
    out = data.decode() if isinstance(data, bytes) else str(data)
    with open("/tmp/prof_train6b_ops.json", "w") as f:
        f.write(out)
    print("wrote /tmp/prof_train6b_ops.json", len(out), flush=True)


if __name__ == "__main__":
    main()
