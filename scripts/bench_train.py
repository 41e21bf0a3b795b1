"""Adapter-finetuning train-step benchmark on the real chip (BASELINE
config 5: frozen GPT-J 6B + RN50x16 @384px + MAGMA_v1 adapters, seq 2048).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from magma_tpu.config import MultimodalConfig
from magma_tpu.models.magma import Magma
from magma_tpu.training.train_loop import Trainer

MICRO_B = int(os.environ.get("MICRO_B", "1"))
GA = int(os.environ.get("GA", "1"))

cfg = MultimodalConfig(
    batch_size=MICRO_B * GA, train_steps=4, gradient_accumulation_steps=GA,
    encoder_name="clip_resnet_large",
    adapter_config={"mlp": {"adapter_type": "normal", "downsample_factor": 4}},
    use_image_embed_layernorm=True, image_embed_dropout_prob=0.1,
    image_enc_lr=2.0e-6,
    image_size=384, remat=True, attention_impl="flash",
    lm_overrides=(dict(max_seq_len=int(os.environ["SEQ"]))
                  if os.environ.get("SEQ") else None),
    mesh_dp=1, mesh_tp=1,
    train_lm_int8=os.environ.get("INT8_LM", "0") == "1",
    freeze_img_encoder=os.environ.get("FREEZE_ENC", "0") == "1",
)
print("building model...", flush=True)
model = Magma(cfg)
from magma_tpu.utils import count_parameters, tree_size_bytes
print(f"params {count_parameters(model.params):,}, "
      f"{tree_size_bytes(model.params)/2**30:.1f} GiB, "
      f"trainable {count_parameters(model.params, model.trainable_mask()):,}", flush=True)
trainer = Trainer(model, cfg)

rng = np.random.RandomState(0)
images = rng.rand(MICRO_B * GA, 3, 384, 384).astype(np.float32)
SEQ = int(os.environ.get("SEQ", "2048"))
caps = np.full((MICRO_B * GA, SEQ), 50256, np.int32)
caps[:, :30] = rng.randint(0, 50000, (MICRO_B * GA, 30))

from magma_tpu.observability import device_memory_stats
for d, s in device_memory_stats().items():
    print("pre-step:", d, {k: round(v,2) for k,v in s.items()}, flush=True)
# axon quirk: compiled executables pin their temp arenas; clear init/quantize
# executables before compiling the train step (no-op on real TPU VMs)
jax.clear_caches()
print("compiling train step...", flush=True)
t0 = time.time()
loss = trainer.train_step(images, caps)
print(f"first step (compile) {time.time()-t0:.1f}s loss={loss:.3f}", flush=True)
ts = []
for i in range(3):
    t0 = time.time()
    loss = trainer.train_step(images, caps)
    ts.append(time.time() - t0)
t = sorted(ts)[1]
n_tok = MICRO_B * GA * SEQ
print(f"train step p50: {t:.3f}s, {n_tok/t:.0f} tok/s/chip, loss={loss:.3f}", flush=True)
from magma_tpu.observability import device_memory_stats
for d, s in device_memory_stats().items():
    print(d, {k: round(v,2) for k,v in s.items()}, flush=True)
