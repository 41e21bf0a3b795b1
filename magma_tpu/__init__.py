"""magma_tpu — a TPU-native JAX/XLA/Pallas vision-language framework.

Provides the full capability surface of Aleph-Alpha/magma (frozen GPT-J 6B
decoder + CLIP/NFNet image encoders + trainable adapters, trained with a
next-token loss over image-caption data, served with KV-cached sampling),
re-designed TPU-first:

* functional parameter pytrees instead of in-place module mutation
  (reference: magma/magma.py:102-174 mutates blocks via setattr),
* ``jax.sharding.Mesh`` + jit-sharded data/tensor parallelism over ICI
  instead of DeepSpeed ZeRO-2/NCCL (reference: train.py:103-111),
* bf16 numerics instead of fp16 + dynamic loss scaling,
* Pallas flash-attention kernels and a jitted decode loop instead of
  eager per-token torch calls (reference: magma/sampling.py:43-121),
* Orbax checkpointing plus a converter for the published torch checkpoint.

Public API parity with ``from magma import Magma`` (reference:
magma/__init__.py:1-20).
"""

from magma_tpu.config import MultimodalConfig, load_config
from magma_tpu.tokenizer import get_tokenizer
from magma_tpu.utils import count_parameters, is_main, print_main, cycle

__version__ = "0.1.0"

_LAZY = {
    "Magma": ("magma_tpu.models.magma", "Magma"),
    "MagmaClassifier": ("magma_tpu.models.classifier", "MagmaClassifier"),
    "Trainer": ("magma_tpu.training.train_loop", "Trainer"),
    "ImageInput": ("magma_tpu.data.image_input", "ImageInput"),
    "ImgCptDataset": ("magma_tpu.data.dataset", "ImgCptDataset"),
    "collate_fn": ("magma_tpu.data.dataset", "collate_fn"),
    "convert_dataset": ("magma_tpu.data.convert", "convert_dataset"),
    "BatchLoader": ("magma_tpu.data.loader", "BatchLoader"),
    "make_mesh": ("magma_tpu.parallel.mesh", "make_mesh"),
    "get_transforms": ("magma_tpu.data.transforms", "get_transforms"),
    "load_pretrained_encoder": (
        "magma_tpu.training.torch_convert", "load_pretrained_encoder"
    ),
    "LMServingEngine": ("magma_tpu.serving.engine", "LMServingEngine"),
    "MagmaServingEngine": ("magma_tpu.serving.engine", "MagmaServingEngine"),
}


def __getattr__(name):
    # Lazy imports keep `import magma_tpu` light (no PIL/orbax cost for
    # kernel-only users) and avoid import cycles.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'magma_tpu' has no attribute {name!r}")

__all__ = [
    "MultimodalConfig",
    "load_config",
    "get_tokenizer",
    "Magma",
    "ImageInput",
    "ImgCptDataset",
    "collate_fn",
    "count_parameters",
    "is_main",
    "print_main",
    "cycle",
]
