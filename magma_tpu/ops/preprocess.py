"""Jitted XLA image preprocessing graph.

Replaces the reference's host-side torchvision/PIL pipeline
(magma/transforms.py:121-134): bicubic resize (short side to the encoder's
input resolution), center crop (or center pad), CLIP mean/std
normalization.  Runs on device over uint8 batches — the host only decodes
JPEGs; resize/crop/normalize ride HBM bandwidth and fuse into one XLA
program (the BASELINE.json north star asks for exactly this).

Train-time random augmentations for non-CLIP encoders (RandCropResize +
horizontal flip, transforms.py:42-84) stay host-side in
magma_tpu/data/transforms.py — they are per-sample random crops of
variable-size PIL images, which is host work by nature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("n_px", "normalize"))
def clip_preprocess(images: jnp.ndarray, n_px: int, normalize: bool = True):
    """uint8/float (b, h, w, 3) -> normalized float32 (b, 3, n_px, n_px).

    Semantics of transforms.py:121-134: bicubic resize of the short side to
    n_px, center crop to (n_px, n_px), scale to [0, 1], normalize with the
    CLIP statistics.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = x / 255.0  # integer inputs are [0, 255]; floats pass through

    # resize short side to n_px, preserving aspect (static shapes: computed
    # from the static h/w of this trace)
    if h <= w:
        new_h, new_w = n_px, max(n_px, int(round(w * n_px / h)))
    else:
        new_h, new_w = max(n_px, int(round(h * n_px / w))), n_px
    x = jax.image.resize(x, (b, new_h, new_w, c), method="bicubic")

    # center crop
    top = (new_h - n_px) // 2
    left = (new_w - n_px) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, n_px, n_px, c)
    )

    if normalize:
        mean = jnp.asarray(CLIP_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_STD, jnp.float32)
        x = (x - mean) / std

    return x.transpose(0, 3, 1, 2)  # -> (b, 3, H, W)


def preprocess_uint8_batch(images, n_px: int):
    """Convenience host->device entry: numpy uint8 NHWC -> device NCHW."""
    return clip_preprocess(jnp.asarray(images), n_px)
