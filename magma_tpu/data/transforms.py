"""Host-side image transforms (PIL -> numpy), feeding the device pipeline.

Parity target: magma/transforms.py.  Two pipelines:

* **CLIP encoders** (transforms.py:121-134): deterministic bicubic resize +
  center crop (or pad) + CLIP normalize.  Here the PIL image is decoded to
  a uint8 array on the host and the resize/crop/normalize run as a jitted
  XLA graph on device (ops/preprocess.py) — the TPU-native replacement for
  torchvision.
* **non-CLIP encoders** (transforms.py:42-84): DALL-E-style RandCropResize
  + random horizontal flip at train time.  These are per-sample random PIL
  ops and stay on host, emitting float32 arrays.
"""

from __future__ import annotations

import random
from typing import Callable

import numpy as np

from magma_tpu.ops.preprocess import clip_preprocess


def _to_rgb(img):
    return img.convert("RGB") if img.mode != "RGB" else img


def _pil_to_uint8(img) -> np.ndarray:
    return np.asarray(_to_rgb(img), dtype=np.uint8)


def clip_transform(n_px: int, use_pad: bool = False) -> Callable:
    """PIL image -> (1, 3, n_px, n_px) float32 numpy, CLIP-normalized.

    The heavy lifting (bicubic resize, crop, normalize) is the jitted XLA
    graph; use_pad pads-to-square first instead of center-cropping
    (transforms.py:94-118 pad_img path).
    """

    def fn(img):
        img = _to_rgb(img)
        if use_pad:
            from PIL import Image

            w, h = img.size
            ratio = n_px / max(w, h)
            img = img.resize(
                (max(1, int(w * ratio)), max(1, int(h * ratio))),
                Image.BICUBIC,
            )
            canvas = Image.new("RGB", (n_px, n_px))
            canvas.paste(
                img, ((n_px - img.size[0]) // 2, (n_px - img.size[1]) // 2)
            )
            img = canvas
        arr = _pil_to_uint8(img)[None]  # (1, h, w, 3)
        return np.asarray(clip_preprocess(arr, n_px))

    return fn


class RandCropResize:
    """Random crop -> random resize -> random crop (arXiv:2102.12092 augs).

    Parity: transforms.py:42-61.
    """

    def __init__(self, target_size: int):
        self.target_size = target_size

    def _pad_to_size(self, img, size):
        from PIL import ImageOps

        dw, dh = size - img.size[0], size - img.size[1]
        if dw <= 0 and dh <= 0:
            return img
        dw, dh = max(dw, 0), max(dh, 0)
        return ImageOps.expand(img, (dw // 2, dh // 2, dw - dw // 2, dh - dh // 2))

    def _random_crop(self, img, size):
        w, h = img.size
        left = random.randint(0, max(0, w - size))
        top = random.randint(0, max(0, h - size))
        return img.crop((left, top, left + size, top + size))

    def __call__(self, img):
        from PIL import Image

        img = self._pad_to_size(img, self.target_size)
        d_min = min(img.size)
        img = self._random_crop(img, d_min)
        t_min = min(d_min, round(9 / 8 * self.target_size))
        t_max = min(d_min, round(12 / 8 * self.target_size))
        t = random.randint(t_min, t_max + 1)
        ratio = t / min(img.size)
        img = img.resize(
            (max(1, round(img.size[0] * ratio)), max(1, round(img.size[1] * ratio))),
            Image.BICUBIC,
        )
        if min(img.size) < self.target_size:
            ratio = self.target_size / min(img.size)
            img = img.resize(
                (
                    max(self.target_size, round(img.size[0] * ratio)),
                    max(self.target_size, round(img.size[1] * ratio)),
                ),
                Image.BICUBIC,
            )
        return self._random_crop(img, self.target_size)


def color_jitter(arr: np.ndarray, brightness=0.1, contrast=0.1,
                 saturation=0.1, hue=0.05) -> np.ndarray:
    """Random color jitter on a float [0,1] HWC array (parity:
    transforms.py:75-76 T.ColorJitter(0.1, 0.1, 0.1, 0.05))."""
    b = 1.0 + random.uniform(-brightness, brightness)
    c = 1.0 + random.uniform(-contrast, contrast)
    s = 1.0 + random.uniform(-saturation, saturation)
    h = random.uniform(-hue, hue)

    arr = arr * b
    mean = arr.mean()
    arr = (arr - mean) * c + mean
    gray = arr.mean(axis=-1, keepdims=True)
    arr = (arr - gray) * s + gray
    if h:
        # cheap hue shift: rotate channels fractionally
        shift = arr[..., [1, 2, 0]] - arr
        arr = arr + h * shift
    return np.clip(arr, 0.0, 1.0)


def train_transform(image_size: int, use_extra_transforms: bool = False) -> Callable:
    """Non-CLIP train-time pipeline (transforms.py:64-84): RGB convert,
    RandCropResize, optional color jitter, random hflip, float [0,1]."""
    rcr = RandCropResize(image_size)

    def fn(img):
        img = _to_rgb(img)
        img = rcr(img)
        arr = _pil_to_uint8(img).astype(np.float32) / 255.0
        if use_extra_transforms:
            arr = color_jitter(arr)
        if random.random() < 0.5:
            arr = arr[:, ::-1]
        return arr.transpose(2, 0, 1)[None]  # (1, 3, H, W)

    return fn


def get_transforms(
    image_size: int,
    encoder_name: str,
    input_resolution: int = None,
    use_extra_transforms: bool = False,
    native: bool = None,
) -> Callable:
    """Transform factory.  Parity: transforms.py:64-84 + get_transforms
    dispatch in magma/magma.py:66-70: CLIP encoders use the deterministic
    CLIP preprocess at the encoder's native resolution; others use the
    random-crop train pipeline at config.image_size.

    ``native`` selects the C++ decode+preprocess path (magma_tpu/native)
    for the deterministic CLIP pipeline: one GIL-free call per image,
    ~2x a PIL+XLA-CPU worker and immune to per-image-shape recompiles.
    Default (None) = use it when the shared library builds; it degrades
    to the PIL path per-call for non-path inputs (e.g. URL images)."""
    if "clip" in encoder_name:
        assert input_resolution is not None
        if native is None or native:
            from magma_tpu import native as native_mod

            if native_mod.available():
                return native_mod.NativeClipTransform(input_resolution)
            if native:  # explicitly requested
                raise RuntimeError(
                    f"native loader unavailable: {native_mod.build_error()}"
                )
        return clip_transform(input_resolution)
    return train_transform(image_size, use_extra_transforms)
