"""Native (C++) image loader bindings: decode + preprocess off the PIL path.

The reference's data loading leans on native code in its dependencies
(torch DataLoader C++ workers, PIL's C decoders — magma/datasets/
dataset.py:133-142).  This package is the framework's own native
equivalent: ``loader.cc`` decodes JPEG/PNG and runs the full CLIP
preprocess (antialiased bicubic short-side resize, center crop,
normalize, CHW) in one GIL-free C call per image, so the Python worker
pool in data/loader.py scales across cores.

The shared library builds lazily on first use with the system toolchain
(g++ + libjpeg/libpng, all baked into the image) and is cached next to
the source.  Every entry point degrades cleanly: ``available()`` is False
when the toolchain or headers are missing and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "loader.cc"
_SO = _DIR / "_loader.so"
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None

# CLIP normalization constants (reference magma/transforms.py:121-134)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
NO_MEAN = np.zeros(3, np.float32)
NO_STD = np.ones(3, np.float32)


def _build() -> Optional[str]:
    """Compile loader.cc -> _loader.so.  Returns an error string or None.

    Builds to a process-unique temp name and os.replace()s it into place:
    concurrent processes racing the first build each produce a complete
    library and atomically install it, instead of one dlopen'ing the
    other's half-written output."""
    tmp = _SO.with_suffix(f".so.{os.getpid()}.tmp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
        "-o", str(tmp), "-ljpeg", "-lpng",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        tmp.unlink(missing_ok=True)  # a killed g++ leaves a partial file
        return f"g++ unavailable: {e}"
    if proc.returncode != 0:
        tmp.unlink(missing_ok=True)
        return proc.stderr[-2000:]
    os.replace(tmp, _SO)
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not _SO.exists() or (_SRC.exists()
                                and _SRC.stat().st_mtime > _SO.stat().st_mtime):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            _build_error = str(e)
            return None
        lib.mtl_load_clip.restype = ctypes.c_int
        lib.mtl_load_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mtl_decode.restype = ctypes.c_long
        lib.mtl_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native loader compiled and loaded."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_clip(path, size: int, normalize: bool = True) -> np.ndarray:
    """Decode ``path`` and CLIP-preprocess to (1, 3, size, size) float32.

    Raises IOError on unreadable/undecodable files (the dataset's
    corrupt-sample fallback catches it like a PIL error).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((3, size, size), np.float32)
    mean, std = (CLIP_MEAN, CLIP_STD) if normalize else (NO_MEAN, NO_STD)
    rc = lib.mtl_load_clip(str(path).encode(), size, _fptr(mean), _fptr(std),
                           _fptr(out))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out[None]


def decode(path) -> np.ndarray:
    """Decode ``path`` to an (h, w, 3) uint8 RGB array (no preprocessing).

    Decodes once for typical images: the first call gets a generous
    buffer (12 MP); only larger images pay a second decode at the exact
    size (a cap-too-small query call would otherwise decode everything
    twice)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    cap = 12 * 1024 * 1024 * 3
    buf = np.empty(cap, np.uint8)
    need = lib.mtl_decode(str(path).encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), cap, ctypes.byref(w),
        ctypes.byref(h))
    if need < 0:
        raise IOError(f"native decode failed ({need}): {path}")
    if need > cap:  # rare: image over 12 MP — decode again at exact size
        buf = np.empty(need, np.uint8)
        got = lib.mtl_decode(str(path).encode(), buf.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), need, ctypes.byref(w),
            ctypes.byref(h))
        if got != need:
            raise IOError(f"native decode failed ({got}): {path}")
        return buf.reshape(h.value, w.value, 3)  # exact-size: no copy
    return buf[:need].reshape(h.value, w.value, 3).copy()


class NativeClipTransform:
    """Path -> (1, 3, n_px, n_px) float32, fully native (decode included).

    Drop-in for the PIL-based clip_transform when the input is a file
    path; datasets detect ``wants_path`` and skip the PIL open entirely.
    """

    wants_path = True

    def __init__(self, n_px: int):
        self.n_px = n_px
        self._pil_fallback = None

    def _fallback(self):
        if self._pil_fallback is None:
            from magma_tpu.data.transforms import clip_transform

            self._pil_fallback = clip_transform(self.n_px)
        return self._pil_fallback

    def __call__(self, path) -> np.ndarray:
        if not isinstance(path, (str, os.PathLike)):
            # PIL image fell through (e.g. URL inputs): use the PIL path
            return self._fallback()(path)
        try:
            return load_clip(path, self.n_px)
        except IOError:
            # formats the native decoder does not handle (WebP, BMP,
            # TIFF, CMYK JPEG, ...) go through PIL instead of being
            # dropped; PIL raises its own error for truly corrupt files
            from PIL import Image

            with Image.open(path) as img:
                return self._fallback()(img.convert("RGB"))
