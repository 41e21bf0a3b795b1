"""Observability: profiler traces, step timing, rank-0 metric helpers.

The reference had only tqdm + wandb scalars (SURVEY.md §5: no tracing or
profiling).  TPU-native additions:

* ``profile_trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace (XLA op-level timeline, HBM usage),
* ``StepTimer``: wall-clock per-step timing with p50/p95 summaries,
* ``log_table``: wandb.Table when wandb is live, plaintext otherwise
  (parity: magma/utils.py:248-253),
* ``device_memory_stats``: per-device HBM live-bytes snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from magma_tpu.utils import is_main


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/magma_tpu_trace"):
    """Capture a jax.profiler trace: ``with profile_trace("dir"): step()``.
    View with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timing for train steps."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def last(self) -> float:
        return self._times[-1] if self._times else float("nan")

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_time_p50": float(np.percentile(arr, 50)),
            "step_time_p95": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / np.mean(arr)),
        }


def log_table(name: str, model_outputs: Sequence[str],
              gt_answers_list: Sequence, global_step: int,
              wandb_module=None) -> None:
    """Eval answers table (parity: utils.py:248-253), wandb-optional."""
    if not is_main():
        return
    if wandb_module is not None:
        table = wandb_module.Table(columns=["model output", "ground truth(s)"])
        for o, gt in zip(model_outputs, gt_answers_list):
            table.add_data(o, gt)
        wandb_module.log({f"eval/{name}": table}, step=global_step)
        return
    print(f"[eval/{name} @ step {global_step}]")
    for o, gt in zip(model_outputs, gt_answers_list):
        print(f"  output: {o!r}  |  gt: {gt!r}")


def make_grid(images: np.ndarray, pad: int = 2) -> np.ndarray:
    """Tile a (b, 3, H, W) batch into one (3, H', W') image for logging
    (parity: torchvision.utils.make_grid used at train_loop.py:93)."""
    images = np.asarray(images)
    b, c, h, w = images.shape
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    grid = np.zeros((c, rows * (h + pad) + pad, cols * (w + pad) + pad),
                    images.dtype)
    for i in range(b):
        r, col = divmod(i, cols)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[:, y:y + h, x:x + w] = images[i]
    return grid


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage in GiB (empty dict on backends without stats)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gib": s.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_in_use_gib": s.get("peak_bytes_in_use", 0) / 2**30,
                "bytes_limit_gib": s.get("bytes_limit", 0) / 2**30,
            }
        except Exception:
            pass
    return out


def summarize_trace(logdir: str, top: int = 20) -> List[Dict[str, object]]:
    """Aggregate a ``jax.profiler.trace`` capture into per-op totals.

    Parses the xplane protobuf directly (the tensorboard profile plugin's
    converter is version-locked to its bundled tensorflow) and returns the
    ``top`` ops of the device plane by total duration:
    ``[{"line", "op", "total_ms", "count"}, ...]``, sorted descending.

    Use with :func:`profile_trace`::

        with profile_trace("/tmp/t"):
            step()
        for row in summarize_trace("/tmp/t")[:10]:
            print(row)
    """
    import glob as _glob
    import os as _os

    # the C++ protobuf rejects mixed-version generated code; the pure-
    # python implementation parses any version.  This only takes effect
    # if protobuf has not been imported yet — otherwise re-raise with an
    # actionable message instead of the opaque descriptor error.
    _os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except TypeError as e:  # "Descriptors cannot be created directly"
        raise RuntimeError(
            "xplane protos need the pure-python protobuf runtime, but "
            "protobuf was already imported with the C++ implementation. "
            "Set PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python in the "
            "environment before starting the process."
        ) from e

    paths = sorted(
        _glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")

    agg: Dict[tuple, float] = {}
    cnt: Dict[tuple, int] = {}
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        device_planes = [
            p for p in xs.planes if "device" in p.name.lower()
        ]
        # the CPU backend records compute under /host:CPU instead
        planes = device_planes or [
            p for p in xs.planes if p.name == "/host:CPU"
        ]
        for plane in planes:
            for line in plane.lines:
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    key = (plane.name, line.name, name)
                    agg[key] = agg.get(key, 0.0) + ev.duration_ps / 1e9
                    cnt[key] = cnt.get(key, 0) + 1
    rows = [
        {"plane": k[0], "line": k[1], "op": k[2],
         "total_ms": round(v, 4), "count": cnt[k]}
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top]
