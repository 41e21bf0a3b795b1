"""Device mesh construction.

Replaces the reference's NCCL/DeepSpeed world setup (train.py:76,
utils.py:262-269): instead of per-process ranks, a single
``jax.sharding.Mesh`` with ("dp", "tp") axes over ICI.  Data parallelism is
batch sharding over "dp" (the reference's only strategy — SURVEY.md §2b);
tensor parallelism over "tp" is the natural JAX upgrade for fitting the
frozen 6B LM on small slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh — plus an "sp" axis when sp > 1 (sequence
    / context parallelism: ring attention shards the sequence over it, see
    parallel/ring_attention.py).  dp == -1 means all remaining devices.

    For multi-host pods call ``jax.distributed.initialize()`` first; the
    mesh then spans all processes' devices and XLA routes collectives over
    ICI (and DCN across hosts) automatically.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (tp * sp) == 0, \
            f"{n} devices not divisible by tp*sp={tp * sp}"
        dp = n // (tp * sp)
    assert dp * tp * sp == n, \
        f"dp({dp}) * tp({tp}) * sp({sp}) != devices({n})"
    if sp == 1:
        arr = np.asarray(devices).reshape(dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))
    # sp innermost: ring ppermute hops ride neighbouring ICI links
    arr = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))
