"""Small shared utilities (parity: scattered across magma/utils.py)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def is_main() -> bool:
    """True on the rank-0 host.  Parity: magma/utils.py:15-18, but driven by
    jax.process_index() instead of torch.distributed."""
    return jax.process_index() == 0


def print_main(*msg: Any) -> None:
    """Rank-0-gated print.  Parity: magma/utils.py:21-23."""
    if is_main():
        print(*msg)


def cycle(loader: Iterable) -> Iterator:
    """Infinite iterator over a (re-iterable) loader.  Parity: utils.py:37-40."""
    while True:
        for data in loader:
            yield data


def count_parameters(params, trainable_mask=None) -> int:
    """Count parameters in a pytree; if a boolean mask pytree is given,
    count only trainable leaves.  Parity: magma/utils.py:241-245 (which
    counts requires_grad params)."""
    leaves = jax.tree_util.tree_leaves(params)
    if trainable_mask is None:
        return sum(int(np.prod(l.shape)) for l in leaves)
    mask_leaves = jax.tree_util.tree_leaves(trainable_mask)
    return sum(
        int(np.prod(l.shape)) for l, m in zip(leaves, mask_leaves) if m
    )


def reduce_mean_across_hosts(x: jnp.ndarray) -> jnp.ndarray:
    """Mean of a replicated scalar across processes.  In the sharded train
    step the loss mean is already global (psum under jit), so this is only
    needed for host-side metrics; parity with magma/utils.py:26-34."""
    return x  # jit-sharded losses are already globally reduced


def get_world_info():
    """(local_rank, rank, world_size) equivalents from the JAX runtime.
    Parity: magma/utils.py:255-259 (env-var world info); here the runtime
    owns topology — one process per host, devices per process."""
    return (
        jax.process_index(),
        jax.process_index(),
        jax.process_count(),
    )


def init_distributed() -> tuple:
    """Multi-host initialization (parity: utils.py:262-269
    deepspeed.init_distributed with NCCL).  On TPU pods this wires the
    JAX distributed runtime; collectives themselves are emitted by XLA
    from sharding annotations — there is no backend to choose."""
    import jax

    if jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process (tests, single host without coordinator)
    return get_world_info()


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tree_size_bytes(params) -> int:
    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params))
