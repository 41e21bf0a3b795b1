"""Trainable/frozen parameter partitioning.

Replaces torch ``requires_grad`` + DeepSpeed param-group plumbing
(magma/magma.py:92-100, utils.py:120-238) with explicit pytree surgery:
``partition`` splits a parameter tree by a boolean mask into a trainable
tree and a frozen tree (complementary ``None`` leaves); gradients are taken
only w.r.t. the trainable tree, so the frozen 6B LM never materializes
gradients or optimizer state.
"""

from __future__ import annotations

from typing import Tuple

import jax


def partition(params, mask) -> Tuple:
    """Split params into (trainable, frozen) by boolean mask pytree.
    ``None`` fills the complementary positions (dropped from tree leaves,
    so optimizers only see trainable arrays)."""
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask
    )
    return trainable, frozen


def combine(trainable, frozen):
    """Inverse of partition."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )
