"""Sharding rules: parameter PartitionSpecs by pytree path.

Replaces DeepSpeed ZeRO-2's optimizer/grad partitioning
(magma/config.py:124-134): parameters get Megatron-style tensor-parallel
layouts over the "tp" mesh axis, batches shard over "dp", and XLA inserts
the all-reduces/all-gathers.  Optimizer state inherits the parameter
shardings (created under jit from sharded params), which subsumes ZeRO's
state partitioning without bespoke machinery.

LM rules (GPT-J block, params from models/gptj.py — leading axis L is the
layer-stack):
  wte            (V, D)      -> P("tp", None)     vocab-sharded embedding
  attn q/k/v     (L, D, D)   -> P(None, None, "tp")  head-sharded
  attn o         (L, D, D)   -> P(None, "tp", None)  row-sharded (psum out)
  mlp fc_in      (L, D, F)   -> P(None, None, "tp")  column-parallel
  mlp fc_out     (L, F, D)   -> P(None, "tp", None)  row-parallel
  biases of sharded-out layers shard on the same axis; LN / adapters /
  vision tower replicate (tiny relative to the LM).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def _raw_lm_spec(path: str) -> P:
    """Spec for a raw (unquantized) LM weight path."""
    if path.endswith("wte"):
        return P("tp", None)
    if "adapter" in path:
        return P()  # adapters are tiny; replicate
    if path.endswith("lm_head_q"):
        return P(None, "tp")  # (D, padded_vocab): vocab-sharded head
    if "/attn/" in path:
        if path.endswith(("/q", "/k", "/v", "/qkv", "/in_proj")):
            return P(None, None, "tp")
        if path.endswith("/o"):
            return P(None, "tp", None)
        return P()  # o_bias
    if "/mlp/fc_in/kernel" in path:
        return P(None, None, "tp")
    if "/mlp/fc_in/bias" in path:
        return P(None, "tp")
    if "/mlp/fc_out/kernel" in path:
        return P(None, "tp", None)
    return P()  # ln_1, ln_f, fc_out bias, anything else: replicated


def lm_param_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one LM parameter, by path substring.

    Quantized weights appear as {"q": int8 kernel, "s": per-out-channel
    scales} sub-leaves: the int8 payload takes the kernel's spec; the
    scales take the kernel spec minus its contraction (second-to-last)
    axis."""
    if path.endswith(("/q", "/s")) and not path.endswith(
        ("attn/q", "attn/s")  # raw attn "q" projection keeps its own rule
    ):
        kernel_spec = _raw_lm_spec(path[:-2])
        if path.endswith("/q"):
            return kernel_spec
        axes = list(kernel_spec)
        if len(axes) >= 2:
            axes.pop(-2)  # drop the contraction-dim entry
        return P(*axes)
    return _raw_lm_spec(path)


def param_spec(path: str, ndim: int) -> P:
    if path.startswith("lm"):
        return lm_param_spec(path, ndim)
    return P()  # image prefix + encoder: replicated


def make_param_shardings(mesh: Mesh, params) -> Dict:
    """NamedSharding pytree matching ``params``."""

    def fn(path, leaf):
        return NamedSharding(mesh, param_spec(_path_str(path), leaf.ndim))

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_params(mesh: Mesh, params):
    """Place a parameter pytree onto the mesh with its canonical layout."""
    shardings = make_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_lm_params(mesh: Mesh, lm_params):
    """Place a bare LM parameter tree (no "lm/" prefix) onto the mesh
    with Megatron-style tensor-parallel layouts — the serving engine's
    placement (serving/engine.py)."""

    def fn(path, leaf):
        return jax.device_put(
            leaf,
            NamedSharding(
                mesh, lm_param_spec("lm/" + _path_str(path), leaf.ndim)
            ),
        )

    return jax.tree_util.tree_map_with_path(fn, lm_params)


def kv_cache_spec(name: str) -> P:
    """Spec for one KV-cache entry: K/V (L, b, max_len, h, hd) shard over
    heads (matching the head-sharded q/k/v projections); the
    position-minor int8 scales (L, b, h, max_len) shard on their h axis."""
    if name.endswith("_scale"):
        return P(None, None, "tp", None)
    return P(None, None, None, "tp", None)


def shard_kv_cache(mesh: Mesh, cache):
    """Place a gptj.init_kv_cache pytree onto the mesh head-sharded."""
    return {
        name: jax.device_put(v, NamedSharding(mesh, kv_cache_spec(name)))
        for name, v in cache.items()
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batches shard their leading axis across data parallelism."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
