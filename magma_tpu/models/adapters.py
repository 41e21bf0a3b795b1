"""Bottleneck adapters (PEFT), functional-style.

Parity target: magma/adapters.py:6-116 — four variants:

* ``normal`` post-adapter:   ``y = f(x); y + adapter(y)``   (Adapter /
  AdapterWrapper semantics: reference adapters.py:38-39, 110-116)
* ``parallel``:              ``f(x) + adapter(x)``          (ParallelAdapter,
  adapters.py:62-66)
* ``scaled_parallel``:       ``f(x) + scale * adapter(x)``  with a learned
  scalar scale (adapters.py:57-60)

where ``adapter(x) = up(act(down(maybe_ln(x))))`` — a bottleneck MLP with
near-zero init: N(0, std=1e-3) clamped to ±2 std on both weights and biases
(adapters.py:28-36), so the frozen LM starts unperturbed.

TPU-native design: instead of mutating module attributes at runtime
(reference magma/magma.py:102-174 setattr injection), adapters are part of
the parameter pytree from init; layer-stacked with a leading layer axis so
the block scan consumes them directly.  Application is a pure function
taking (params, branch_input, branch_output).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

ADAPTER_TYPES = ("normal", "parallel", "scaled_parallel")


@dataclasses.dataclass(frozen=True)
class AdapterSpec:
    """Static adapter configuration for one location (mlp or attention)."""

    adapter_type: str = "normal"
    downsample_factor: int = 4
    add_layernorm: bool = False
    init_std: float = 1e-3

    def __post_init__(self):
        if self.adapter_type not in ADAPTER_TYPES:
            raise ValueError(
                f"adapter_type must be one of {ADAPTER_TYPES}, got {self.adapter_type}"
            )

    @classmethod
    def from_dict(cls, d: dict) -> "AdapterSpec":
        """Build from a reference-style config dict, e.g.
        {"adapter_type": "normal", "downsample_factor": 4}
        (configs/MAGMA_v1.yml:4)."""
        d = dict(d)
        return cls(
            adapter_type=d.pop("adapter_type"),
            downsample_factor=d.pop("downsample_factor", 4),
            add_layernorm=d.pop("add_layernorm", False),
            init_std=d.pop("init_std", 1e-3),
        )


def init_adapter(
    rng: jax.Array, spec: AdapterSpec, dim: int, n_layers: int, dtype=jnp.float32
) -> dict:
    """Init adapter params for all layers at once (leading axis = layer).

    Near-zero clamped normal init per reference adapters.py:28-36.
    """
    hidden = dim // spec.downsample_factor
    keys = jax.random.split(rng, 4)
    std = spec.init_std

    def clamped_normal(key, shape):
        w = jax.random.normal(key, shape, jnp.float32) * std
        return jnp.clip(w, -2 * std, 2 * std).astype(dtype)

    params = {
        "down": {
            "kernel": clamped_normal(keys[0], (n_layers, dim, hidden)),
            "bias": clamped_normal(keys[1], (n_layers, hidden)),
        },
        "up": {
            "kernel": clamped_normal(keys[2], (n_layers, hidden, dim)),
            "bias": clamped_normal(keys[3], (n_layers, dim)),
        },
    }
    if spec.add_layernorm:
        params["ln"] = {
            "scale": jnp.ones((n_layers, dim), dtype),
            "bias": jnp.zeros((n_layers, dim), dtype),
        }
    if spec.adapter_type == "scaled_parallel":
        params["scale"] = jnp.ones((n_layers,), dtype)
    return params


def _proj(x: jnp.ndarray, kernel, compute_dtype) -> jnp.ndarray:
    """Bottleneck projection; ``kernel`` is a raw array or an int8-packed
    {"q", "s"} dict (serving — gptj._serving_cast_adapters)."""
    if isinstance(kernel, dict):
        from magma_tpu.ops.quant import int8_matmul

        return int8_matmul(x, kernel["q"], kernel["s"],
                           out_dtype=compute_dtype)
    return jnp.dot(x, kernel.astype(compute_dtype))


def _bottleneck(params: dict, x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """up(relu(down(maybe_ln(x)))) for a single layer's (unstacked) params."""
    h = x
    if "ln" in params:
        h32 = h.astype(jnp.float32)
        mean = h32.mean(-1, keepdims=True)
        var = h32.var(-1, keepdims=True)
        h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (
            h32 * params["ln"]["scale"].astype(jnp.float32)
            + params["ln"]["bias"].astype(jnp.float32)
        ).astype(compute_dtype)
    h = _proj(h, params["down"]["kernel"], compute_dtype) + params["down"][
        "bias"
    ].astype(compute_dtype)
    h = jax.nn.relu(h)
    h = _proj(h, params["up"]["kernel"], compute_dtype) + params["up"][
        "bias"
    ].astype(compute_dtype)
    return h


def apply_adapter(
    params: Optional[dict],
    spec: Optional[AdapterSpec],
    branch_in: jnp.ndarray,
    branch_out: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Combine a block branch (attn or mlp output) with its adapter.

    branch_in  — the branch's input (post-LN hidden state u)
    branch_out — the branch's output f(u)

    normal:           f(u) + bottleneck(f(u))   (residual folded in by caller's
                                                 block residual; matches
                                                 Sequential(mlp, Adapter) where
                                                 Adapter adds its own input)
    parallel:         f(u) + bottleneck(u)
    scaled_parallel:  f(u) + scale * bottleneck(u)
    """
    if params is None or spec is None:
        return branch_out
    if "fused" in params:
        # serving layout (gptj._serving_cast_adapters mode="fused_int8"):
        # int8 bottleneck in ONE Pallas launch; the scaled_parallel scalar
        # is pre-folded into the up scales at quantization time
        from magma_tpu.ops.quant import fused_adapter_stacked

        src = branch_out if spec.adapter_type == "normal" else branch_in
        # params["idx"] (not .get): a call path that forgets to inject the
        # layer index must fail loudly, not silently evaluate layer 0's
        # adapter for every layer
        z = fused_adapter_stacked(
            src, params["fused"], params["idx"],
            out_dtype=compute_dtype,
        )
        return branch_out + z
    if spec.adapter_type == "normal":
        return branch_out + _bottleneck(params, branch_out, compute_dtype)
    z = _bottleneck(params, branch_in, compute_dtype)
    if spec.adapter_type == "scaled_parallel":
        z = z * params["scale"].astype(compute_dtype)
    return branch_out + z
