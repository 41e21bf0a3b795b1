"""NF-ResNet50 (normalizer-free ResNet) in functional JAX.

Parity target: the "nfresnet50" encoder — timm's ``nf_resnet50`` with its
classifier head removed and adaptive average pooling appended
(magma/image_encoders.py:31-45), pooled output dim 2048
(image_prefix.py:16-21).

Architecture per Brock et al., "Characterizing signal propagation to close
the gap in unnormalized ResNets" (arXiv:2101.08692), matching timm's
structure:

* stem: 7x7/2 scaled-weight-standardized (WS) conv + ReLU + 3x3/2 max pool,
* 4 stages of bottleneck blocks (3, 4, 6, 3), widths 256/512/1024/2048,
* no normalization layers anywhere: every conv is WS (weight standardized
  with learnable per-output-channel gain), activations are
  variance-preserving scaled ReLU (gamma = sqrt(2 / (1 - 1/pi))),
* residual: ``h = h + alpha * f(h / beta)`` with alpha = 0.2 and beta
  tracking the accumulated variance, reset at each transition block,
* learnable per-block ``skipinit_gain`` initialized to 0.

Normalizer-free design is a particularly good fit for TPU training: no
cross-batch statistics means the whole tower is a pure function — no
mutable state to thread, and per-device batch statistics never diverge
under data parallelism.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

GAMMA_RELU = 1.7139588594436646  # sqrt(2 / (1 - 1/pi))
ALPHA = 0.2


@dataclasses.dataclass(frozen=True)
class NFResNetConfig:
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    input_resolution: int = 256
    compute_dtype: object = jnp.bfloat16

    @property
    def out_dim(self) -> int:
        return self.width * 32

    @classmethod
    def named(cls, name: str = "nfresnet50", **overrides) -> "NFResNetConfig":
        return cls(**overrides)


def _ws_conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        * (fan_in ** -0.5),
        "gain": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _ws_conv(x, p, stride=1, dtype=jnp.bfloat16):
    """Scaled weight-standardized conv: kernel is standardized over its
    fan-in at apply time, scaled by a learnable gain."""
    k = p["kernel"].astype(jnp.float32)
    kh, kw, cin, cout = k.shape
    fan_in = kh * kw * cin
    mean = k.mean(axis=(0, 1, 2), keepdims=True)
    var = k.var(axis=(0, 1, 2), keepdims=True)
    k = (k - mean) * jax.lax.rsqrt(var * fan_in + 1e-4)
    k = k * p["gain"].reshape(1, 1, 1, cout)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype),
        window_strides=(stride, stride),
        padding="SAME" if kh > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    return y + p["bias"]


def _act(x):
    return jax.nn.relu(x) * GAMMA_RELU


def init_params(rng: jax.Array, cfg: NFResNetConfig) -> Tuple[Dict, Dict]:
    """Returns (params, empty-stats)."""
    w = cfg.width
    keys = iter(jax.random.split(rng, 8 + sum(cfg.blocks) * 8))
    params: Dict = {"stem": _ws_conv_init(next(keys), 7, 7, 3, w)}

    cin = w
    for stage, n_blocks in enumerate(cfg.blocks, start=1):
        planes = w * (2 ** (stage - 1))
        cout = planes * 4
        blocks: List[Dict] = []
        for b in range(n_blocks):
            stride = (2 if stage > 1 else 1) if b == 0 else 1
            bp = {
                "conv1": _ws_conv_init(next(keys), 1, 1, cin, planes),
                "conv2": _ws_conv_init(next(keys), 3, 3, planes, planes),
                "conv3": _ws_conv_init(next(keys), 1, 1, planes, cout),
                "skipinit_gain": jnp.zeros((), jnp.float32),
            }
            if b == 0 and (stride > 1 or cin != cout):
                bp["down"] = _ws_conv_init(next(keys), 1, 1, cin, cout)
            blocks.append(bp)
            cin = cout
        params[f"layer{stage}"] = blocks
    return params, {}


def apply(
    params: Dict,
    stats: Dict,
    images: jnp.ndarray,  # (b, 3, H, W)
    cfg: NFResNetConfig,
    *,
    train: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Returns ((b, out_dim) pooled features, stats unchanged)."""
    del train
    cdt = cfg.compute_dtype
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
    x = _ws_conv(x, params["stem"], 2, cdt)
    x = _act(x)
    # 3x3/2 max pool, SAME padding
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )

    expected_var = 1.0
    for stage in range(1, 5):
        for b, bp in enumerate(params[f"layer{stage}"]):
            stride = (2 if stage > 1 else 1) if b == 0 else 1
            beta = expected_var ** 0.5
            out = _act(x / beta)
            if "down" in bp:
                shortcut = _ws_conv(
                    out if stage > 1 else x,  # transition blocks use the
                    # normalized+activated input for the shortcut (paper §4)
                    bp["down"], stride, cdt,
                )
                expected_var = 1.0  # variance reset at transition
            else:
                shortcut = x
            h = _ws_conv(out, bp["conv1"], 1, cdt)
            h = _act(h)
            h = _ws_conv(h, bp["conv2"], stride, cdt)
            h = _act(h)
            h = _ws_conv(h, bp["conv3"], 1, cdt)
            x = shortcut + ALPHA * bp["skipinit_gain"] * h
            expected_var = expected_var + ALPHA ** 2

    x = _act(x)
    pooled = x.mean(axis=(1, 2))  # adaptive avg pool to (1, 1), flattened
    return pooled.astype(cdt), stats
