"""CLIP ViT-B/32 visual tower in functional JAX.

Parity target: the "clip" encoder in the reference
(magma/image_encoders.py:62 — ``clip.load("ViT-B/32").visual``), whose
pooled output dim is 512 (image_prefix.py:16-21).  Public CLIP ViT-B/32:

* 32x32 conv patch embed (no bias) -> 7x7=49 patches at 224px,
* learned class token + learned position embeddings,
* pre-LN transformer: 12 layers, width 768, 12 heads, MLP 4x, QuickGELU
  (x * sigmoid(1.702 x)),
* ln_post over the class token, then a 768->512 projection matrix.

Unlike the ResNet variants (spatial token sequence), the ViT encoder is
*pooled*: output (b, 512); ImagePrefix then projects to
``out_dim * image_seq_len`` and reshapes (image_prefix.py:67-72, 99-101).

TPU-native: single layer-stacked ``lax.scan`` over the 12 blocks, bf16
matmuls with fp32 LN statistics; attention via the shared ops (the 50-token
sequence is far below flash-kernel territory, so the XLA path is optimal).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from magma_tpu.ops.attention import xla_attention


@dataclasses.dataclass(frozen=True)
class ClipViTConfig:
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512  # projection output
    ln_eps: float = 1e-5
    compute_dtype: object = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    @classmethod
    def named(cls, name: str = "clip", **overrides) -> "ClipViTConfig":
        return cls(**overrides)


def init_params(rng: jax.Array, cfg: ClipViTConfig) -> Tuple[Dict, Dict]:
    """Returns (params, empty-stats) — stats kept for encoder API symmetry."""
    W, L, P = cfg.width, cfg.layers, cfg.patch_size
    k = iter(jax.random.split(rng, 16))
    std = W ** -0.5

    def normal(key, shape, s=0.02):
        return jax.random.normal(key, shape, jnp.float32) * s

    params = {
        "patch_embed": normal(next(k), (P, P, 3, W), (3 * P * P) ** -0.5),
        "class_token": normal(next(k), (W,), std),
        "pos_embed": normal(next(k), (cfg.seq_len, W), std),
        "ln_pre": {"scale": jnp.ones((W,)), "bias": jnp.zeros((W,))},
        "blocks": {
            "ln_1": {"scale": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "attn": {
                "qkv": {"kernel": normal(next(k), (L, W, 3 * W)), "bias": jnp.zeros((L, 3 * W))},
                "out": {"kernel": normal(next(k), (L, W, W)), "bias": jnp.zeros((L, W))},
            },
            "ln_2": {"scale": jnp.ones((L, W)), "bias": jnp.zeros((L, W))},
            "mlp": {
                "fc": {"kernel": normal(next(k), (L, W, 4 * W)), "bias": jnp.zeros((L, 4 * W))},
                "proj": {"kernel": normal(next(k), (L, 4 * W, W)), "bias": jnp.zeros((L, W))},
            },
        },
        "ln_post": {"scale": jnp.ones((W,)), "bias": jnp.zeros((W,))},
        "proj": normal(next(k), (W, cfg.embed_dim), std),
    }
    return params, {}


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def apply(
    params: Dict,
    stats: Dict,
    images: jnp.ndarray,  # (b, 3, H, W)
    cfg: ClipViTConfig,
    *,
    train: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Returns ((b, embed_dim) pooled features, stats unchanged)."""
    del train  # no batch-dependent state in the ViT
    cdt = cfg.compute_dtype
    b = images.shape[0]
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(cdt)  # NHWC
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"].astype(cdt),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(b, cfg.grid * cfg.grid, cfg.width)
    cls = jnp.broadcast_to(
        params["class_token"].astype(jnp.float32), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(jnp.float32)
    x = _ln(x, params["ln_pre"], cfg.ln_eps).astype(cdt)

    h, hd = cfg.heads, cfg.head_dim
    scale = hd ** -0.5

    def block(carry, bp):
        y = carry
        u = _ln(y, bp["ln_1"], cfg.ln_eps).astype(cdt)
        qkv = jnp.dot(u, bp["attn"]["qkv"]["kernel"].astype(cdt))
        qkv = qkv + bp["attn"]["qkv"]["bias"].astype(cdt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = y.shape[1]
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, h, hd)
        v = v.reshape(b, s, h, hd)
        a = xla_attention(q, k, v, scale=scale, causal=False)
        a = jnp.dot(a.reshape(b, s, cfg.width), bp["attn"]["out"]["kernel"].astype(cdt))
        a = a + bp["attn"]["out"]["bias"].astype(cdt)
        y = y + a
        u = _ln(y, bp["ln_2"], cfg.ln_eps).astype(cdt)
        m = jnp.dot(u, bp["mlp"]["fc"]["kernel"].astype(cdt)) + bp["mlp"]["fc"]["bias"].astype(cdt)
        m = _quick_gelu(m)
        m = jnp.dot(m, bp["mlp"]["proj"]["kernel"].astype(cdt)) + bp["mlp"]["proj"]["bias"].astype(cdt)
        return y + m, None

    x, _ = jax.lax.scan(block, x, params["blocks"])

    pooled = _ln(x[:, 0], params["ln_post"], cfg.ln_eps).astype(cdt)
    return jnp.dot(pooled, params["proj"].astype(cdt)), stats
