"""CLIP's ModifiedResNet visual tower in functional JAX (NHWC).

Parity target: the torch CLIP ResNets the reference loads via ``clip.load``
(magma/image_encoders.py:48-76): RN50, RN50x4 ("clip_resnet"), RN50x16
("clip_resnet_large").  Architecture (public CLIP model):

* 3-conv stem (3x3: 3->w/2 s2, w/2->w/2, w/2->w) each followed by BN+ReLU,
  then 2x2 average pool,
* 4 stages of pre-defined Bottleneck counts; anti-aliased downsampling —
  stride-2 is an average-pool before the 3x3's following conv / before the
  1x1 shortcut conv,
* the attention-pool head is *removed* and replaced by flattening the
  spatial map to a token sequence (reference image_encoders.py:70-74:
  ``rearrange "b d h w -> b (h w) d"``).

Variants:                width  blocks          out_dim  input  tokens
  RN50  ("clip_rn50")      64  (3, 4, 6, 3)      2048     224     49
  RN50x4 ("clip_resnet")   80  (4, 6, 10, 6)     2560     288     81
  RN50x16 ("clip_resnet_large") 96 (6, 8, 18, 8) 3072     384    144

(Reference image_prefix.py:11-14 lists 49 for clip_resnet; the real
RN50x4 at its native 288px resolution yields 9x9=81 spatial positions —
the 49 constant is vestigial there and unused at runtime.  We compute the
sequence length from the actual feature map.)

TPU notes: NHWC layout, bf16 compute with fp32 BN statistics; XLA's conv
emitter tiles convolutions onto the MXU directly, so no hand-written conv
kernels are needed — fusion of BN+ReLU into the conv epilogue is automatic.
BatchNorm is functional: apply returns updated running stats when
``train=True`` (the reference trains the encoder at lr 2e-6,
configs/MAGMA_v1.yml:12).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

VARIANTS = {
    "clip_rn50": dict(width=64, blocks=(3, 4, 6, 3), input_resolution=224),
    "clip_resnet": dict(width=80, blocks=(4, 6, 10, 6), input_resolution=288),
    "clip_resnet_large": dict(width=96, blocks=(6, 8, 18, 8), input_resolution=384),
}
EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class ClipResNetConfig:
    width: int = 96
    blocks: Tuple[int, ...] = (6, 8, 18, 8)
    input_resolution: int = 384
    compute_dtype: object = jnp.bfloat16
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @classmethod
    def named(cls, name: str, **overrides) -> "ClipResNetConfig":
        base = dict(VARIANTS[name])
        base.update(overrides)
        return cls(**base)

    @property
    def out_dim(self) -> int:
        return self.width * 32  # width * 8 planes * expansion 4

    @property
    def out_tokens(self) -> int:
        return (self.input_resolution // 32) ** 2


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5  # he init
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def _conv(x, kernel, stride=1, dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding="SAME" if kernel.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)


def _bn(x, p, s, *, eps, momentum, train):
    """Functional BatchNorm.  x fp32 NHWC.  Returns (y, new_stats)."""
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_s


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: ClipResNetConfig) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    w = cfg.width
    keys = iter(jax.random.split(rng, 4 + sum(cfg.blocks) * 4 + 8))

    params: Dict = {"stem": {}}
    stats: Dict = {"stem": {}}
    stem_chans = [(3, w // 2, 2), (w // 2, w // 2, 1), (w // 2, w, 1)]
    for i, (cin, cout, _stride) in enumerate(stem_chans, start=1):
        params["stem"][f"conv{i}"] = _conv_init(next(keys), 3, 3, cin, cout)
        params["stem"][f"bn{i}"], stats["stem"][f"bn{i}"] = _bn_init(cout)

    cin = w
    for stage, n_blocks in enumerate(cfg.blocks, start=1):
        planes = w * (2 ** (stage - 1))
        cout = planes * EXPANSION
        stage_p: List[Dict] = []
        stage_s: List[Dict] = []
        for b in range(n_blocks):
            stride = (2 if stage > 1 else 1) if b == 0 else 1
            bp: Dict = {
                "conv1": _conv_init(next(keys), 1, 1, cin, planes),
                "conv2": _conv_init(next(keys), 3, 3, planes, planes),
                "conv3": _conv_init(next(keys), 1, 1, planes, cout),
            }
            bs: Dict = {}
            bp["bn1"], bs["bn1"] = _bn_init(planes)
            bp["bn2"], bs["bn2"] = _bn_init(planes)
            bp["bn3"], bs["bn3"] = _bn_init(cout)
            if b == 0 and (stride > 1 or cin != cout):
                bp["down_conv"] = _conv_init(next(keys), 1, 1, cin, cout)
                bp["down_bn"], bs["down_bn"] = _bn_init(cout)
            stage_p.append(bp)
            stage_s.append(bs)
            cin = cout
        params[f"layer{stage}"] = stage_p
        stats[f"layer{stage}"] = stage_s
    return params, stats


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _bottleneck(x, bp, bs, stride, *, cfg, train):
    """CLIP Bottleneck: 1x1 -> 3x3 -> (avgpool if stride) -> 1x1, with an
    avgpool+1x1 shortcut on downsampling blocks."""
    kw = dict(eps=cfg.bn_eps, momentum=cfg.bn_momentum, train=train)
    cdt = cfg.compute_dtype
    new_bs = dict(bs)

    out = _conv(x, bp["conv1"], 1, cdt)
    out, new_bs["bn1"] = _bn(out, bp["bn1"], bs["bn1"], **kw)
    out = jax.nn.relu(out)

    out = _conv(out, bp["conv2"], 1, cdt)
    out, new_bs["bn2"] = _bn(out, bp["bn2"], bs["bn2"], **kw)
    out = jax.nn.relu(out)

    if stride > 1:
        out = _avgpool(out, stride)

    out = _conv(out, bp["conv3"], 1, cdt)
    out, new_bs["bn3"] = _bn(out, bp["bn3"], bs["bn3"], **kw)

    if "down_conv" in bp:
        sc = _avgpool(x, stride) if stride > 1 else x
        sc = _conv(sc, bp["down_conv"], 1, cdt)
        sc, new_bs["down_bn"] = _bn(sc, bp["down_bn"], bs["down_bn"], **kw)
    else:
        sc = x

    return jax.nn.relu(out + sc), new_bs


def apply(
    params: Dict,
    stats: Dict,
    images: jnp.ndarray,  # (b, 3, H, W) — channel-first at the API for
    # reference parity (image_prefix.py:78); transposed to NHWC internally.
    cfg: ClipResNetConfig,
    *,
    train: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Returns ((b, tokens, out_dim) spatial features, new batch stats)."""
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32)
    kw = dict(eps=cfg.bn_eps, momentum=cfg.bn_momentum, train=train)
    new_stats: Dict = {"stem": {}}

    strides = [2, 1, 1]
    for i in range(1, 4):
        x = _conv(x, params["stem"][f"conv{i}"], strides[i - 1], cfg.compute_dtype)
        x, new_stats["stem"][f"bn{i}"] = _bn(
            x, params["stem"][f"bn{i}"], stats["stem"][f"bn{i}"], **kw
        )
        x = jax.nn.relu(x)
    x = _avgpool(x, 2)

    for stage in range(1, 5):
        stage_new = []
        for b, (bp, bs) in enumerate(
            zip(params[f"layer{stage}"], stats[f"layer{stage}"])
        ):
            stride = (2 if stage > 1 else 1) if b == 0 else 1
            x, nbs = _bottleneck(x, bp, bs, stride, cfg=cfg, train=train)
            stage_new.append(nbs)
        new_stats[f"layer{stage}"] = stage_new

    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)  # "b d h w -> b (h w) d" equivalent
    return tokens.astype(cfg.compute_dtype), new_stats
