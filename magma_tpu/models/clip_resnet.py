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
import numpy as np
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
    # init value must be a dtype-matched SCALAR (not an array): the
    # reduce-window-sum autodiff rule only fires on constant-init adds
    return jax.lax.reduce_window(
        x, np.zeros((), jax.dtypes.canonicalize_dtype(x.dtype))[()],
        jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID",
    ) / jnp.asarray(k * k, x.dtype)


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
# Inference-mode BN folding (serving path)
# ---------------------------------------------------------------------------


def fold_bn(params: Dict, stats: Dict, cfg: ClipResNetConfig) -> Dict:
    """Fold inference-mode BatchNorm into the conv kernels: a one-time
    serving transform.  y = BN(conv(x)) == conv(x, W * s) + b with
    s = scale / sqrt(var + eps) per output channel (HWIO's last axis) and
    b = bias - mean * s.

    Why: the training ``apply`` round-trips every conv output through
    fp32 for BN (conv bf16 -> fp32 -> normalize -> bf16) — doubling
    activation HBM traffic on the big early feature maps, and re-casting
    the fp32 master weights to bf16 on every call.  Folded params are
    stored bf16 (kernel and bias), the tower runs bf16 end to end, and
    XLA fuses bias+relu into the conv epilogue.  RN50x16@384 measured
    30.9 -> single-digit ms (BENCH r3).

    Returns a NEW params tree: conv keys become {"kernel", "bias"} and the
    bn entries are dropped.  ``apply`` auto-detects the folded layout.
    """
    eps = cfg.bn_eps

    def fold(conv, bn_p, bn_s):
        inv = (bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)).astype(
            jnp.float32
        )
        return {
            "kernel": (conv.astype(jnp.float32) * inv).astype(jnp.bfloat16),
            "bias": (bn_p["bias"] - bn_s["mean"] * inv).astype(jnp.bfloat16),
        }

    folded: Dict = {"stem": {}}
    for i in range(1, 4):
        folded["stem"][f"conv{i}"] = fold(
            params["stem"][f"conv{i}"],
            params["stem"][f"bn{i}"],
            stats["stem"][f"bn{i}"],
        )
    for stage in range(1, 5):
        blocks = []
        for bp, bs in zip(params[f"layer{stage}"], stats[f"layer{stage}"]):
            fb = {
                f"conv{j}": fold(bp[f"conv{j}"], bp[f"bn{j}"], bs[f"bn{j}"])
                for j in (1, 2, 3)
            }
            if "down_conv" in bp:
                fb["down_conv"] = fold(
                    bp["down_conv"], bp["down_bn"], bs["down_bn"]
                )
            blocks.append(fb)
        folded[f"layer{stage}"] = blocks
    return folded


def is_folded(params: Dict) -> bool:
    return isinstance(params["stem"]["conv1"], dict)


def _fconv(x, p, stride=1):
    """Folded conv: bf16 conv + bias, no fp32 round-trip."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride, stride),
        padding="SAME" if p["kernel"].shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _bottleneck_folded(x, bp, stride):
    out = jax.nn.relu(_fconv(x, bp["conv1"]))
    out = jax.nn.relu(_fconv(out, bp["conv2"]))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _fconv(out, bp["conv3"])
    if "down_conv" in bp:
        sc = _avgpool(x, stride) if stride > 1 else x
        sc = _fconv(sc, bp["down_conv"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _apply_folded(params, images, cfg):
    x = jnp.transpose(images, (0, 2, 3, 1)).astype(cfg.compute_dtype)
    strides = [2, 1, 1]
    for i in range(1, 4):
        x = jax.nn.relu(
            _fconv(x, params["stem"][f"conv{i}"], strides[i - 1])
        )
    x = _avgpool(x, 2)
    for stage in range(1, 5):
        for b, bp in enumerate(params[f"layer{stage}"]):
            stride = (2 if stage > 1 else 1) if b == 0 else 1
            x = _bottleneck_folded(x, bp, stride)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c).astype(cfg.compute_dtype)


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
    if is_folded(params):  # serving copy (fold_bn): bf16 end to end
        assert not train, "folded params are inference-only"
        return _apply_folded(params, images, cfg), stats
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
