"""ImagePrefix: image batch -> sequence of LM-dimension embeddings.

Parity target: magma/image_prefix.py:24-109 and the encoder factory
magma/image_encoders.py:79-91.

* spatial encoders (CLIP ResNets) emit (b, s, enc_dim); a single linear
  projects enc_dim -> lm_dim (image_prefix.py:67-72),
* pooled encoders (CLIP ViT "clip", NF-ResNet50) emit (b, enc_dim); the
  linear projects to ``lm_dim * image_seq_len`` and the result is reshaped
  to (b, image_seq_len, lm_dim) (image_prefix.py:99-101),
* optional dropout then optional LayerNorm (image_prefix.py:73-76, v1
  config uses dropout 0.1 + layernorm, configs/MAGMA_v1.yml:13-14).

Reference ENCODER_OUT_DIMS parity (image_prefix.py:16-21):
nfresnet50=2048, clip=512, clip_resnet=2560, clip_resnet_large=3072.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from magma_tpu.models import clip_resnet, clip_vit, nfnet

# name -> (module, config factory kwargs, pooled?)
_ENCODERS = {
    "clip": (clip_vit, "ClipViTConfig", True),
    "clip_resnet": (clip_resnet, "ClipResNetConfig", False),
    "clip_resnet_large": (clip_resnet, "ClipResNetConfig", False),
    "clip_rn50": (clip_resnet, "ClipResNetConfig", False),
    "nfresnet50": (nfnet, "NFResNetConfig", True),
}


def get_encoder(name: str, overrides: Optional[dict] = None):
    """Encoder registry.  Parity: get_image_encoder
    (image_encoders.py:79-91).  Returns (module, config)."""
    if name not in _ENCODERS:
        raise ValueError(f"image encoder {name} not recognized")
    module, _, pooled = _ENCODERS[name]
    overrides = dict(overrides or {})
    if module is clip_resnet:
        cfg = clip_resnet.ClipResNetConfig.named(name, **overrides)
    elif module is clip_vit:
        cfg = clip_vit.ClipViTConfig.named(name, **overrides)
    else:
        cfg = nfnet.NFResNetConfig.named(name, **overrides)
    return module, cfg, pooled


@dataclasses.dataclass(frozen=True)
class ImagePrefixConfig:
    encoder_name: str = "clip_resnet_large"
    out_dim: int = 4096            # LM hidden size
    image_seq_len: int = 2         # used only for pooled encoders
    dropout_prob: float = 0.0
    use_layernorm: bool = False
    encoder_overrides: Optional[tuple] = None  # tuple(sorted(dict.items()))
    compute_dtype: object = jnp.bfloat16

    @property
    def encoder(self):
        ov = dict(self.encoder_overrides) if self.encoder_overrides else {}
        return get_encoder(self.encoder_name, ov)

    @property
    def out_seq_len(self) -> int:
        module, enc_cfg, pooled = self.encoder
        if pooled:
            return self.image_seq_len
        return enc_cfg.out_tokens

    @property
    def input_resolution(self) -> int:
        return self.encoder[1].input_resolution


def init_params(rng: jax.Array, cfg: ImagePrefixConfig) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    module, enc_cfg, pooled = cfg.encoder
    k_enc, k_proj = jax.random.split(rng)
    enc_params, enc_stats = module.init_params(k_enc, enc_cfg)

    proj_out = cfg.out_dim * cfg.image_seq_len if pooled else cfg.out_dim
    enc_dim = enc_cfg.out_dim
    params = {
        "enc": enc_params,
        "proj": {
            "kernel": jax.random.normal(k_proj, (enc_dim, proj_out), jnp.float32)
            * (enc_dim ** -0.5),
            "bias": jnp.zeros((proj_out,), jnp.float32),
        },
    }
    if cfg.use_layernorm:
        params["ln"] = {
            "scale": jnp.ones((cfg.out_dim,), jnp.float32),
            "bias": jnp.zeros((cfg.out_dim,), jnp.float32),
        }
    return params, {"enc": enc_stats}


def fold_for_serving(
    params: Dict, stats: Dict, cfg: ImagePrefixConfig
) -> Dict:
    """Serving transform: fold the encoder's inference-mode BN into its
    conv weights (CLIP ResNets — see clip_resnet.fold_bn) and store the
    projection in bf16, so the whole vision path runs bf16 without fp32
    weight re-casts.  Returns a new params tree; ``apply`` with
    ``train=False`` consumes it unchanged (stats become pass-through)."""
    module, enc_cfg, _pooled = cfg.encoder
    out = dict(params)
    if module is clip_resnet and not clip_resnet.is_folded(params["enc"]):
        out["enc"] = clip_resnet.fold_bn(params["enc"], stats["enc"], enc_cfg)
    out["proj"] = {
        "kernel": params["proj"]["kernel"].astype(jnp.bfloat16),
        "bias": params["proj"]["bias"].astype(jnp.bfloat16),
    }
    return out


def apply(
    params: Dict,
    stats: Dict,
    images: jnp.ndarray,  # (b, 3, H, W)
    cfg: ImagePrefixConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Returns ((b, out_seq_len, out_dim) embeddings, new batch stats)."""
    module, enc_cfg, pooled = cfg.encoder
    cdt = cfg.compute_dtype

    feats, new_enc_stats = module.apply(
        params["enc"], stats["enc"], images, enc_cfg, train=train
    )

    x = jnp.dot(feats.astype(cdt), params["proj"]["kernel"].astype(cdt))
    x = x + params["proj"]["bias"].astype(cdt)

    b = x.shape[0]
    if pooled:
        x = x.reshape(b, cfg.image_seq_len, cfg.out_dim)

    if train and cfg.dropout_prob > 0.0:
        assert dropout_rng is not None, "dropout needs an rng in training"
        keep = jax.random.bernoulli(dropout_rng, 1.0 - cfg.dropout_prob, x.shape)
        x = jnp.where(keep, x / (1.0 - cfg.dropout_prob), 0.0).astype(cdt)

    if "ln" in params:
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        x32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        x = (
            x32 * params["ln"]["scale"] + params["ln"]["bias"]
        ).astype(cdt)

    return x, {"enc": new_enc_stats}
