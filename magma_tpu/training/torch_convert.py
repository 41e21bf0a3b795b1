"""Torch-checkpoint converter: published MAGMA weights -> magma_tpu pytree.

The published checkpoint (magma/magma.py:278-301) is a DeepSpeed
``mp_rank_00_model_states.pt`` whose ``sd["module"]`` holds a torch
state dict over the reference module tree:

    lm.transformer.wte.weight                        (50258, 4096)
    lm.transformer.h.{i}.ln_1.{weight,bias}
    lm.transformer.h.{i}.attn.attention.{q,k,v}_proj.weight
    lm.transformer.h.{i}.attn.attention.out_proj.{weight,bias}
    lm.transformer.h.{i}.mlp.c_fc.{weight,bias}          (no mlp adapter)
    lm.transformer.h.{i}.mlp.0.c_fc.{weight,bias}        (with mlp adapter:
    lm.transformer.h.{i}.mlp.1.adapter.{j}.{weight,bias}  Sequential(mlp, Adapter),
                                                          magma.py:141-148)
    lm.transformer.h.{i}.attn.attn_block.attention...    (with attention
    lm.transformer.h.{i}.attn.adapter.{j}...              AdapterWrapper,
    lm.transformer.h.{i}.attn.adapter_scale               magma.py:153-169)
    lm.transformer.ln_f.{weight,bias}
    lm.lm_head.weight                                    (tied; ignored)
    image_prefix.proj.{weight,bias}
    image_prefix.ln.{weight,bias}
    image_prefix.enc.<CLIP visual naming>

Conversions applied:
* torch Linear weight (out, in) -> kernel (in, out) transpose,
* torch Conv2d (out, in, kh, kw) -> HWIO (kh, kw, in, out),
* per-layer tensors stacked on the leading layer axis (our blocks are
  lax.scan-stacked),
* wte zero-padded from vocab 50258 to the MXU-padded vocab,
* BN running stats split into the batch-stats tree.

Adapter Sequential indices: without layernorm the bottleneck Linears sit at
``adapter.0`` / ``adapter.2``; with layernorm at ``adapter.1`` /
``adapter.3`` (reference adapters.py:15-26).

``to_torch_state_dict`` emits the same naming from our pytree; the round
trip is tested, and the export also lets reference-side tooling consume
TPU-trained adapters.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _to_numpy_fast(v) -> np.ndarray:
    """torch tensor / array -> numpy, widening fp16 -> fp32 through
    XLA:CPU.  numpy's and torch's half converters run soft-float on some
    hosts (measured ~2M elem/s on a vCPU without a fast F16C path — a 6B
    fp16 checkpoint would take ~20 min); XLA:CPU emits vectorized
    conversion code (~160M elem/s) and IEEE 754 semantics are identical.
    Falls back to numpy when no CPU backend is available."""
    a = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    if a.dtype == np.float16 and a.size > (1 << 16):
        try:
            import jax
            import jax.numpy as jnp

            with jax.default_device(jax.devices("cpu")[0]):
                a = np.asarray(jnp.asarray(a).astype(jnp.float32))
        except Exception:
            a = np.asarray(a, np.float32)
    return a


def _t(x) -> np.ndarray:  # torch Linear -> kernel
    return np.asarray(x).T


def _conv(x) -> np.ndarray:  # OIHW -> HWIO
    return np.asarray(x).transpose(2, 3, 1, 0)


def _adapter_linear_idx(add_layernorm: bool) -> Tuple[int, int]:
    return (1, 3) if add_layernorm else (0, 2)


# ---------------------------------------------------------------------------
# LM import
# ---------------------------------------------------------------------------


def _lm_from_torch(sd: Dict, lm_cfg, prefix: str = "lm.transformer.") -> Dict:
    import jax.numpy as jnp

    L = lm_cfg.n_layers
    Vp = lm_cfg.padded_vocab_size
    pd = lm_cfg.param_dtype

    def get(name):
        return np.asarray(sd[prefix + name], np.float32)

    apd = getattr(lm_cfg, "adapter_param_dtype", pd)
    mlp_ad = lm_cfg.mlp_adapter
    attn_ad = lm_cfg.attn_adapter
    mlp_base = "mlp.0." if mlp_ad is not None else "mlp."
    attn_base = (
        "attn.attn_block.attention."
        if (attn_ad is not None and attn_ad.adapter_type == "normal")
        else "attn.module.attention."
        if attn_ad is not None
        else "attn.attention."
    )

    def stack(fn):
        return np.stack([fn(i) for i in range(L)], axis=0)

    wte = get("wte.weight")
    if wte.shape[0] < Vp:
        wte = np.concatenate(
            [wte, np.zeros((Vp - wte.shape[0], wte.shape[1]), np.float32)], 0
        )

    params = {
        "wte": jnp.asarray(wte, pd),
        "ln_f": {
            "scale": jnp.asarray(get("ln_f.weight"), pd),
            "bias": jnp.asarray(get("ln_f.bias"), pd),
        },
        "blocks": {
            "ln_1": {
                "scale": jnp.asarray(stack(lambda i: get(f"h.{i}.ln_1.weight")), pd),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.ln_1.bias")), pd),
            },
            "attn": {
                "q": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{attn_base}q_proj.weight"))), pd
                ),
                "k": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{attn_base}k_proj.weight"))), pd
                ),
                "v": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{attn_base}v_proj.weight"))), pd
                ),
                "o": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{attn_base}out_proj.weight"))), pd
                ),
            },
            "mlp": {
                "fc_in": {
                    "kernel": jnp.asarray(
                        stack(lambda i: _t(get(f"h.{i}.{mlp_base}c_fc.weight"))), pd
                    ),
                    "bias": jnp.asarray(
                        stack(lambda i: get(f"h.{i}.{mlp_base}c_fc.bias")), pd
                    ),
                },
                "fc_out": {
                    "kernel": jnp.asarray(
                        stack(lambda i: _t(get(f"h.{i}.{mlp_base}c_proj.weight"))), pd
                    ),
                    "bias": jnp.asarray(
                        stack(lambda i: get(f"h.{i}.{mlp_base}c_proj.bias")), pd
                    ),
                },
            },
        },
    }
    if lm_cfg.attn_out_bias:
        params["blocks"]["attn"]["o_bias"] = jnp.asarray(
            stack(lambda i: get(f"h.{i}.{attn_base}out_proj.bias")), pd
        )

    if mlp_ad is not None:
        d, u = _adapter_linear_idx(mlp_ad.add_layernorm)
        base = "mlp.1.adapter."
        ad = {
            "down": {
                "kernel": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{base}{d}.weight"))), apd
                ),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}{d}.bias")), apd),
            },
            "up": {
                "kernel": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{base}{u}.weight"))), apd
                ),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}{u}.bias")), apd),
            },
        }
        if mlp_ad.add_layernorm:
            ad["ln"] = {
                "scale": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}0.weight")), apd),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}0.bias")), apd),
            }
        params["blocks"]["adapter_mlp"] = ad

    if attn_ad is not None:
        d, u = _adapter_linear_idx(attn_ad.add_layernorm)
        base = "attn.adapter."
        ad = {
            "down": {
                "kernel": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{base}{d}.weight"))), apd
                ),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}{d}.bias")), apd),
            },
            "up": {
                "kernel": jnp.asarray(
                    stack(lambda i: _t(get(f"h.{i}.{base}{u}.weight"))), apd
                ),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}{u}.bias")), apd),
            },
        }
        if attn_ad.add_layernorm:
            ad["ln"] = {
                "scale": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}0.weight")), apd),
                "bias": jnp.asarray(stack(lambda i: get(f"h.{i}.{base}0.bias")), apd),
            }
        if attn_ad.adapter_type == "scaled_parallel":
            ad["scale"] = jnp.asarray(
                stack(lambda i: get(f"h.{i}.attn.adapter_scale")).reshape(L), apd
            )
        params["blocks"]["adapter_attn"] = ad

    return params


# ---------------------------------------------------------------------------
# CLIP ResNet visual import
# ---------------------------------------------------------------------------


def _bn_from_torch(sd, name) -> Tuple[Dict, Dict]:
    import jax.numpy as jnp

    return (
        {
            "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32)),
        },
        {
            "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"], np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"], np.float32)),
        },
    )


def _clip_resnet_from_torch(
    sd: Dict, enc_cfg, prefix: str = "image_prefix.enc."
) -> Tuple[Dict, Dict]:
    import jax.numpy as jnp

    def get(name):
        return sd[prefix + name]

    params: Dict = {"stem": {}}
    stats: Dict = {"stem": {}}
    for i in (1, 2, 3):
        params["stem"][f"conv{i}"] = jnp.asarray(_conv(get(f"conv{i}.weight")))
        params["stem"][f"bn{i}"], stats["stem"][f"bn{i}"] = _bn_from_torch(
            sd, f"{prefix}bn{i}"
        )

    for stage, n_blocks in enumerate(enc_cfg.blocks, start=1):
        stage_p, stage_s = [], []
        for b in range(n_blocks):
            base = f"layer{stage}.{b}."
            bp: Dict = {}
            bs: Dict = {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = jnp.asarray(_conv(get(f"{base}conv{c}.weight")))
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn_from_torch(
                    sd, f"{prefix}{base}bn{c}"
                )
            if f"{prefix}{base}downsample.0.weight" in sd:
                bp["down_conv"] = jnp.asarray(
                    _conv(get(f"{base}downsample.0.weight"))
                )
                bp["down_bn"], bs["down_bn"] = _bn_from_torch(
                    sd, f"{prefix}{base}downsample.1"
                )
            stage_p.append(bp)
            stage_s.append(bs)
        params[f"layer{stage}"] = stage_p
        stats[f"layer{stage}"] = stage_s
    return params, stats


# ---------------------------------------------------------------------------
# CLIP ViT-B/32 visual import (OpenAI CLIP naming)
# ---------------------------------------------------------------------------


def _clip_vit_from_torch(sd: Dict, enc_cfg, prefix: str) -> Dict:
    """OpenAI CLIP VisionTransformer state dict -> clip_vit pytree.

    Naming per ``clip.load("ViT-B/32").visual`` (the reference's "clip"
    encoder, image_encoders.py:62): conv1 patch embed, class_embedding,
    positional_embedding, ln_pre/ln_post, transformer.resblocks.{i} with
    torch-MHA fused in_proj, and the final (W, embed_dim) ``proj`` matrix
    (stored un-transposed: applied as ``x @ proj``).
    """
    import jax.numpy as jnp

    L = enc_cfg.layers

    def get(name):
        return np.asarray(sd[prefix + name], np.float32)

    def stack(fmt, f=lambda x: x):
        return np.stack([f(get(fmt.format(i=i))) for i in range(L)], axis=0)

    rb = "transformer.resblocks.{i}."
    return {
        "patch_embed": jnp.asarray(_conv(get("conv1.weight"))),
        "class_token": jnp.asarray(get("class_embedding")),
        "pos_embed": jnp.asarray(get("positional_embedding")),
        "ln_pre": {
            "scale": jnp.asarray(get("ln_pre.weight")),
            "bias": jnp.asarray(get("ln_pre.bias")),
        },
        "blocks": {
            "ln_1": {
                "scale": jnp.asarray(stack(rb + "ln_1.weight")),
                "bias": jnp.asarray(stack(rb + "ln_1.bias")),
            },
            # torch MHA in_proj rows are [q; k; v]; transposing gives
            # columns [q | k | v], matching clip_vit's split on the last axis
            "attn": {
                "qkv": {
                    "kernel": jnp.asarray(stack(rb + "attn.in_proj_weight", _t)),
                    "bias": jnp.asarray(stack(rb + "attn.in_proj_bias")),
                },
                "out": {
                    "kernel": jnp.asarray(stack(rb + "attn.out_proj.weight", _t)),
                    "bias": jnp.asarray(stack(rb + "attn.out_proj.bias")),
                },
            },
            "ln_2": {
                "scale": jnp.asarray(stack(rb + "ln_2.weight")),
                "bias": jnp.asarray(stack(rb + "ln_2.bias")),
            },
            "mlp": {
                "fc": {
                    "kernel": jnp.asarray(stack(rb + "mlp.c_fc.weight", _t)),
                    "bias": jnp.asarray(stack(rb + "mlp.c_fc.bias")),
                },
                "proj": {
                    "kernel": jnp.asarray(stack(rb + "mlp.c_proj.weight", _t)),
                    "bias": jnp.asarray(stack(rb + "mlp.c_proj.bias")),
                },
            },
        },
        "ln_post": {
            "scale": jnp.asarray(get("ln_post.weight")),
            "bias": jnp.asarray(get("ln_post.bias")),
        },
        "proj": jnp.asarray(get("proj")),
    }


# ---------------------------------------------------------------------------
# NF-ResNet50 import (timm naming)
# ---------------------------------------------------------------------------


def _nf_resnet_from_torch(sd: Dict, enc_cfg, prefix: str) -> Dict:
    """timm ``nf_resnet50`` state dict -> nfnet pytree.

    Naming per timm's NormFreeNet (the reference's "nfresnet50" encoder,
    image_encoders.py:31-45): ``stem.conv`` + ``stages.{s}.{b}.conv{1,2,3}``
    ScaledStdConv2d entries ({weight, gain (cout,1,1,1), bias}) and
    ``downsample.conv``.  timm builds nf_resnet50 without skipinit, so a
    missing ``skipinit_gain`` imports as 1.0 (our residual
    ``shortcut + alpha * gain * f(x)`` then matches timm's
    ``shortcut + alpha * f(x)``); when present it is used as stored.
    """
    import jax.numpy as jnp

    def ws(base):
        return {
            "kernel": jnp.asarray(_conv(np.asarray(sd[base + ".weight"], np.float32))),
            "gain": jnp.asarray(
                np.asarray(sd[base + ".gain"], np.float32).reshape(-1)
            ),
            "bias": jnp.asarray(np.asarray(sd[base + ".bias"], np.float32)),
        }

    params: Dict = {"stem": ws(prefix + "stem.conv")}
    for stage, n_blocks in enumerate(enc_cfg.blocks, start=1):
        blocks = []
        for b in range(n_blocks):
            base = f"{prefix}stages.{stage - 1}.{b}."
            gain_key = base + "skipinit_gain"
            bp = {
                "conv1": ws(base + "conv1"),
                "conv2": ws(base + "conv2"),
                "conv3": ws(base + "conv3"),
                "skipinit_gain": jnp.asarray(
                    np.float32(sd[gain_key]) if gain_key in sd else np.float32(1.0)
                ).reshape(()),
            }
            if base + "downsample.conv.weight" in sd:
                bp["down"] = ws(base + "downsample.conv")
            blocks.append(bp)
        params[f"layer{stage}"] = blocks
    return params


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def convert_state_dict(
    sd: Dict, lm_cfg, prefix_cfg
) -> Tuple[Dict, Optional[Dict]]:
    """Torch state dict (numpy-convertible values) -> (params, state)."""
    import jax.numpy as jnp

    params = {"lm": _lm_from_torch(sd, lm_cfg)}
    state = None

    ip: Dict = {
        "proj": {
            "kernel": jnp.asarray(_t(sd["image_prefix.proj.weight"])),
            "bias": jnp.asarray(np.asarray(sd["image_prefix.proj.bias"], np.float32)),
        }
    }
    if "image_prefix.ln.weight" in sd:
        ip["ln"] = {
            "scale": jnp.asarray(np.asarray(sd["image_prefix.ln.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd["image_prefix.ln.bias"], np.float32)),
        }

    ip["enc"], enc_stats = convert_encoder_state_dict(
        sd, prefix_cfg, prefix="image_prefix.enc."
    )
    if enc_stats is not None:
        state = {"image_prefix": {"enc": enc_stats}}

    params["image_prefix"] = ip
    return params, state


def convert_encoder_state_dict(
    sd: Dict, prefix_cfg, prefix: str = ""
) -> Tuple[Dict, Optional[Dict]]:
    """Encoder-only torch state dict -> (params, batch_stats_or_None).

    Covers all four reference encoder options (image_encoders.py:31-76):
    CLIP ResNets (checkpoint naming), CLIP ViT-B/32 ("clip", OpenAI
    naming — pass ``prefix="visual."`` for a raw CLIP model checkpoint),
    and timm nf_resnet50.  Stats are only produced by the BN-bearing
    ResNets; the ViT and NF nets are stateless.
    """
    name = prefix_cfg.encoder_name
    module, enc_cfg, _ = prefix_cfg.encoder
    if name.startswith("clip_resnet") or name == "clip_rn50":
        return _clip_resnet_from_torch(sd, enc_cfg, prefix=prefix)
    if name == "clip":
        return _clip_vit_from_torch(sd, enc_cfg, prefix), None
    if name == "nfresnet50":
        return _nf_resnet_from_torch(sd, enc_cfg, prefix), None
    raise NotImplementedError(f"torch import for encoder {name} not wired")


def load_pretrained_encoder(model, path_or_sd, prefix: str = "auto") -> None:
    """Populate ``model.params["image_prefix"]["enc"]`` (and BN stats) from
    a published torch checkpoint of the *encoder tower alone* — e.g. an
    OpenAI CLIP model file or a timm nf_resnet50 checkpoint.  Mirrors the
    reference's pretrained tower loading (image_encoders.py:48-76
    ``clip.load``, :31-45 timm ``pretrained=True``), which magma_tpu cannot
    do implicitly in an air-gapped environment.

    ``prefix="auto"`` detects the OpenAI CLIP ``visual.`` nesting.
    """
    if isinstance(path_or_sd, (str,)) or hasattr(path_or_sd, "__fspath__"):
        import torch

        sd = torch.load(str(path_or_sd), map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        sd = path_or_sd
    sd = {k: _to_numpy_fast(v) for k, v in sd.items()}
    if prefix == "auto":
        prefix = "visual." if any(k.startswith("visual.") for k in sd) else ""
    enc_params, enc_stats = convert_encoder_state_dict(
        sd, model.prefix_config, prefix=prefix
    )
    model.params["image_prefix"]["enc"] = enc_params
    if enc_stats is not None:
        model.state["image_prefix"]["enc"] = enc_stats


def load_torch_checkpoint(path: str, params_template, lm_cfg, prefix_cfg):
    """Load an ``mp_rank_00_model_states.pt`` file (parity:
    magma.py:288-297 incl. the ``sd["module"]`` unwrap) and convert.

    Returns ``(params, state)``.  ``state`` carries the encoder's BN
    running statistics (the reference loads them as ordinary state-dict
    entries, magma.py:292-297); it is None only for stat-free encoders.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "module" in sd:
        sd = sd["module"]
    sd = {k: _to_numpy_fast(v) for k, v in sd.items()}
    return convert_state_dict(sd, lm_cfg, prefix_cfg)


# ---------------------------------------------------------------------------
# export (round-trip testing + sharing TPU-trained adapters back)
# ---------------------------------------------------------------------------


def to_torch_state_dict(params: Dict, state: Optional[Dict], lm_cfg, prefix_cfg) -> Dict:
    """Our pytree -> reference-named numpy state dict (inverse mapping)."""
    out: Dict[str, np.ndarray] = {}
    lm = params["lm"]
    L = lm_cfg.n_layers

    out["lm.transformer.wte.weight"] = np.asarray(
        lm["wte"][: lm_cfg.vocab_size], np.float32
    )
    out["lm.transformer.ln_f.weight"] = np.asarray(lm["ln_f"]["scale"], np.float32)
    out["lm.transformer.ln_f.bias"] = np.asarray(lm["ln_f"]["bias"], np.float32)

    mlp_ad, attn_ad = lm_cfg.mlp_adapter, lm_cfg.attn_adapter
    mlp_base = "mlp.0." if mlp_ad is not None else "mlp."
    attn_base = (
        "attn.attn_block.attention."
        if (attn_ad is not None and attn_ad.adapter_type == "normal")
        else "attn.module.attention."
        if attn_ad is not None
        else "attn.attention."
    )
    b = lm["blocks"]
    for i in range(L):
        p = f"lm.transformer.h.{i}."
        out[p + "ln_1.weight"] = np.asarray(b["ln_1"]["scale"][i], np.float32)
        out[p + "ln_1.bias"] = np.asarray(b["ln_1"]["bias"][i], np.float32)
        for name, key in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                          ("out_proj", "o")):
            out[p + attn_base + name + ".weight"] = _t(
                np.asarray(b["attn"][key][i], np.float32)
            )
        if "o_bias" in b["attn"]:
            out[p + attn_base + "out_proj.bias"] = np.asarray(
                b["attn"]["o_bias"][i], np.float32
            )
        out[p + mlp_base + "c_fc.weight"] = _t(
            np.asarray(b["mlp"]["fc_in"]["kernel"][i], np.float32)
        )
        out[p + mlp_base + "c_fc.bias"] = np.asarray(
            b["mlp"]["fc_in"]["bias"][i], np.float32
        )
        out[p + mlp_base + "c_proj.weight"] = _t(
            np.asarray(b["mlp"]["fc_out"]["kernel"][i], np.float32)
        )
        out[p + mlp_base + "c_proj.bias"] = np.asarray(
            b["mlp"]["fc_out"]["bias"][i], np.float32
        )

        for ad_key, ad_spec, base in (
            ("adapter_mlp", mlp_ad, "mlp.1.adapter."),
            ("adapter_attn", attn_ad, "attn.adapter."),
        ):
            if ad_spec is None or ad_key not in b:
                continue
            d, u = _adapter_linear_idx(ad_spec.add_layernorm)
            ad = b[ad_key]
            out[p + base + f"{d}.weight"] = _t(
                np.asarray(ad["down"]["kernel"][i], np.float32)
            )
            out[p + base + f"{d}.bias"] = np.asarray(
                ad["down"]["bias"][i], np.float32
            )
            out[p + base + f"{u}.weight"] = _t(
                np.asarray(ad["up"]["kernel"][i], np.float32)
            )
            out[p + base + f"{u}.bias"] = np.asarray(ad["up"]["bias"][i], np.float32)
            if ad_spec.add_layernorm:
                out[p + base + "0.weight"] = np.asarray(
                    ad["ln"]["scale"][i], np.float32
                )
                out[p + base + "0.bias"] = np.asarray(ad["ln"]["bias"][i], np.float32)
            if "scale" in ad and ad_spec.adapter_type == "scaled_parallel":
                out[p + "attn.adapter_scale"] = np.asarray(
                    ad["scale"][i], np.float32
                ).reshape(1)

    ip = params["image_prefix"]
    out["image_prefix.proj.weight"] = _t(np.asarray(ip["proj"]["kernel"], np.float32))
    out["image_prefix.proj.bias"] = np.asarray(ip["proj"]["bias"], np.float32)
    if "ln" in ip:
        out["image_prefix.ln.weight"] = np.asarray(ip["ln"]["scale"], np.float32)
        out["image_prefix.ln.bias"] = np.asarray(ip["ln"]["bias"], np.float32)

    if "enc" in ip and prefix_cfg.encoder_name == "clip":
        _clip_vit_to_torch(out, ip["enc"], "image_prefix.enc.")
    elif "enc" in ip and prefix_cfg.encoder_name == "nfresnet50":
        _nf_resnet_to_torch(out, ip["enc"], "image_prefix.enc.")
    elif "enc" in ip and "stem" in ip["enc"]:
        enc = ip["enc"]
        enc_stats = (state or {}).get("image_prefix", {}).get("enc", {})

        def put_bn(name, p_bn, s_bn):
            out[name + ".weight"] = np.asarray(p_bn["scale"], np.float32)
            out[name + ".bias"] = np.asarray(p_bn["bias"], np.float32)
            out[name + ".running_mean"] = np.asarray(s_bn["mean"], np.float32)
            out[name + ".running_var"] = np.asarray(s_bn["var"], np.float32)

        for i in (1, 2, 3):
            out[f"image_prefix.enc.conv{i}.weight"] = np.asarray(
                enc["stem"][f"conv{i}"], np.float32
            ).transpose(3, 2, 0, 1)
            put_bn(
                f"image_prefix.enc.bn{i}",
                enc["stem"][f"bn{i}"],
                enc_stats.get("stem", {}).get(f"bn{i}", _zero_bn(enc["stem"][f"bn{i}"])),
            )
        stage = 1
        while f"layer{stage}" in enc:
            for bi, bp in enumerate(enc[f"layer{stage}"]):
                base = f"image_prefix.enc.layer{stage}.{bi}."
                bs = (
                    enc_stats.get(f"layer{stage}", [{}] * (bi + 1))[bi]
                    if enc_stats
                    else {}
                )
                for c in (1, 2, 3):
                    out[base + f"conv{c}.weight"] = np.asarray(
                        bp[f"conv{c}"], np.float32
                    ).transpose(3, 2, 0, 1)
                    put_bn(
                        base + f"bn{c}", bp[f"bn{c}"],
                        bs.get(f"bn{c}", _zero_bn(bp[f"bn{c}"])),
                    )
                if "down_conv" in bp:
                    out[base + "downsample.0.weight"] = np.asarray(
                        bp["down_conv"], np.float32
                    ).transpose(3, 2, 0, 1)
                    put_bn(
                        base + "downsample.1", bp["down_bn"],
                        bs.get("down_bn", _zero_bn(bp["down_bn"])),
                    )
            stage += 1
    return out


def _zero_bn(p_bn) -> Dict:
    c = np.asarray(p_bn["scale"]).shape[0]
    return {"mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32)}


def _clip_vit_to_torch(out: Dict, enc: Dict, prefix: str) -> None:
    """clip_vit pytree -> OpenAI CLIP VisionTransformer naming (inverse of
    _clip_vit_from_torch)."""
    out[prefix + "conv1.weight"] = np.asarray(
        enc["patch_embed"], np.float32
    ).transpose(3, 2, 0, 1)
    out[prefix + "class_embedding"] = np.asarray(enc["class_token"], np.float32)
    out[prefix + "positional_embedding"] = np.asarray(enc["pos_embed"], np.float32)
    for ln in ("ln_pre", "ln_post"):
        out[prefix + ln + ".weight"] = np.asarray(enc[ln]["scale"], np.float32)
        out[prefix + ln + ".bias"] = np.asarray(enc[ln]["bias"], np.float32)
    out[prefix + "proj"] = np.asarray(enc["proj"], np.float32)

    b = enc["blocks"]
    L = np.asarray(b["ln_1"]["scale"]).shape[0]
    for i in range(L):
        p = f"{prefix}transformer.resblocks.{i}."
        for ln in ("ln_1", "ln_2"):
            out[p + ln + ".weight"] = np.asarray(b[ln]["scale"][i], np.float32)
            out[p + ln + ".bias"] = np.asarray(b[ln]["bias"][i], np.float32)
        out[p + "attn.in_proj_weight"] = _t(
            np.asarray(b["attn"]["qkv"]["kernel"][i], np.float32)
        )
        out[p + "attn.in_proj_bias"] = np.asarray(
            b["attn"]["qkv"]["bias"][i], np.float32
        )
        out[p + "attn.out_proj.weight"] = _t(
            np.asarray(b["attn"]["out"]["kernel"][i], np.float32)
        )
        out[p + "attn.out_proj.bias"] = np.asarray(
            b["attn"]["out"]["bias"][i], np.float32
        )
        out[p + "mlp.c_fc.weight"] = _t(
            np.asarray(b["mlp"]["fc"]["kernel"][i], np.float32)
        )
        out[p + "mlp.c_fc.bias"] = np.asarray(b["mlp"]["fc"]["bias"][i], np.float32)
        out[p + "mlp.c_proj.weight"] = _t(
            np.asarray(b["mlp"]["proj"]["kernel"][i], np.float32)
        )
        out[p + "mlp.c_proj.bias"] = np.asarray(
            b["mlp"]["proj"]["bias"][i], np.float32
        )


def _nf_resnet_to_torch(out: Dict, enc: Dict, prefix: str) -> None:
    """nfnet pytree -> timm NormFreeNet naming (inverse of
    _nf_resnet_from_torch)."""

    def put_ws(base, p):
        out[base + ".weight"] = np.asarray(p["kernel"], np.float32).transpose(
            3, 2, 0, 1
        )
        out[base + ".gain"] = np.asarray(p["gain"], np.float32).reshape(-1, 1, 1, 1)
        out[base + ".bias"] = np.asarray(p["bias"], np.float32)

    put_ws(prefix + "stem.conv", enc["stem"])
    stage = 1
    while f"layer{stage}" in enc:
        for bi, bp in enumerate(enc[f"layer{stage}"]):
            base = f"{prefix}stages.{stage - 1}.{bi}."
            for c in (1, 2, 3):
                put_ws(base + f"conv{c}", bp[f"conv{c}"])
            out[base + "skipinit_gain"] = np.asarray(
                bp["skipinit_gain"], np.float32
            ).reshape(())
            if "down" in bp:
                put_ws(base + "downsample.conv", bp["down"])
        stage += 1


def main():  # pragma: no cover
    """CLI: python -m magma_tpu.training.torch_convert ckpt.pt out_dir
    [--config configs/MAGMA_v1.yml]"""
    import argparse

    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma
    from magma_tpu.training import checkpoint as ckpt

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default="configs/MAGMA_v1.yml")
    args = ap.parse_args()

    model = Magma(MultimodalConfig.from_yml(args.config), init_weights=True)
    params, state = load_torch_checkpoint(
        args.ckpt, model.params, model.lm_config, model.prefix_config
    )
    ckpt.save_checkpoint(args.out_dir, 0, params, state or model.state)
    print(f"converted {args.ckpt} -> {args.out_dir}")


if __name__ == "__main__":  # pragma: no cover
    main()
