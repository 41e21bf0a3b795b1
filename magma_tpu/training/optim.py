"""Optimizer + LR schedules: optax AdamW with reference param-group policy.

Parity targets:
* AdamW betas (0.9, 0.95), config weight decay (train.py:96-101),
* weight-decay blacklist: LayerNorm params, embeddings, biases
  (utils.py:120-161),
* a separate learning rate for the image encoder when ``image_enc_lr`` is
  set (utils.py:164-238),
* DeepSpeed scheduler semantics (config.py:101-123): WarmupLR = linear
  warmup min_lr -> lr then constant; WarmupDecayLR = linear warmup then
  linear decay to 0 over ``lr_decay_iters`` total steps,
* global-norm gradient clipping (config gradient_clipping, default 1.0).

TPU-native: instead of mutating a DeepSpeed scheduler dict post-hoc
(utils.py:231-236), parameters are labeled into groups and
``optax.multi_transform`` applies a per-group AdamW.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax

from magma_tpu.config import MultimodalConfig


def make_schedule(config: MultimodalConfig, base_lr: float):
    """DeepSpeed WarmupLR / WarmupDecayLR equivalents."""
    warmup = optax.linear_schedule(
        init_value=config.min_lr,
        end_value=base_lr,
        transition_steps=max(config.warmup_num_steps, 1),
    )
    if config.lr_decay_iters is None:  # WarmupLR: warmup then constant
        return optax.join_schedules(
            [warmup, optax.constant_schedule(base_lr)],
            [config.warmup_num_steps],
        )
    decay_steps = max(config.lr_decay_iters - config.warmup_num_steps, 1)
    decay = optax.linear_schedule(
        init_value=base_lr, end_value=0.0, transition_steps=decay_steps
    )
    return optax.join_schedules([warmup, decay], [config.warmup_num_steps])


def _no_decay(path: str) -> bool:
    """Weight-decay blacklist (utils.py:120-161): layernorms, embeddings,
    biases.  Adapter `scale` scalars and BN params also live here."""
    parts = path.split("/")
    leaf = parts[-1]
    if leaf in ("bias", "scale"):
        return True
    if any(p.startswith("ln") or p.startswith("bn") or p == "down_bn" for p in parts):
        return True
    if leaf in ("wte", "pos_embed", "class_token", "skipinit_gain", "gain"):
        return True
    return False


def _is_image_enc(path: str) -> bool:
    return path.startswith("image_prefix/enc")


def label_params(params) -> Dict:
    """Label pytree for optax.multi_transform: {main,img_enc} x {decay,none}."""

    def fn(path, leaf):
        p = "/".join(str(getattr(x, "key", getattr(x, "idx", x))) for x in path)
        group = "img_enc" if _is_image_enc(p) else "main"
        wd = "none" if _no_decay(p) else "decay"
        return f"{group}_{wd}"

    return jax.tree_util.tree_map_with_path(fn, params)


def make_optimizer(
    config: MultimodalConfig, trainable_params
) -> Tuple[optax.GradientTransformation, Dict]:
    """Build the optimizer over the *trainable* tree.  Returns
    (optimizer, labels).  The reference merges groups by (lr, wd) key
    (utils.py:212-227); multi_transform keys express the same structure."""
    assert config.optimizer_name.lower() == "adamw", config.optimizer_name
    labels = label_params(trainable_params)

    main_lr = make_schedule(config, config.lr)
    enc_lr = make_schedule(
        config,
        config.image_enc_lr if config.image_enc_lr is not None else config.lr,
    )

    def adamw(lr, wd):
        return optax.adamw(
            learning_rate=lr, b1=0.9, b2=0.95, eps=1e-8, weight_decay=wd
        )

    transforms = {
        "main_decay": adamw(main_lr, config.weight_decay),
        "main_none": adamw(main_lr, 0.0),
        "img_enc_decay": adamw(enc_lr, config.weight_decay),
        "img_enc_none": adamw(enc_lr, 0.0),
    }
    opt = optax.multi_transform(transforms, labels)
    if config.gradient_clipping and config.gradient_clipping > 0:
        opt = optax.chain(
            optax.clip_by_global_norm(config.gradient_clipping), opt
        )
    # failure containment: a non-finite gradient (bad batch, overflow) skips
    # the update instead of poisoning the parameters; aborts after 10
    # consecutive bad steps.  Replaces the role of DeepSpeed's dynamic loss
    # scaler recovery (config.py:128) in a bf16 world.
    opt = optax.apply_if_finite(opt, max_consecutive_errors=10)
    return opt, labels
