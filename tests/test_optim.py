"""Optimizer/schedule tests (reference param-group policy, utils.py:120-238)."""

import jax.numpy as jnp
import numpy as np

from magma_tpu.config import MultimodalConfig
from magma_tpu.training.optim import label_params, make_optimizer, make_schedule


def _cfg(**kw):
    base = dict(batch_size=2, train_steps=10)
    base.update(kw)
    return MultimodalConfig(**base)


def test_warmup_lr_schedule():
    cfg = _cfg(lr=1e-3, min_lr=1e-5, warmup_num_steps=10)
    s = make_schedule(cfg, cfg.lr)
    assert abs(float(s(0)) - 1e-5) < 1e-9
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert abs(float(s(1000)) - 1e-3) < 1e-9  # constant after warmup


def test_warmup_decay_lr_schedule():
    cfg = _cfg(lr=1e-3, warmup_num_steps=10, lr_decay_iters=110)
    s = make_schedule(cfg, cfg.lr)
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert float(s(60)) < 1e-3       # decaying
    assert abs(float(s(110))) < 1e-9  # reaches 0 at lr_decay_iters


def test_labels_weight_decay_blacklist():
    params = {
        "lm": {
            "wte": jnp.zeros((4, 2)),
            "blocks": {
                "ln_1": {"scale": jnp.zeros(2), "bias": jnp.zeros(2)},
                "attn": {"q": jnp.zeros((2, 2))},
                "adapter_mlp": {"down": {"kernel": jnp.zeros((2, 1)),
                                         "bias": jnp.zeros(1)}},
            },
        },
        "image_prefix": {
            "enc": {"stem": {"conv1": jnp.zeros((3, 3, 3, 4))}},
            "proj": {"kernel": jnp.zeros((4, 2)), "bias": jnp.zeros(2)},
        },
    }
    labels = label_params(params)
    assert labels["lm"]["wte"] == "main_none"                 # embedding
    assert labels["lm"]["blocks"]["ln_1"]["scale"] == "main_none"
    assert labels["lm"]["blocks"]["attn"]["q"] == "main_decay"
    assert labels["lm"]["blocks"]["adapter_mlp"]["down"]["kernel"] == "main_decay"
    assert labels["lm"]["blocks"]["adapter_mlp"]["down"]["bias"] == "main_none"
    assert labels["image_prefix"]["enc"]["stem"]["conv1"] == "img_enc_decay"
    assert labels["image_prefix"]["proj"]["kernel"] == "main_decay"


def test_image_enc_lr_group_updates_differently():
    cfg = _cfg(lr=1e-2, image_enc_lr=1e-6, warmup_num_steps=1,
               weight_decay=0.0, gradient_clipping=0.0)
    params = {
        "lm": {"blocks": {"attn": {"q": jnp.ones((2, 2))}}},
        "image_prefix": {"enc": {"stem": {"conv1": jnp.ones((2, 2))}}},
    }
    import jax

    opt, _ = make_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step twice (past warmup) and compare update magnitudes
    for step in range(3):
        updates, state = opt.update(grads, state, params)
    main_u = float(jnp.abs(updates["lm"]["blocks"]["attn"]["q"]).mean())
    enc_u = float(jnp.abs(updates["image_prefix"]["enc"]["stem"]["conv1"]).mean())
    assert main_u > enc_u * 100  # 1e-2 vs 1e-6 learning rates


def test_gradient_clipping_applied():
    import jax

    cfg = _cfg(lr=1.0, warmup_num_steps=0, gradient_clipping=1.0)
    params = {"lm": {"blocks": {"attn": {"q": jnp.zeros((4, 4))}}}}
    opt, _ = make_optimizer(cfg, params)
    state = opt.init(params)
    huge = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e6), params)
    updates, _ = opt.update(huge, state, params)
    # adam normalizes anyway; just ensure finite and bounded
    assert np.isfinite(np.asarray(updates["lm"]["blocks"]["attn"]["q"])).all()
