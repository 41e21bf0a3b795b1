"""Classification fine-tuning tests (completing the reference's
half-present feature, train_loop.py:24-45)."""

import numpy as np
import pytest

from magma_tpu.config import MultimodalConfig
from magma_tpu.models.classifier import MagmaClassifier, collate_fn_classification
from magma_tpu.training.train_loop import Trainer


def _cfg(**kw):
    base = dict(
        batch_size=4, train_steps=5, lr=5e-3, warmup_num_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal", "downsample_factor": 4}},
        class_dict={"num_classes": 3, "interface_type": "last_token"},
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=64,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=32),
        mesh_dp=4, mesh_tp=2, image_size=32,
    )
    base.update(kw)
    return MultimodalConfig(**base)


def _batch(b=4, s=64, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(b, 3, 32, 32).astype(np.float32)
    caps = np.full((b, s), 50256, np.int32)
    for i in range(b):
        caps[i, :4] = rng.randint(0, 50000, 4)
    labels = rng.randint(0, 3, b)
    return images, caps, labels


def test_classifier_has_head_and_mask():
    model = MagmaClassifier(_cfg())
    assert model.params["class_head"]["kernel"].shape == (128, 3)
    mask = model.trainable_mask()
    assert mask["class_head"]["kernel"] is True
    assert mask["lm"]["wte"] is False


def test_freeze_model_only_head_trainable():
    import jax

    model = MagmaClassifier(_cfg(class_dict={"num_classes": 3,
                                             "freeze_model": True}))
    mask = model.trainable_mask()
    assert mask["class_head"]["kernel"] is True
    others = jax.tree_util.tree_leaves(
        {"lm": mask["lm"], "image_prefix": mask["image_prefix"]}
    )
    assert not any(others)


def test_forward_returns_loss_and_logits():
    model = MagmaClassifier(_cfg())
    images, caps, labels = _batch()
    loss, logits = model.forward(images, caps, labels)
    assert logits.shape == (4, 3)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - np.log(3)) < 0.7  # untrained ~ uniform


def test_classification_training_learns():
    cfg = _cfg()
    model = MagmaClassifier(cfg)
    trainer = Trainer(model, cfg)
    images, caps, labels = _batch()
    first_loss, _ = trainer.train_step_classification(images, caps, labels)
    for _ in range(6):
        loss, acc = trainer.train_step_classification(images, caps, labels)
    assert loss < first_loss
    ev_loss, ev_acc = trainer.eval_step_classification(images, caps, labels)
    assert np.isfinite(ev_loss) and 0.0 <= ev_acc <= 1.0


def test_multi_image_nlvr2_style():
    model = MagmaClassifier(_cfg())
    b = 2
    rng = np.random.RandomState(0)
    left = rng.rand(b, 3, 32, 32).astype(np.float32)
    right = rng.rand(b, 3, 32, 32).astype(np.float32)
    caps = np.full((b, 64), 50256, np.int32)
    labels = np.array([0, 1])
    loss, logits = model.forward([left, right], caps, labels)
    assert logits.shape == (b, 3)


def test_collate_fn_classification():
    b = 3
    sample = lambda i: (
        np.full((1, 3, 8, 8), i, np.float32),       # left image
        np.full((1, 3, 8, 8), i + 10, np.float32),  # right image
        np.full((1, 32), i, np.int32),               # caption
        i % 2,                                       # label
    )
    images_list, captions, labels = collate_fn_classification(
        [sample(i) for i in range(b)], seq_len=32
    )
    assert len(images_list) == 2
    assert images_list[0].shape == (b, 3, 8, 8)
    assert captions.shape == (b, 32)
    assert list(labels) == [0, 1, 0]
