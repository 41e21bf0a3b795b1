"""Config loading parity with the reference YAML surface."""

import pytest

from magma_tpu.config import MultimodalConfig

V1 = "/root/reference/configs/MAGMA_v1.yml"
V2 = "/root/reference/configs/MAGMA_v2.yml"


def test_loads_reference_v1():
    cfg = MultimodalConfig.from_yml(V1)
    assert cfg.encoder_name == "clip_resnet_large"
    assert cfg.batch_size == 256
    assert cfg.train_steps == 150000
    assert cfg.lr == 8.0e-4
    assert cfg.image_enc_lr == 2.0e-6
    assert cfg.gradient_accumulation_steps == 8
    assert cfg.image_size == 384
    assert cfg.use_image_embed_layernorm is True
    assert cfg.image_embed_dropout_prob == 0.1
    assert cfg.adapter_config == {
        "mlp": {"adapter_type": "normal", "downsample_factor": 4}
    }
    # WarmupDecayLR because lr_decay_iters is set (reference config.py:101-123)
    assert cfg.lr_scheduler == "WarmupDecayLR"


def test_loads_reference_v2_with_unknown_keys():
    cfg = MultimodalConfig.from_yml(V2)
    assert "attention" in cfg.adapter_config
    assert isinstance(cfg.train_dataset_dir, list)
    assert cfg.eval_dataset_dir is None


def test_defaults_and_post_init():
    cfg = MultimodalConfig(batch_size=8, train_steps=100)
    assert cfg.lr_scheduler == "WarmupLR"
    assert cfg.adapter_config == {}
    assert cfg.is_classifier is False
    assert cfg.name is not None and len(cfg.name) == 8
    assert cfg.seq_len is None
    d = cfg.to_dict()
    assert d["batch_size"] == 8 and "lr_scheduler" in d


def test_classifier_flag():
    cfg = MultimodalConfig(batch_size=1, train_steps=1, class_dict={"num_classes": 3})
    assert cfg.is_classifier is True
