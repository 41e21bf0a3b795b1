"""Torch checkpoint conversion tests: export->import round trip must
reproduce the exact pytree, and a synthetic torch-style file must load
through Magma.from_checkpoint."""

import numpy as np
import pytest

import jax

from magma_tpu.config import MultimodalConfig
from magma_tpu.models.magma import Magma
from magma_tpu.training.torch_convert import (
    convert_state_dict,
    to_torch_state_dict,
)


def _tiny_cfg(attn_adapter=None):
    ac = {"mlp": {"adapter_type": "normal", "downsample_factor": 4}}
    if attn_adapter:
        ac["attention"] = attn_adapter
    return MultimodalConfig(
        batch_size=1, train_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config=ac,
        use_image_embed_layernorm=True,
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=64,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=64),
    )


def _assert_trees_equal(a, b, atol=0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): x for p, x in jax.tree_util.tree_leaves_with_path(b)}
    for path, leaf in la:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(lb[key], np.float32),
            atol=atol, err_msg=key,
        )


@pytest.mark.parametrize("attn_adapter", [
    None,
    {"adapter_type": "normal", "downsample_factor": 8},
    {"adapter_type": "scaled_parallel", "downsample_factor": 8},
])
def test_roundtrip_export_import(attn_adapter):
    model = Magma(_tiny_cfg(attn_adapter))
    sd = to_torch_state_dict(
        model.params, model.state, model.lm_config, model.prefix_config
    )
    # all names follow the reference layout
    assert "lm.transformer.wte.weight" in sd
    assert "lm.transformer.h.0.mlp.0.c_fc.weight" in sd  # Sequential(mlp, ad)
    assert "lm.transformer.h.0.mlp.1.adapter.0.weight" in sd
    assert "image_prefix.enc.layer2.0.downsample.0.weight" in sd
    if attn_adapter and attn_adapter["adapter_type"] == "scaled_parallel":
        assert "lm.transformer.h.0.attn.adapter_scale" in sd
        assert "lm.transformer.h.0.attn.module.attention.q_proj.weight" in sd
    elif attn_adapter:
        assert "lm.transformer.h.0.attn.attn_block.attention.q_proj.weight" in sd

    params, state = convert_state_dict(
        sd, model.lm_config, model.prefix_config
    )
    _assert_trees_equal(params, model.params)
    _assert_trees_equal(state, model.state)


def test_vocab_padding_on_import():
    model = Magma(_tiny_cfg())
    sd = to_torch_state_dict(
        model.params, model.state, model.lm_config, model.prefix_config
    )
    assert sd["lm.transformer.wte.weight"].shape[0] == 50258  # true vocab
    params, _ = convert_state_dict(sd, model.lm_config, model.prefix_config)
    assert params["lm"]["wte"].shape[0] == model.lm_config.padded_vocab_size
    # padded rows are zero
    pad = np.asarray(params["lm"]["wte"][50258:])
    assert (pad == 0).all()


def test_from_checkpoint_torch_file(tmp_path):
    """End to end: a torch-saved mp_rank_00_model_states.pt with the
    DeepSpeed 'module' wrapper loads via Magma.from_checkpoint."""
    torch = pytest.importorskip("torch")

    cfg = _tiny_cfg()
    src = Magma(cfg, rng=7)
    sd = to_torch_state_dict(src.params, src.state, src.lm_config,
                             src.prefix_config)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    path = tmp_path / "mp_rank_00_model_states.pt"
    torch.save({"module": torch_sd, "global_step": 123}, path)

    import yaml

    cfg_path = tmp_path / "config.yml"
    d = {k: v for k, v in cfg.to_dict().items()
         if k in MultimodalConfig.__dataclass_fields__}

    def sanitize(x):  # yaml-safe: tuples -> lists
        if isinstance(x, dict):
            return {k: sanitize(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [sanitize(v) for v in x]
        return x

    with open(cfg_path, "w") as f:
        yaml.dump(sanitize(d), f)

    loaded = Magma.from_checkpoint(str(cfg_path), str(path))
    np.testing.assert_allclose(
        np.asarray(loaded.params["lm"]["wte"], np.float32),
        np.asarray(src.params["lm"]["wte"], np.float32), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded.params["lm"]["blocks"]["adapter_mlp"]["down"]["kernel"],
                   np.float32),
        np.asarray(src.params["lm"]["blocks"]["adapter_mlp"]["down"]["kernel"],
                   np.float32), atol=1e-6,
    )
