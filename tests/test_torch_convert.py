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
        x = np.asarray(leaf, np.float32)
        y = np.asarray(lb[key], np.float32)
        if atol == 0:
            np.testing.assert_array_equal(x, y, err_msg=key)
        else:
            np.testing.assert_allclose(x, y, atol=atol, err_msg=key)


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


def _tiny_cfg_for_encoder(encoder_name, encoder_overrides):
    return MultimodalConfig(
        batch_size=1, train_steps=1,
        encoder_name=encoder_name,
        adapter_config={"mlp": {"adapter_type": "normal", "downsample_factor": 4}},
        image_seq_len=2,
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=64,
                          attention_impl="xla", remat=False),
        encoder_overrides=encoder_overrides,
        image_size=64,
    )


_VIT_OVERRIDES = dict(input_resolution=64, patch_size=32, width=32, layers=2,
                      heads=2, embed_dim=16)
_NF_OVERRIDES = dict(blocks=(1, 1, 1, 1), width=8, input_resolution=32)


def test_roundtrip_clip_vit():
    """ViT-B/32 ("clip") weights round-trip through the OpenAI CLIP naming
    (reference image_encoders.py:62 clip.load("ViT-B/32").visual)."""
    model = Magma(_tiny_cfg_for_encoder("clip", _VIT_OVERRIDES), rng=3)
    sd = to_torch_state_dict(
        model.params, model.state, model.lm_config, model.prefix_config
    )
    assert "image_prefix.enc.conv1.weight" in sd
    assert "image_prefix.enc.class_embedding" in sd
    assert "image_prefix.enc.transformer.resblocks.0.attn.in_proj_weight" in sd
    assert "image_prefix.enc.proj" in sd

    params, state = convert_state_dict(sd, model.lm_config, model.prefix_config)
    _assert_trees_equal(params, model.params)
    assert state is None  # ViT carries no batch stats


def test_roundtrip_nf_resnet():
    """NF-ResNet50 weights round-trip through the timm NormFreeNet naming
    (reference image_encoders.py:31-45 timm nf_resnet50)."""
    model = Magma(_tiny_cfg_for_encoder("nfresnet50", _NF_OVERRIDES), rng=3)
    sd = to_torch_state_dict(
        model.params, model.state, model.lm_config, model.prefix_config
    )
    assert "image_prefix.enc.stem.conv.weight" in sd
    assert sd["image_prefix.enc.stem.conv.gain"].shape == (8, 1, 1, 1)
    assert "image_prefix.enc.stages.0.0.conv1.weight" in sd
    assert "image_prefix.enc.stages.1.0.downsample.conv.weight" in sd

    params, state = convert_state_dict(sd, model.lm_config, model.prefix_config)
    _assert_trees_equal(params, model.params)
    assert state is None


def test_load_pretrained_encoder_clip_visual_prefix():
    """A raw OpenAI CLIP checkpoint nests the tower under `visual.`;
    load_pretrained_encoder auto-detects it and the loaded tower changes
    the image-prefix output."""
    import jax.numpy as jnp

    from magma_tpu.models import image_prefix as ip_mod
    from magma_tpu.training.torch_convert import load_pretrained_encoder

    model = Magma(_tiny_cfg_for_encoder("clip", _VIT_OVERRIDES), rng=3)
    donor = Magma(_tiny_cfg_for_encoder("clip", _VIT_OVERRIDES), rng=9)
    sd = to_torch_state_dict(
        donor.params, donor.state, donor.lm_config, donor.prefix_config
    )
    enc_sd = {
        "visual." + k[len("image_prefix.enc."):]: v
        for k, v in sd.items() if k.startswith("image_prefix.enc.")
    }
    load_pretrained_encoder(model, enc_sd)
    _assert_trees_equal(
        model.params["image_prefix"]["enc"], donor.params["image_prefix"]["enc"]
    )
    images = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64), np.float32)
    )
    out, _ = ip_mod.apply(
        model.params["image_prefix"], model.state["image_prefix"], images,
        model.prefix_config, train=False,
    )
    assert jnp.isfinite(out).all()


def test_nf_resnet_import_without_skipinit_gain():
    """timm builds nf_resnet50 without skipinit; a missing skipinit_gain
    must import as 1.0 so residual branches are not silently zeroed."""
    from magma_tpu.training.torch_convert import load_pretrained_encoder

    model = Magma(_tiny_cfg_for_encoder("nfresnet50", _NF_OVERRIDES), rng=3)
    sd = to_torch_state_dict(
        model.params, model.state, model.lm_config, model.prefix_config
    )
    enc_sd = {
        k[len("image_prefix.enc."):]: v
        for k, v in sd.items()
        if k.startswith("image_prefix.enc.") and not k.endswith("skipinit_gain")
    }
    load_pretrained_encoder(model, enc_sd)
    gain = np.asarray(
        model.params["image_prefix"]["enc"]["layer1"][0]["skipinit_gain"]
    )
    assert gain == 1.0


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
    fresh_state = src.state
    # give the source nontrivial BN running stats so the restore assert
    # below cannot pass by matching a fresh mean=0/var=1 init
    prng = np.random.RandomState(11)

    def _perturb(leaf):
        return leaf + prng.uniform(0.1, 0.9, np.shape(leaf)).astype(np.float32)

    src.state = jax.tree_util.tree_map(_perturb, src.state)
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
    # the converted BN running stats must survive the round trip
    # (reference magma.py:292-297 loads them as plain state-dict entries)
    _assert_trees_equal(loaded.state, src.state, atol=1e-6)
    bn1 = np.asarray(loaded.state["image_prefix"]["enc"]["stem"]["bn1"]["mean"])
    assert not np.allclose(bn1, 0.0), "restored BN mean is still the fresh init"

    # and an eval-mode forward must actually consume them: fresh stats
    # would silently produce different vision features
    from magma_tpu.models import image_prefix as ip_mod

    images = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (1, 3, 64, 64), np.float32)
    )
    pcfg = loaded.prefix_config
    fwd = jax.jit(lambda p, s, x: ip_mod.apply(p, s, x, pcfg, train=False))
    emb_restored, _ = fwd(
        loaded.params["image_prefix"], loaded.state["image_prefix"], images
    )
    emb_fresh, _ = fwd(
        loaded.params["image_prefix"], fresh_state["image_prefix"], images
    )
    assert not np.allclose(
        np.asarray(emb_restored), np.asarray(emb_fresh), atol=1e-3
    ), "eval forward ignores BN running stats"
