"""Vision tower + ImagePrefix + preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magma_tpu.models import clip_resnet, clip_vit, image_prefix as ip, nfnet
from magma_tpu.ops.preprocess import clip_preprocess

TINY_RN = dict(width=16, blocks=(1, 1, 1, 1), input_resolution=64)
TINY_VIT = dict(width=32, layers=2, heads=2, embed_dim=24,
                input_resolution=64, patch_size=32)
TINY_NF = dict(width=16, blocks=(1, 1, 1, 1), input_resolution=64)


def _images(b=2, res=64, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (b, 3, res, res))


def test_clip_resnet_shapes_and_stats_update():
    cfg = clip_resnet.ClipResNetConfig(**TINY_RN)
    params, stats = clip_resnet.init_params(jax.random.PRNGKey(0), cfg)
    out, new_stats = clip_resnet.apply(params, stats, _images(), cfg, train=True)
    assert out.shape == (2, (64 // 32) ** 2, cfg.out_dim)
    # BN running stats must move in train mode...
    before = np.asarray(stats["stem"]["bn1"]["mean"])
    after = np.asarray(new_stats["stem"]["bn1"]["mean"])
    assert not np.allclose(before, after)
    # ...and stay fixed in eval mode
    _, eval_stats = clip_resnet.apply(params, stats, _images(), cfg, train=False)
    np.testing.assert_array_equal(
        np.asarray(eval_stats["stem"]["bn1"]["mean"]), before
    )


def test_clip_resnet_variant_dims():
    """ENCODER_OUT_DIMS parity (reference image_prefix.py:16-21)."""
    assert clip_resnet.ClipResNetConfig.named("clip_resnet_large").out_dim == 3072
    assert clip_resnet.ClipResNetConfig.named("clip_resnet").out_dim == 2560
    assert clip_resnet.ClipResNetConfig.named("clip_rn50").out_dim == 2048
    # RN50x16 at 384px -> 144 image tokens (example_inference.py:16-17)
    assert clip_resnet.ClipResNetConfig.named("clip_resnet_large").out_tokens == 144


def test_clip_vit_pooled_output():
    cfg = clip_vit.ClipViTConfig(**TINY_VIT)
    params, stats = clip_vit.init_params(jax.random.PRNGKey(0), cfg)
    out, _ = clip_vit.apply(params, stats, _images(), cfg)
    assert out.shape == (2, cfg.embed_dim)


def test_nfnet_pooled_output_no_state():
    cfg = nfnet.NFResNetConfig(**TINY_NF)
    params, stats = nfnet.init_params(jax.random.PRNGKey(0), cfg)
    out, new_stats = nfnet.apply(params, stats, _images(), cfg, train=True)
    assert out.shape == (2, cfg.out_dim)
    assert new_stats == {}  # normalizer-free: no batch state
    # default nf_resnet50 pooled dim parity (image_prefix.py:17)
    assert nfnet.NFResNetConfig().out_dim == 2048


def test_image_prefix_spatial_path():
    cfg = ip.ImagePrefixConfig(
        encoder_name="clip_resnet_large", out_dim=96, image_seq_len=2,
        encoder_overrides=tuple(sorted(TINY_RN.items())),
    )
    params, stats = ip.init_params(jax.random.PRNGKey(0), cfg)
    out, _ = ip.apply(params, stats, _images(), cfg)
    assert out.shape == (2, 4, 96)  # 64/32=2 -> 4 spatial tokens
    assert cfg.out_seq_len == 4


def test_image_prefix_pooled_path_with_dropout_ln():
    cfg = ip.ImagePrefixConfig(
        encoder_name="nfresnet50", out_dim=96, image_seq_len=3,
        dropout_prob=0.5, use_layernorm=True,
        encoder_overrides=tuple(sorted(TINY_NF.items())),
    )
    params, stats = ip.init_params(jax.random.PRNGKey(0), cfg)
    assert "ln" in params
    out, _ = ip.apply(params, stats, _images(), cfg, train=True,
                      dropout_rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 3, 96)
    # eval: no dropout, deterministic
    o1, _ = ip.apply(params, stats, _images(), cfg, train=False)
    o2, _ = ip.apply(params, stats, _images(), cfg, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_unknown_encoder_raises():
    with pytest.raises(ValueError):
        ip.get_encoder("resnet101")


def test_clip_preprocess_graph():
    raw = (np.random.rand(2, 100, 160, 3) * 255).astype(np.uint8)
    out = np.asarray(clip_preprocess(jnp.asarray(raw), 64))
    assert out.shape == (2, 3, 64, 64)
    # normalized: roughly zero-centered, not in [0,255]
    assert -3 < out.mean() < 3 and out.std() < 3
    # square input: pure resize, no crop
    sq = (np.random.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    out2 = np.asarray(clip_preprocess(jnp.asarray(sq), 64))
    assert out2.shape == (1, 3, 64, 64)


def test_clip_resnet_bn_folding_matches_eval():
    """fold_bn (serving) must reproduce inference-mode BN+conv within bf16
    rounding; the folded tree drops the bn entries and runs bf16-only."""
    cfg = clip_resnet.ClipResNetConfig(**TINY_RN)
    params, stats = clip_resnet.init_params(jax.random.PRNGKey(0), cfg)
    # non-trivial BN stats/affine so folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda t: t + 0.05 * jnp.arange(t.size, dtype=t.dtype) / t.size,
        stats,
    )
    params = jax.tree_util.tree_map(
        lambda t: t * 1.01 if t.ndim == 1 else t, params
    )
    imgs = _images()
    ref, _ = clip_resnet.apply(params, stats, imgs, cfg, train=False)
    folded = clip_resnet.fold_bn(params, stats, cfg)
    assert clip_resnet.is_folded(folded)
    out, same_stats = clip_resnet.apply(folded, stats, imgs, cfg, train=False)
    assert same_stats is stats
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.1,
    )
    # scale check: outputs are O(1) activations, so atol 0.15 is ~bf16 noise
    assert float(jnp.abs(ref).mean()) > 0.03
    with pytest.raises(AssertionError):
        clip_resnet.apply(folded, stats, imgs, cfg, train=True)


def test_image_prefix_fold_for_serving():
    cfg = ip.ImagePrefixConfig(
        encoder_name="clip_rn50", out_dim=32, use_layernorm=True,
        encoder_overrides=tuple(sorted(TINY_RN.items())),
    )
    params, stats = ip.init_params(jax.random.PRNGKey(0), cfg)
    imgs = _images()
    ref, _ = ip.apply(params, stats, imgs, cfg, train=False)
    folded = ip.fold_for_serving(params, stats, cfg)
    assert folded["proj"]["kernel"].dtype == jnp.bfloat16
    out, _ = ip.apply(folded, stats, imgs, cfg, train=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.2, rtol=0.1,
    )
    # idempotent
    again = ip.fold_for_serving(folded, stats, cfg)
    assert clip_resnet.is_folded(again["enc"])
