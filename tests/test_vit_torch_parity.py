"""Cross-framework numerics check: our CLIP ViT tower vs an independent
torch implementation of the documented CLIP VisionTransformer math
(conv patch embed, class token + positional embedding, pre-LN blocks with
torch nn.MultiheadAttention, QuickGELU MLP, ln_post + projection).

This guards the conventions the pretrained-weight importer depends on
(reference image_encoders.py:62 loads clip.load("ViT-B/32").visual): the
fused in_proj layout and the per-head split order must match torch MHA, or
imported published weights would produce garbage despite a clean name
round-trip.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from magma_tpu.models import clip_vit  # noqa: E402
from magma_tpu.training.torch_convert import (  # noqa: E402
    _clip_vit_from_torch,
    to_torch_state_dict,
)

RES, PATCH, W, L, H, EMB = 64, 32, 32, 2, 2, 16


def torch_vit_forward(sd, images):
    """Independent torch implementation of CLIP's VisionTransformer.forward
    using the checkpoint-native parameter names."""
    x = F.conv2d(images, sd["conv1.weight"], stride=PATCH)  # (b, W, g, g)
    b = x.shape[0]
    x = x.reshape(b, W, -1).permute(0, 2, 1)  # (b, g*g, W)
    cls = sd["class_embedding"].expand(b, 1, W)
    x = torch.cat([cls, x], dim=1) + sd["positional_embedding"]
    x = F.layer_norm(x, (W,), sd["ln_pre.weight"], sd["ln_pre.bias"])

    for i in range(L):
        p = f"transformer.resblocks.{i}."
        u = F.layer_norm(x, (W,), sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        a, _ = F.multi_head_attention_forward(
            u.transpose(0, 1), u.transpose(0, 1), u.transpose(0, 1),
            W, H,
            sd[p + "attn.in_proj_weight"], sd[p + "attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[p + "attn.out_proj.weight"], sd[p + "attn.out_proj.bias"],
            need_weights=False,
        )
        x = x + a.transpose(0, 1)
        u = F.layer_norm(x, (W,), sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        m = F.linear(u, sd[p + "mlp.c_fc.weight"], sd[p + "mlp.c_fc.bias"])
        m = m * torch.sigmoid(1.702 * m)  # QuickGELU
        m = F.linear(m, sd[p + "mlp.c_proj.weight"], sd[p + "mlp.c_proj.bias"])
        x = x + m

    pooled = F.layer_norm(
        x[:, 0], (W,), sd["ln_post.weight"], sd["ln_post.bias"]
    )
    return pooled @ sd["proj"]


def test_clip_vit_matches_torch_mha():
    cfg = clip_vit.ClipViTConfig(
        input_resolution=RES, patch_size=PATCH, width=W, layers=L, heads=H,
        embed_dim=EMB, compute_dtype=np.float32,
    )
    params, stats = clip_vit.init_params(jax.random.PRNGKey(5), cfg)

    # export through the converter naming, rebuild torch-side tensors
    out = {}
    from magma_tpu.training import torch_convert as tc

    tc._clip_vit_to_torch(out, params, "")
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out.items()}

    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, RES, RES).astype(np.float32)

    ours, _ = clip_vit.apply(params, stats, images, cfg, train=False)
    ref = torch_vit_forward(sd, torch.from_numpy(images)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    # and the import direction reproduces the same pytree
    back = _clip_vit_from_torch({k: v.numpy() for k, v in sd.items()}, cfg, "")
    ours2, _ = clip_vit.apply(back, stats, images, cfg, train=False)
    np.testing.assert_allclose(np.asarray(ours2), ref, atol=2e-4)
