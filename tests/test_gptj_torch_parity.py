"""Cross-framework numerics check: our GPT-J block vs an independent torch
implementation of the documented GPT-J math (parallel attention+FFN off one
layernorm, rotate-every-two rotary on the first rotary_dim dims, scores
scaled by 1/sqrt(head_dim), gelu-tanh MLP, out-proj bias, tied lm_head).

This guards the conventions the checkpoint converter depends on
(SURVEY.md §7 hard part (a)): a silent rotary/layout mismatch would make
converted published weights produce garbage even though all JAX-side tests
pass.  torch (CPU) ships in the image, so the reference math is written
here independently in torch and compared end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from magma_tpu.models import gptj  # noqa: E402

D, H, HD, RD, FF = 64, 2, 32, 8, 128
L = 2
S = 6
VOCAB = 50258


def torch_rotary(x, rd):
    """rotate-every-two on the first rd dims; x (b, s, h, hd)."""
    b, s, h, hd = x.shape
    half = rd // 2
    inv_freq = 1.0 / (10000.0 ** (torch.arange(half, dtype=torch.float64) / half))
    pos = torch.arange(s, dtype=torch.float64)
    ang = pos[:, None] * inv_freq[None, :]            # (s, half)
    sin, cos = torch.sin(ang).float(), torch.cos(ang).float()
    x_rot = x[..., :rd].reshape(b, s, h, half, 2)
    x1, x2 = x_rot[..., 0], x_rot[..., 1]
    sin = sin[None, :, None, :]
    cos = cos[None, :, None, :]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = torch.stack([o1, o2], dim=-1).reshape(b, s, h, rd)
    return torch.cat([out, x[..., rd:]], dim=-1)


def torch_block(x, w, ln_eps=1e-5):
    """One GPT-J block in torch from raw weight arrays (JAX layout:
    kernels are (in, out))."""
    u = torch.nn.functional.layer_norm(
        x, (D,), torch.from_numpy(w["ln_scale"]), torch.from_numpy(w["ln_bias"]),
        ln_eps,
    )
    b, s, _ = u.shape
    q = (u @ torch.from_numpy(w["q"])).reshape(b, s, H, HD)
    k = (u @ torch.from_numpy(w["k"])).reshape(b, s, H, HD)
    v = (u @ torch.from_numpy(w["v"])).reshape(b, s, H, HD)
    q, k = torch_rotary(q, RD), torch_rotary(k, RD)

    scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / (HD ** 0.5)
    mask = torch.tril(torch.ones(s, s, dtype=torch.bool))
    scores = scores.masked_fill(~mask, float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    a = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, D)
    a = a @ torch.from_numpy(w["o"]) + torch.from_numpy(w["o_bias"])

    m = u @ torch.from_numpy(w["fc_in"]) + torch.from_numpy(w["fc_in_b"])
    m = torch.nn.functional.gelu(m, approximate="tanh")
    m = m @ torch.from_numpy(w["fc_out"]) + torch.from_numpy(w["fc_out_b"])
    return x + a + m


def test_gptj_forward_matches_independent_torch_math():
    cfg = gptj.GPTJConfig(
        n_layers=L, n_heads=H, d_model=D, d_ff=FF, rotary_dim=RD,
        vocab_size=VOCAB, max_seq_len=32, attention_impl="xla", remat=False,
        compute_dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = gptj.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 17, 100, 50257, 3, 9]], np.int32)

    # --- ours ---
    emb = gptj.embed_tokens(cfg, params, jnp.asarray(ids))
    logits, _ = gptj.forward(cfg, params, emb)
    ours = np.asarray(logits[0], np.float64)

    # --- torch ---
    bl = params["blocks"]
    wte = np.asarray(params["wte"], np.float32)
    x = torch.from_numpy(wte[ids[0]])[None]  # (1, s, D)
    for i in range(L):
        w = {
            "ln_scale": np.asarray(bl["ln_1"]["scale"][i], np.float32),
            "ln_bias": np.asarray(bl["ln_1"]["bias"][i], np.float32),
            "q": np.asarray(bl["attn"]["q"][i], np.float32),
            "k": np.asarray(bl["attn"]["k"][i], np.float32),
            "v": np.asarray(bl["attn"]["v"][i], np.float32),
            "o": np.asarray(bl["attn"]["o"][i], np.float32),
            "o_bias": np.asarray(bl["attn"]["o_bias"][i], np.float32),
            "fc_in": np.asarray(bl["mlp"]["fc_in"]["kernel"][i], np.float32),
            "fc_in_b": np.asarray(bl["mlp"]["fc_in"]["bias"][i], np.float32),
            "fc_out": np.asarray(bl["mlp"]["fc_out"]["kernel"][i], np.float32),
            "fc_out_b": np.asarray(bl["mlp"]["fc_out"]["bias"][i], np.float32),
        }
        x = torch_block(x, w)
    x = torch.nn.functional.layer_norm(
        x, (D,),
        torch.from_numpy(np.asarray(params["ln_f"]["scale"], np.float32)),
        torch.from_numpy(np.asarray(params["ln_f"]["bias"], np.float32)),
        1e-5,
    )
    theirs = (x[0] @ torch.from_numpy(wte).T).double().numpy()[:, :VOCAB]

    # compare over the true vocab (ours is MXU-padded)
    np.testing.assert_allclose(ours[:, :VOCAB], theirs, atol=2e-4, rtol=1e-4)
    # and the resulting greedy predictions are identical
    np.testing.assert_array_equal(
        ours[:, :VOCAB].argmax(-1), theirs.argmax(-1)
    )
