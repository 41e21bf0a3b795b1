"""Full-pipeline checkpoint fidelity vs an independent torch oracle.

The highest-risk claim in this repo is "a reference-format MAGMA
checkpoint loaded through ``Magma.from_checkpoint`` reproduces the
reference model's captions".  The published checkpoint is unreachable
(air-gapped), but the claim is provable without it: build a SYNTHETIC
checkpoint in the exact reference state-dict naming
(magma/magma.py:292-297 unwrap; language_model.py:12-24 dims;
adapters.py Sequential indices; CLIP ModifiedResNet visual naming), run
it through an in-repo torch implementation of the reference model —
written here independently, module by module, from the reference sources
— and through our full stack (torch file -> torch_convert ->
RN50x16 -> ImagePrefix -> adapters -> LM -> greedy sampling), and demand
token-identical greedy output.

Scale: FULL-width RN50x16 tower (width 96, blocks (6,8,18,8)) and
FULL-width GPT-J layers (d=4096, 16 heads, d_ff=16384, rotary 64, vocab
50258) at every setting — so any layout/transpose/rotary/BN mistake
reproduces here.  The default run uses reduced resolution (128 px -> 16
image tokens) and 2 LM layers so the suite stays fast; FIDELITY_FULL=1
runs the complete reference geometry (384 px, 144 image tokens, 4 LM
layers; measured PASSING in ~87 min fp32 on this 1-core sandbox —
that run is the end-to-end converter+numerics gate at published scale).
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from magma_tpu.config import MultimodalConfig  # noqa: E402
from magma_tpu.models.magma import Magma  # noqa: E402

# full-width dims (language_model.py:12-24), reduced depth.  FIDELITY_FULL=1
# restores the complete reference geometry (384 px / 144 tokens / 4 layers).
# slow gate: ~15 min at default (reduced) geometry on this 1-core host,
# excluded from the default fast suite — run via `pytest -m slow`; the
# release checklist (PARITY.md) additionally runs FIDELITY_FULL=1.
pytestmark = pytest.mark.slow

FULL = os.environ.get("FIDELITY_FULL", "0") == "1"
L_LM, D, H, FF, RD = (4 if FULL else 2), 4096, 16, 16384, 64
VOCAB = 50258
WIDTH, BLOCKS, RES = 96, (6, 8, 18, 8), (384 if FULL else 128)
ENC_DIM = WIDTH * 32  # 3072
DECODE_STEPS = 6
EOS = 50256


# ---------------------------------------------------------------------------
# torch oracle: the reference model, re-implemented independently
# ---------------------------------------------------------------------------


class OracleBottleneck(nn.Module):
    """CLIP ModifiedResNet Bottleneck (public CLIP model.py)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class OracleResNet(nn.Module):
    """ModifiedResNet minus attnpool; forward yields the spatial map
    (reference image_encoders.py:70-74 rearranges it to tokens)."""

    def __init__(self, width=WIDTH, blocks=BLOCKS):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        for stage, n in enumerate(blocks, start=1):
            planes = width * (2 ** (stage - 1))
            stride = 1 if stage == 1 else 2
            layers = [OracleBottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, n):
                layers.append(OracleBottleneck(self._inplanes, planes))
            setattr(self, f"layer{stage}", nn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        return x  # (b, d, h, w)


class OracleAdapter(nn.Module):
    """Reference adapters.py:6-39: Sequential(down, ReLU, up) with the
    residual inside forward."""

    def __init__(self, dim, downsample_factor, residual):
        super().__init__()
        self.adapter = nn.Sequential(
            nn.Linear(dim, dim // downsample_factor),
            nn.ReLU(),
            nn.Linear(dim // downsample_factor, dim),
        )
        self.residual = residual

    def forward(self, x):
        y = self.adapter(x)
        return y + x if self.residual else y


def oracle_rotary(x, pos0):
    """rotate-every-two on the first RD dims; x (b, s, h, hd), absolute
    positions pos0..pos0+s-1."""
    b, s, h, hd = x.shape
    half = RD // 2
    inv = 1.0 / (10000.0 ** (torch.arange(half, dtype=torch.float64) / half))
    pos = torch.arange(pos0, pos0 + s, dtype=torch.float64)
    ang = pos[:, None] * inv[None, :]
    sin, cos = torch.sin(ang).float(), torch.cos(ang).float()
    xr = x[..., :RD].reshape(b, s, h, half, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    sin, cos = sin[None, :, None, :], cos[None, :, None, :]
    out = torch.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)
    return torch.cat([out.reshape(b, s, h, RD), x[..., RD:]], dim=-1)


class OracleBlock(nn.Module):
    """GPT-J block (GPT-Neo-fork layout) + MAGMA adapter wiring:
    Sequential(mlp, Adapter) for the mlp (magma.py:141-148) and a scaled
    ParallelAdapterWrapper around attention (magma.py:153-169)."""

    def __init__(self):
        super().__init__()
        self.ln_1 = nn.LayerNorm(D)
        self.q_proj = nn.Linear(D, D, bias=False)
        self.k_proj = nn.Linear(D, D, bias=False)
        self.v_proj = nn.Linear(D, D, bias=False)
        self.out_proj = nn.Linear(D, D, bias=True)
        self.c_fc = nn.Linear(D, FF)
        self.c_proj = nn.Linear(FF, D)
        self.mlp_adapter = OracleAdapter(D, 4, residual=True)
        self.attn_adapter = OracleAdapter(D, 8, residual=False)
        self.adapter_scale = nn.Parameter(torch.ones(1))

    def forward(self, x, pos0, cache):
        """x (b, s, D); cache is a dict with optional 'k'/'v'."""
        u = self.ln_1(x)
        b, s, _ = u.shape
        hd = D // H
        q = self.q_proj(u).reshape(b, s, H, hd)
        k = self.k_proj(u).reshape(b, s, H, hd)
        v = self.v_proj(u).reshape(b, s, H, hd)
        q, k = oracle_rotary(q, pos0), oracle_rotary(k, pos0)
        if "k" in cache:
            k = torch.cat([cache["k"], k], dim=1)
            v = torch.cat([cache["v"], v], dim=1)
        cache["k"], cache["v"] = k, v
        s_k = k.shape[1]
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        mask = torch.tril(torch.ones(s_k, s_k, dtype=torch.bool))[-s:]
        scores = scores.masked_fill(~mask, float("-inf"))
        a = torch.einsum(
            "bhqk,bkhd->bqhd", torch.softmax(scores, dim=-1), v
        ).reshape(b, s, D)
        a = self.out_proj(a)
        a = a + self.adapter_scale * self.attn_adapter(u)

        m = self.c_proj(F.gelu(self.c_fc(u), approximate="tanh"))
        m = self.mlp_adapter(m)
        return x + a + m


class OracleMagma(nn.Module):
    def __init__(self):
        super().__init__()
        self.wte = nn.Embedding(VOCAB, D)
        self.blocks = nn.ModuleList(OracleBlock() for _ in range(L_LM))
        self.ln_f = nn.LayerNorm(D)
        self.enc = OracleResNet()
        self.proj = nn.Linear(ENC_DIM, D)
        self.ln = nn.LayerNorm(D)

    def embed_image(self, pixels):
        feat = self.enc(pixels)  # (b, d, h, w)
        b, d, h, w = feat.shape
        tokens = feat.reshape(b, d, h * w).permute(0, 2, 1)  # b (h w) d
        return self.ln(self.proj(tokens))  # eval: dropout is a no-op

    def lm_forward(self, embeds, pos0, caches):
        x = embeds
        for blk, cache in zip(self.blocks, caches):
            x = blk(x, pos0, cache)
        return self.ln_f(x) @ self.wte.weight.T

    def greedy(self, embeds, steps):
        caches = [{} for _ in range(L_LM)]
        logits = self.lm_forward(embeds, 0, caches)
        out = []
        pos = embeds.shape[1]
        done = False
        for _ in range(steps):
            tok = int(logits[0, -1].argmax())
            tok = EOS if done else tok
            done = done or tok == EOS
            out.append(tok)
            emb = self.wte(torch.tensor([[tok]]))
            logits = self.lm_forward(emb, pos, caches)
            pos += 1
        return out


# ---------------------------------------------------------------------------
# synthetic checkpoint in reference naming
# ---------------------------------------------------------------------------


def _f16_via_xla(t: "torch.Tensor") -> "torch.Tensor":
    """fp32 torch -> fp16 torch through XLA:CPU.  torch's and numpy's half
    converters are soft-float on hosts without a fast F16C path (~2M
    elem/s measured on this sandbox — 13 MINUTES for this checkpoint);
    XLA:CPU emits vectorized conversion code with identical IEEE 754
    round-to-nearest-even results."""
    a = t.detach().cpu().numpy()
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            return torch.from_numpy(
                np.asarray(jnp.asarray(a).astype(jnp.float16)).copy())
    except Exception:
        return torch.from_numpy(a.astype(np.float16))


def _f32_via_xla(t: "torch.Tensor") -> "torch.Tensor":
    """fp16 torch -> fp32 torch through XLA:CPU (see _f16_via_xla)."""
    a = t.detach().cpu().numpy()
    if a.dtype != np.float16:
        return torch.from_numpy(a.astype(np.float32))
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            return torch.from_numpy(
                np.asarray(jnp.asarray(a).astype(jnp.float32)).copy())
    except Exception:
        return torch.from_numpy(a.astype(np.float32))


def reference_state_dict(oracle: OracleMagma):
    """Oracle module tree -> the reference's checkpoint naming
    (magma/magma.py module attribute paths; fp16 like the published
    DeepSpeed checkpoint)."""
    sd = {}

    def put(name, t):
        sd[name] = _f16_via_xla(t)

    put("lm.transformer.wte.weight", oracle.wte.weight)
    put("lm.transformer.ln_f.weight", oracle.ln_f.weight)
    put("lm.transformer.ln_f.bias", oracle.ln_f.bias)
    for i, blk in enumerate(oracle.blocks):
        base = f"lm.transformer.h.{i}."
        put(base + "ln_1.weight", blk.ln_1.weight)
        put(base + "ln_1.bias", blk.ln_1.bias)
        # attention sits inside a (scaled_)parallel AdapterWrapper:
        # "attn.module.attention." (magma.py:153-169 setattr)
        ab = base + "attn.module.attention."
        put(ab + "q_proj.weight", blk.q_proj.weight)
        put(ab + "k_proj.weight", blk.k_proj.weight)
        put(ab + "v_proj.weight", blk.v_proj.weight)
        put(ab + "out_proj.weight", blk.out_proj.weight)
        put(ab + "out_proj.bias", blk.out_proj.bias)
        put(base + "attn.adapter_scale", blk.adapter_scale)
        for idx in (0, 2):  # Linears at indices 0/2 (no adapter ln)
            lin = blk.attn_adapter.adapter[idx]
            put(base + f"attn.adapter.{idx}.weight", lin.weight)
            put(base + f"attn.adapter.{idx}.bias", lin.bias)
        # mlp is Sequential(mlp, Adapter) -> "mlp.0.", "mlp.1.adapter."
        put(base + "mlp.0.c_fc.weight", blk.c_fc.weight)
        put(base + "mlp.0.c_fc.bias", blk.c_fc.bias)
        put(base + "mlp.0.c_proj.weight", blk.c_proj.weight)
        put(base + "mlp.0.c_proj.bias", blk.c_proj.bias)
        for idx in (0, 2):
            lin = blk.mlp_adapter.adapter[idx]
            put(base + f"mlp.1.adapter.{idx}.weight", lin.weight)
            put(base + f"mlp.1.adapter.{idx}.bias", lin.bias)

    put("image_prefix.proj.weight", oracle.proj.weight)
    put("image_prefix.proj.bias", oracle.proj.bias)
    put("image_prefix.ln.weight", oracle.ln.weight)
    put("image_prefix.ln.bias", oracle.ln.bias)
    eb = "image_prefix.enc."
    for i in (1, 2, 3):
        conv = getattr(oracle.enc, f"conv{i}")
        bn = getattr(oracle.enc, f"bn{i}")
        put(eb + f"conv{i}.weight", conv.weight)
        _put_bn(sd, eb + f"bn{i}", bn)
    for stage in range(1, 5):
        for b, blk in enumerate(getattr(oracle.enc, f"layer{stage}")):
            bb = eb + f"layer{stage}.{b}."
            for c in (1, 2, 3):
                put(bb + f"conv{c}.weight", getattr(blk, f"conv{c}").weight)
                _put_bn(sd, bb + f"bn{c}", getattr(blk, f"bn{c}"))
            if blk.downsample is not None:
                put(bb + "downsample.0.weight", blk.downsample[1].weight)
                _put_bn(sd, bb + "downsample.1", blk.downsample[2])
    return sd


def _put_bn(sd, name, bn):
    sd[name + ".weight"] = _f16_via_xla(bn.weight)
    sd[name + ".bias"] = _f16_via_xla(bn.bias)
    sd[name + ".running_mean"] = _f16_via_xla(bn.running_mean)
    sd[name + ".running_var"] = _f16_via_xla(bn.running_var)


def randomize(oracle: OracleMagma, seed=0):
    """Give every parameter/stat a non-degenerate random value so any
    transpose/mapping bug changes the output."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in oracle.parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.02, generator=g)
            else:
                # biases / LN+BN affine: small but nonzero (a zero bias
                # would hide a bias-mapping bug); LN/BN scales near 1
                base = 1.0 if p is not None and (p == 1).all() else 0.0
                p.copy_(
                    base + 0.05 * torch.randn(p.shape, generator=g)
                )
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.copy_(
                    1.0 + 0.2 * torch.rand(m.running_var.shape, generator=g)
                )
        # adapters: TRAINED-magnitude weights (std 0.02), not the
        # reference's near-zero init — near-zero adapters would make an
        # adapter-mapping bug invisible to the token comparison
        for m in oracle.modules():
            if isinstance(m, OracleAdapter):
                for p in m.parameters():
                    p.normal_(0.0, 0.02, generator=g)


def test_full_pipeline_checkpoint_fidelity(tmp_path):
    torch.manual_seed(0)
    with torch.no_grad():
        oracle = OracleMagma().float().eval()
        randomize(oracle)

        sd = reference_state_dict(oracle)
        ckpt = os.path.join(str(tmp_path), "mp_rank_00_model_states.pt")
        torch.save({"module": sd}, ckpt)

        # the oracle itself must run from the HALF-precision checkpoint
        # values (like the published file), not its fp32 masters
        _load_oracle_from_sd(oracle, sd)

        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 3, RES, RES).astype(np.float32) * 0.5
        text_ids = np.array([[464, 2068, 7586, 21831, 50257]], np.int32)

        img_emb = oracle.embed_image(torch.from_numpy(pixels))
        txt_emb = oracle.wte(torch.from_numpy(text_ids.astype(np.int64)))
        prompt = torch.cat([img_emb, txt_emb], dim=1)
        n_img = (RES // 32) ** 2  # 144 at the full 384 px geometry
        assert prompt.shape == (1, n_img + 5, D)
        oracle_tokens = oracle.greedy(prompt, DECODE_STEPS)

    # ---- our stack, from the checkpoint file ----
    config = MultimodalConfig(
        batch_size=1, train_steps=1,
        encoder_name="clip_resnet_large",
        adapter_config={
            "mlp": {"adapter_type": "normal", "downsample_factor": 4},
            "attention": {"adapter_type": "scaled_parallel",
                          "downsample_factor": 8},
        },
        use_image_embed_layernorm=True,
        image_embed_dropout_prob=0.1,
        image_size=RES,
        compute_dtype="float32",
        param_dtype="float32",
        frozen_dtype="float32",
        lm_overrides=dict(n_layers=L_LM, attention_impl="xla", remat=False),
    )
    model = Magma.from_checkpoint(config, ckpt)
    emb = model.embed([pixels, text_ids])
    assert emb.shape == (1, (RES // 32) ** 2 + 5, D)
    # prompt embeddings must already agree closely (vision tower + prefix)
    np.testing.assert_allclose(
        np.asarray(emb, np.float32),
        prompt.numpy(),
        atol=5e-2, rtol=5e-2,
    )
    ours = model.generate(
        emb, max_steps=DECODE_STEPS, temperature=0.0, decode=False
    )
    ours = [int(t) for t in np.asarray(ours)[0]]

    assert ours == oracle_tokens, (
        f"greedy tokens diverge: ours={ours} oracle={oracle_tokens}"
    )


def _load_oracle_from_sd(oracle, sd):
    """Reload the oracle's own weights from the fp16 state dict (so both
    sides consume the identical checkpoint values)."""
    f32 = {k: _f32_via_xla(v) for k, v in sd.items()}

    def cp(param, name):
        param.data.copy_(f32[name])

    cp(oracle.wte.weight, "lm.transformer.wte.weight")
    cp(oracle.ln_f.weight, "lm.transformer.ln_f.weight")
    cp(oracle.ln_f.bias, "lm.transformer.ln_f.bias")
    for i, blk in enumerate(oracle.blocks):
        base = f"lm.transformer.h.{i}."
        cp(blk.ln_1.weight, base + "ln_1.weight")
        cp(blk.ln_1.bias, base + "ln_1.bias")
        ab = base + "attn.module.attention."
        cp(blk.q_proj.weight, ab + "q_proj.weight")
        cp(blk.k_proj.weight, ab + "k_proj.weight")
        cp(blk.v_proj.weight, ab + "v_proj.weight")
        cp(blk.out_proj.weight, ab + "out_proj.weight")
        cp(blk.out_proj.bias, ab + "out_proj.bias")
        cp(blk.adapter_scale, base + "attn.adapter_scale")
        for idx in (0, 2):
            cp(blk.attn_adapter.adapter[idx].weight,
               base + f"attn.adapter.{idx}.weight")
            cp(blk.attn_adapter.adapter[idx].bias,
               base + f"attn.adapter.{idx}.bias")
        cp(blk.c_fc.weight, base + "mlp.0.c_fc.weight")
        cp(blk.c_fc.bias, base + "mlp.0.c_fc.bias")
        cp(blk.c_proj.weight, base + "mlp.0.c_proj.weight")
        cp(blk.c_proj.bias, base + "mlp.0.c_proj.bias")
        for idx in (0, 2):
            cp(blk.mlp_adapter.adapter[idx].weight,
               base + f"mlp.1.adapter.{idx}.weight")
            cp(blk.mlp_adapter.adapter[idx].bias,
               base + f"mlp.1.adapter.{idx}.bias")
    cp(oracle.proj.weight, "image_prefix.proj.weight")
    cp(oracle.proj.bias, "image_prefix.proj.bias")
    cp(oracle.ln.weight, "image_prefix.ln.weight")
    cp(oracle.ln.bias, "image_prefix.ln.bias")
    eb = "image_prefix.enc."
    for i in (1, 2, 3):
        cp(getattr(oracle.enc, f"conv{i}").weight, eb + f"conv{i}.weight")
        _load_bn(getattr(oracle.enc, f"bn{i}"), f32, eb + f"bn{i}")
    for stage in range(1, 5):
        for b, blk in enumerate(getattr(oracle.enc, f"layer{stage}")):
            bb = eb + f"layer{stage}.{b}."
            for c in (1, 2, 3):
                cp(getattr(blk, f"conv{c}").weight, bb + f"conv{c}.weight")
                _load_bn(getattr(blk, f"bn{c}"), f32, bb + f"bn{c}")
            if blk.downsample is not None:
                cp(blk.downsample[1].weight, bb + "downsample.0.weight")
                _load_bn(blk.downsample[2], f32, bb + "downsample.1")


def _load_bn(bn, f32, name):
    bn.weight.data.copy_(f32[name + ".weight"])
    bn.bias.data.copy_(f32[name + ".bias"])
    bn.running_mean.data.copy_(f32[name + ".running_mean"])
    bn.running_var.data.copy_(f32[name + ".running_var"])
