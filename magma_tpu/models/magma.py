"""Magma model facade: LM + tokenizer + ImagePrefix + adapters.

Parity target: magma/magma.py:29-301 — the same public API
(``Magma(config)``, ``preprocess_inputs``, ``embed``, ``forward``,
``generate``, ``from_checkpoint``) over a functional core:

* parameters live in ``self.params = {"lm": ..., "image_prefix": ...}``
  (a pytree), batch-norm statistics in ``self.state``,
* adapters are declared in the LM config at construction (the reference
  mutates modules via setattr, magma.py:102-174),
* freezing is an explicit boolean mask pytree (``trainable_mask()``) —
  implementing the *intended* semantics of the reference's freeze block
  (magma.py:92-100, which as written never sets requires_grad=False; see
  SURVEY.md §3 quirks): frozen LM, trainable adapters + image prefix, the
  encoder trainable unless freeze_img_encoder.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.config import MultimodalConfig
from magma_tpu.models import gptj, image_prefix as ip_mod
from magma_tpu.models.adapters import AdapterSpec
from magma_tpu.ops.sampling import (generate_tokens, generate_tokens_split,
                                    strip_after_eos)
from magma_tpu.tokenizer import get_tokenizer
from magma_tpu.training.labels import (
    build_labels,
    causal_lm_loss,
    causal_lm_loss_chunked,
)


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def build_lm_config(config: MultimodalConfig) -> gptj.GPTJConfig:
    """MultimodalConfig -> GPTJConfig, wiring adapter_config
    (magma/magma.py:73-90) into the block definition."""
    mlp_spec = attn_spec = None
    ac = config.adapter_config or {}
    if ac.get("mlp"):
        mlp_spec = AdapterSpec.from_dict(ac["mlp"])
    if ac.get("attention"):
        attn_spec = AdapterSpec.from_dict(ac["attention"])

    kwargs = dict(
        compute_dtype=_dtype(config.compute_dtype),
        # frozen LM weights are stored in frozen_dtype (bf16: halves HBM;
        # fp32 masters are pointless for parameters that never update);
        # adapters keep fp32 masters via adapter_param_dtype
        param_dtype=(
            _dtype(config.frozen_dtype) if config.freeze_lm
            else _dtype(config.param_dtype)
        ),
        adapter_param_dtype=_dtype(config.param_dtype),
        attention_impl=config.attention_impl,
        remat=config.remat,
        mlp_adapter=mlp_spec,
        attn_adapter=attn_spec,
    )
    if config.lm_overrides:
        kwargs.update(config.lm_overrides)
    return gptj.GPTJConfig.gptj_6b(**kwargs)


def build_prefix_config(
    config: MultimodalConfig, lm_cfg: gptj.GPTJConfig
) -> ip_mod.ImagePrefixConfig:
    overrides = config.encoder_overrides or {}
    return ip_mod.ImagePrefixConfig(
        encoder_name=config.encoder_name,
        out_dim=lm_cfg.d_model,
        image_seq_len=config.image_seq_len,
        dropout_prob=config.image_embed_dropout_prob,
        use_layernorm=config.use_image_embed_layernorm,
        encoder_overrides=tuple(sorted(overrides.items())) or None,
        compute_dtype=_dtype(config.compute_dtype),
    )


class Magma:
    """Multimodal VLM facade.  See module docstring."""

    def __init__(
        self,
        config: Union[str, Path, MultimodalConfig],
        rng: Union[int, jax.Array] = 0,
        init_weights: bool = True,
    ):
        if isinstance(config, (str, Path)):
            config = MultimodalConfig.from_yml(config)
        assert isinstance(config, MultimodalConfig)
        self.config = config

        self.lm_config = build_lm_config(config)
        # config.seq_len caps the training sequence below the LM's native
        # context (e.g. 6B finetuning at seq 256 on one chip); default is
        # the LM maximum, matching the reference (magma/magma.py:44)
        self.seq_len = min(
            config.seq_len or self.lm_config.max_seq_len,
            self.lm_config.max_seq_len,
        )
        self.tokenizer = get_tokenizer(
            "gpt2", sequence_length=self.seq_len,
            strict=getattr(config, "strict_tokenizer", False),
        )
        self.image_token = self.tokenizer.cls_token_id
        self.eos_token = self.tokenizer.eos_token_id

        self.prefix_config = build_prefix_config(config, self.lm_config)
        self.image_prefix_seq_len = self.prefix_config.out_seq_len
        # sequence-parallel mesh for attention_impl="ring": the Trainer
        # sets this to its mesh; eager use can assign it directly
        self.sp_mesh = None

        from magma_tpu.data.transforms import get_transforms

        self.transforms = get_transforms(
            config.image_size,
            config.encoder_name,
            input_resolution=self.prefix_config.input_resolution,
        )

        self.params = None
        self.state = None
        if init_weights:
            if isinstance(rng, int):
                rng = jax.random.PRNGKey(rng)
            k_lm, k_ip = jax.random.split(rng)
            # init under jit: the fp32 RNG -> target-dtype casts fuse, so
            # no full-size fp32 temporaries materialize (a 6B bf16 LM would
            # otherwise OOM a 16 GB chip during eager init)
            lm_cfg, ip_cfg = self.lm_config, self.prefix_config
            ip_params, ip_stats = jax.jit(
                lambda k: ip_mod.init_params(k, ip_cfg)
            )(k_ip)
            if config.train_lm_int8:
                assert config.freeze_lm, "train_lm_int8 requires a frozen LM"
                # init + quantize fused in ONE jit: XLA frees each bf16
                # tensor as soon as its int8 version exists, so the peak
                # stays ~8 GB instead of ~14.5 GB.  Quantizing as a second
                # program left the HBM arena fragmented enough that the
                # training forward OOM'd on a 16 GB chip even though the
                # resident bytes fit.
                # fuse_out_proj=False: training grads flow through the
                # separate o/fc_out int8 matmuls (the fused dual-output
                # serving kernel has no VJP — see gptj.quantize_lm_params)
                lm_params = jax.jit(
                    lambda k: gptj.quantize_lm_params(
                        gptj.init_params(k, lm_cfg), fuse_out_proj=False
                    )
                )(k_lm)
            else:
                lm_params = jax.jit(lambda k: gptj.init_params(k, lm_cfg))(
                    k_lm
                )
            self.params = {"lm": lm_params, "image_prefix": ip_params}
            self.state = {"image_prefix": ip_stats}

    # ------------------------------------------------------------------
    # Freezing policy
    # ------------------------------------------------------------------
    def trainable_mask(self):
        """Boolean pytree: True = trainable.  Implements the intended
        freezing semantics (frozen LM except adapters; image prefix
        trainable; encoder per freeze_img_encoder)."""
        cfg = self.config

        def mask_fn(path, leaf):
            keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
            joined = "/".join(keys)
            if joined.startswith("lm"):
                if "adapter" in joined:
                    return True
                return not cfg.freeze_lm
            if joined.startswith("image_prefix/enc"):
                return not cfg.freeze_img_encoder
            return True  # image_prefix proj / ln

        return jax.tree_util.tree_map_with_path(mask_fn, self.params)

    # ------------------------------------------------------------------
    # Inference API
    # ------------------------------------------------------------------
    def preprocess_inputs(self, input_list: list, embed: bool = True):
        """Strings -> token arrays; ImageInputs -> transformed image
        arrays; optionally embed.  Parity: magma/magma.py:176-193."""
        from magma_tpu.data.image_input import ImageInput

        out = list(input_list)
        for i, inp in enumerate(out):
            if isinstance(inp, str):
                out[i] = self.tokenizer.encode(inp)
            elif isinstance(inp, ImageInput):
                out[i] = inp.get_transformed_image(transform_fn=self.transforms)
            elif isinstance(inp, (np.ndarray, jnp.ndarray)):
                pass  # already a tensor
            elif type(inp).__module__.startswith("PIL."):
                # a raw PIL image: same path ImageInput takes after load
                out[i] = self.transforms(inp)
            else:
                raise Exception(f"Invalid input type:{type(inp)}")
        if embed:
            return self.embed(out)
        return out

    def embed(self, inputs: List) -> jnp.ndarray:
        """List of 2-D token arrays / 4-D image arrays -> (b, s, d)
        embedding sequence, order preserved.  Parity: magma.py:195-212."""
        emb_list = []
        for x in inputs:
            x = jnp.asarray(x)
            if x.ndim == 2:
                emb_list.append(self._embed_tokens_jit(self.params["lm"], x))
            elif x.ndim == 4:
                emb, _ = self._prefix_jit(
                    self.params["image_prefix"], self.state["image_prefix"], x
                )
                emb_list.append(emb)
            else:
                raise ValueError(f"Expected 2d or 4d tensor, got {x.ndim}d")
        return jnp.concatenate(emb_list, axis=1)

    @functools.cached_property
    def _embed_tokens_jit(self):
        cfg = self.lm_config
        return jax.jit(lambda p, ids: gptj.embed_tokens(cfg, p, ids))

    @functools.cached_property
    def _prefix_jit(self):
        cfg = self.prefix_config
        return jax.jit(
            lambda p, s, x: ip_mod.apply(p, s, x, cfg, train=False)
        )

    def generate(
        self,
        embeddings: jnp.ndarray,
        max_steps: int = 100,
        temperature: float = 0.7,
        top_k: int = 0,
        top_p: float = 0.9,
        decode: bool = True,
        rng: Optional[jax.Array] = None,
        prompt_len=None,
        mesh=None,
    ):
        """KV-cached sampling.  Parity: magma.py:214-236 + sampling.py.

        ``prompt_len`` (optional, (b,)) gives per-row true prompt lengths
        for a batch of right-padded prompts (batched VQA/captioning over
        ragged questions); default = the full embedding length.

        ``mesh``: with ``attention_impl="ring"``, shards the KV cache's
        position axis over the mesh's ``sp`` axis for contexts beyond
        one chip's HBM (parallel/sp_decode.py; docs/SERVING.md).
        """
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        embeddings = jnp.asarray(embeddings)
        # bucket prompt lengths to multiples of 64: one compiled program
        # serves a whole bucket of lengths (prompt_len masks the padding),
        # instead of recompiling the decode loop per prompt length
        s = embeddings.shape[1]
        pad = (-s) % 64
        if pad:
            embeddings = jnp.pad(embeddings, ((0, 0), (0, pad), (0, 0)))
        if prompt_len is None:
            prompt_len = jnp.int32(s)
        else:
            prompt_len = jnp.asarray(prompt_len, jnp.int32)
        # large (batch x context) combinations route to the split
        # prefill + decode-window path: the monolithic while-loop program
        # compiled the prompt-shaped prefill INTO the decode loop, and at
        # b=8 x ctx-2048 that single program crashed XLA's compile helper
        # (the reference's eager loop served any shape,
        # magma/sampling.py:43-121).  Token-identical; tested.
        b = embeddings.shape[0]
        extra = {}
        if mesh is not None:
            # sequence-sharded cache (sp) serving: the monolithic program
            # is already sharded over the mesh; the split path is a
            # single-chip compile-size workaround and doesn't apply
            gen = generate_tokens
            extra = dict(mesh=mesh)
        elif b * embeddings.shape[1] > 8192:
            gen = generate_tokens_split
            extra = dict(window=8, prefill_chunk=512)
        else:
            gen = generate_tokens
        tokens, _ = gen(
            self.lm_config, self.params["lm"], embeddings, rng,
            max_steps=max_steps, temperature=float(temperature),
            top_k=int(top_k), top_p=float(top_p), eos_token=self.eos_token,
            prompt_len=prompt_len, **extra,
        )
        tokens = np.asarray(tokens)
        if not decode:
            return tokens
        return [
            self.tokenizer._decode_ids(
                strip_after_eos(row, self.eos_token, self.image_token)
            )
            for row in tokens
        ]

    # ------------------------------------------------------------------
    # Training forward (functional; used by the train loop under jit)
    # ------------------------------------------------------------------
    def loss_fn(
        self,
        params,
        state,
        images: Optional[jnp.ndarray],
        captions: jnp.ndarray,
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
        input_embeddings: Optional[jnp.ndarray] = None,
        return_logits: bool = False,
    ):
        """Pure loss function suitable for jax.grad.  Returns
        (loss, (new_state, logits_or_None)).  Parity: magma/magma.py:238-276.
        Training uses the chunked-loss path (logits=None); pass
        ``return_logits=True`` for eval/debug logits."""
        assert captions is not None, "Must provide captions in training"
        assert (images is None) != (input_embeddings is None), (
            "Pass in either images, or input embeddings, not both."
        )
        assert captions.shape[1] == self.seq_len, (
            f"in training, captions should be padded to sequence length "
            f"({self.seq_len}), but are length {captions.shape[1]}"
        )

        new_state = state
        if input_embeddings is None:
            input_embeddings, new_ip_stats = ip_mod.apply(
                params["image_prefix"], state["image_prefix"], images,
                self.prefix_config, train=train, dropout_rng=rng,
            )
            new_state = {"image_prefix": new_ip_stats}

        s_img = input_embeddings.shape[1]
        labels = build_labels(s_img, captions, self.eos_token)
        word_embeds = gptj.embed_tokens(self.lm_config, params["lm"], captions)
        # drop the caption's right padding so total length stays seq_len
        # (magma.py:261-267)
        embeds = jnp.concatenate(
            [input_embeddings, word_embeds[:, : self.seq_len - s_img]], axis=1
        )
        if return_logits:
            logits, _ = gptj.forward(self.lm_config, params["lm"], embeds,
                                     mesh=self.sp_mesh)
            loss = causal_lm_loss(logits, labels, self.lm_config.vocab_size)
            return loss, (new_state, logits)
        # training path: chunked loss — the full fp32 logits tensor never
        # materializes (see training/labels.py)
        hidden, _ = gptj.forward(
            self.lm_config, params["lm"], embeds, return_hidden=True,
            mesh=self.sp_mesh,
        )
        loss = causal_lm_loss_chunked(
            self.lm_config, params["lm"], hidden, labels
        )
        return loss, (new_state, None)

    def forward(self, images, captions, input_embeddings=None):
        """Eager convenience wrapper (eval/debug).  Training uses
        training/train_loop.py's jitted step."""
        loss, (_, logits) = self.loss_fn(
            self.params, self.state, images, captions, train=False,
            input_embeddings=input_embeddings, return_logits=True,
        )
        return loss, logits

    def quantize_for_serving(self, bits: int = 8) -> "Magma":
        """Quantize the frozen LM weight-only for serving (see
        ops/quant.py).  Irreversible on this instance (originals are
        freed); training requires the full-precision parameters.

        ``bits=8``: ~1.7x single-stream decode, half the HBM footprint,
        argmax-identical next-token predictions in practice.
        ``bits=4``: nibble-packed blocks with 256-row group scales (the
        head stays int8) — measured 123 vs 97 tok/s single-stream on the
        6B flagship, but carries real quantization noise (~1-2% relative
        logit error): validate task metrics before deploying.
        """
        from magma_tpu.models.gptj import (quantize_lm_params,
                                           quantize_lm_params_int4)

        if bits == 8:
            self.params["lm"] = quantize_lm_params(self.params["lm"])
        elif bits == 4:
            self.params["lm"] = quantize_lm_params_int4(self.params["lm"])
        else:
            raise ValueError(f"bits must be 8 or 4, got {bits}")
        self._fold_vision()
        return self

    def _fold_vision(self):
        """Fold the vision tower's BN into conv weights + bf16 (serving;
        see image_prefix.fold_for_serving).  Idempotent."""
        self.params["image_prefix"] = ip_mod.fold_for_serving(
            self.params["image_prefix"], self.state["image_prefix"],
            self.prefix_config,
        )

    def pack_for_serving(self) -> "Magma":
        """Pack the bf16 LM for full-precision serving: the big matrices
        stream through the Pallas stacked-matmul kernel in stored layout
        (see gptj.pack_lm_params_bf16).  Unlike quantize_for_serving this
        is lossless; it removes the XLA weight-relayout temporaries that
        made batched bf16 decode OOM on a single chip.  Reversible only in
        the sense that quantize_for_serving still accepts packed params.
        """
        from magma_tpu.models.gptj import pack_lm_params_bf16

        self.params["lm"] = pack_lm_params_bf16(self.params["lm"])
        self._fold_vision()
        return self

    # ------------------------------------------------------------------
    # Checkpoint
    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        config_path,
        checkpoint_path,
        device=None,
    ) -> "Magma":
        """Load from an Orbax checkpoint directory or a torch
        ``mp_rank_00_model_states.pt`` file (converted on the fly).
        Parity: magma/magma.py:278-301."""
        model = cls(config_path, init_weights=True)
        path = Path(checkpoint_path)
        if path.is_dir():
            # orbax import deferred: torch-file loads don't need it
            from magma_tpu.training import checkpoint as ckpt

            model.params, model.state = ckpt.restore_params(
                str(path), model.params, model.state
            )
        else:
            from magma_tpu.training.torch_convert import load_torch_checkpoint

            model.params, state = load_torch_checkpoint(
                str(path), model.params, model.lm_config, model.prefix_config
            )
            # BN running stats travel as ordinary state-dict entries in the
            # reference checkpoint (magma.py:292-297); dropping them would
            # silently leave fresh mean=0/var=1 stats in the vision tower
            if state is not None:
                model.state = state
        return model
