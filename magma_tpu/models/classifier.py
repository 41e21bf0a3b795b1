"""Classification fine-tuning head + model.

The reference ships classification *plumbing* — config knobs
(magma/config.py:82,97 ``class_dict``), train/eval steps
(train_loop.py:24-45,63-82 expecting ``(loss, logits)`` from
``engine(images, captions, class_labels)``), a multi-image collate
(utils.py:272-282 for NLVR2-style tasks), and ``class_head`` param groups
(utils.py:194-197) — but **no head or model class exists in the repo**
(SURVEY.md §3 quirks).  This module completes the feature:

* ``MagmaClassifier`` = Magma + a linear class head over the LM's final
  hidden state, read at a configurable interface position:
  - "last_token": hidden state at the last caption position (default),
  - "mean_pool":  mean over non-padding positions.
* supports multiple images per sample (NLVR2 pairs): each image runs the
  prefix; the sequence is [img_0 tokens, img_1 tokens, ..., caption].
* ``class_dict`` keys honored: num_classes, classifier_type
  ("linear"), interface_type ("last_token" | "mean_pool"), freeze_model
  (freezes everything except the head).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.config import MultimodalConfig
from magma_tpu.models import gptj, image_prefix as ip_mod
from magma_tpu.models.magma import Magma


class MagmaClassifier(Magma):
    """Magma with a classification head (completes train_loop.py:24-45)."""

    def __init__(self, config: Union[str, MultimodalConfig], rng=0,
                 init_weights: bool = True):
        super().__init__(config, rng=rng, init_weights=init_weights)
        cd = self.config.class_dict or {}
        assert cd, "MagmaClassifier requires config.class_dict"
        self.num_classes = int(cd["num_classes"])
        self.classifier_type = cd.get("classifier_type", "linear")
        self.interface_type = cd.get("interface_type", "last_token")
        assert self.classifier_type == "linear", self.classifier_type
        assert self.interface_type in ("last_token", "mean_pool")
        self.freeze_model = bool(cd.get("freeze_model", False))

        if init_weights:
            # zero-init head: untrained predictions are exactly uniform
            # (the gradient through the features breaks symmetry on the
            # first step).  Previously seeded via Python's hash(), which
            # is salted per process and made init non-reproducible.
            d = self.lm_config.d_model
            self.params["class_head"] = {
                "kernel": jnp.zeros((d, self.num_classes), jnp.float32),
                "bias": jnp.zeros((self.num_classes,), jnp.float32),
            }

    def trainable_mask(self):
        mask = super().trainable_mask()
        if "class_head" in self.params:
            mask["class_head"] = jax.tree_util.tree_map(
                lambda _: True, self.params["class_head"]
            )
        if self.freeze_model:
            def freeze(path, m):
                keys = "/".join(str(getattr(p, "key", p)) for p in path)
                return keys.startswith("class_head")
            mask = jax.tree_util.tree_map_with_path(freeze, self.params)
        return mask

    # ------------------------------------------------------------------
    def classification_loss_fn(
        self,
        params,
        state,
        images,                     # (b,3,H,W) or list of per-position image
                                    # batches for multi-image samples
        captions: jnp.ndarray,      # (b, seq_len)
        class_labels: jnp.ndarray,  # (b,)
        *,
        train: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        """Pure fn -> (loss, (new_state, logits)).  Matches the contract the
        reference train loop expects from engine(images, captions, labels)."""
        if not isinstance(images, (list, tuple)):
            images = [images]

        new_state = state
        prefix_embeds = []
        for n, img in enumerate(images):
            r = None if rng is None else jax.random.fold_in(rng, n)
            emb, new_ip = ip_mod.apply(
                params["image_prefix"], new_state["image_prefix"], img,
                self.prefix_config, train=train, dropout_rng=r,
            )
            prefix_embeds.append(emb)
            new_state = {"image_prefix": new_ip}
        prefix = jnp.concatenate(prefix_embeds, axis=1)

        s_img = prefix.shape[1]
        word = gptj.embed_tokens(self.lm_config, params["lm"], captions)
        embeds = jnp.concatenate(
            [prefix, word[:, : self.seq_len - s_img]], axis=1
        )
        # hidden states: run blocks + final LN, skip the vocab projection
        cdt = self.lm_config.compute_dtype
        x = embeds.astype(cdt)
        b, s, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        from magma_tpu.ops.rotary import rotary_sincos

        sin, cos = rotary_sincos(positions, self.lm_config.rotary_dim)
        x, _ = gptj._run_blocks(
            self.lm_config, params["lm"]["blocks"], x, sin, cos,
            remat=self.lm_config.remat and train,
        )
        x = gptj._layer_norm(x, params["lm"]["ln_f"], self.lm_config.ln_eps, cdt)

        if self.interface_type == "last_token":
            # last non-padding caption position: captions are right-padded
            # with EOS; use the first EOS (or the final position)
            is_eos = captions[:, : self.seq_len - s_img] == self.eos_token
            first_eos = jnp.argmax(is_eos, axis=1)
            has_eos = jnp.any(is_eos, axis=1)
            last = jnp.where(has_eos, s_img + first_eos, s - 1)
            feat = jnp.take_along_axis(
                x, last[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
        else:
            feat = x.mean(axis=1)

        logits = (
            jnp.dot(feat.astype(jnp.float32),
                    params["class_head"]["kernel"].astype(jnp.float32))
            + params["class_head"]["bias"]
        )
        onehot = jax.nn.one_hot(class_labels, self.num_classes)
        loss = -jnp.mean(
            jnp.sum(onehot * jax.nn.log_softmax(logits, -1), axis=-1)
        )
        return loss, (new_state, logits)

    def forward(self, images, captions, class_labels=None, **kw):
        if class_labels is None:
            return super().forward(images, captions, **kw)
        loss, (_, logits) = self.classification_loss_fn(
            self.params, self.state, images, jnp.asarray(captions),
            jnp.asarray(class_labels), train=False,
        )
        return loss, logits


def collate_fn_classification(
    batch_data: Sequence, seq_len: int = 2048
) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """[(img_0, ..., img_k, caption, label), ...] ->
    ([images_0, ..., images_k], captions, labels).  Parity:
    utils.py:272-282 (NLVR2 multi-image collate)."""
    cols = list(zip(*batch_data))
    image_cols, captions, labels = cols[:-2], cols[-2], cols[-1]
    images_list = [np.concatenate(col, axis=0) for col in image_cols]
    captions = np.concatenate([c[:, :seq_len] for c in captions], axis=0)
    labels = np.asarray(labels)
    return images_list, captions, labels
