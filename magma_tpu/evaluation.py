"""Evaluation harness: caption loss, caption sampling, VQA-style accuracy.

The reference gestures at downstream evaluation — config knobs ``vqa_dir``
/ ``gqa_dir`` (configs/MAGMA_v2.yml:30-31), a wandb answers table
(utils.py:248-253) — but ships no eval code.  This module completes it:

* ``eval_loss``: mean LM loss over a dataset (parity with eval_step),
* ``eval_captions``: sample captions for N images (what the reference's
  broken inference_step intended),
* ``eval_vqa``: open-ended QA over datasets in the standard on-disk layout
  where each json carries ``metadata.question`` and ``metadata.answers``;
  prompts are built MAGMA-style ("Q: {q} A:"), generation is greedy, and
  accuracy follows the VQA convention min(#matching annotators / 3, 1)
  with standard answer normalization.
"""

from __future__ import annotations

import re
import string
from typing import Dict, List, Optional, Sequence

import numpy as np

_ARTICLES = {"a", "an", "the"}
_PUNCT = str.maketrans("", "", string.punctuation)


def normalize_answer(text: str) -> str:
    """VQA-style normalization: lowercase, strip punctuation/articles and
    extra whitespace."""
    text = text.lower().strip().translate(_PUNCT)
    words = [w for w in text.split() if w not in _ARTICLES]
    return " ".join(words)


def vqa_accuracy(prediction: str, answers: Sequence[str]) -> float:
    """min(#annotators agreeing / 3, 1) over normalized answers."""
    pred = normalize_answer(prediction)
    if not pred:
        return 0.0
    matches = sum(normalize_answer(a) == pred for a in answers)
    return min(matches / 3.0, 1.0)


def _eval_loss_jit(model):
    """Per-model cached jitted eval loss: jax.jit caches by function
    identity, so building a fresh lambda per eval_loss call would retrace
    and recompile the full loss program every eval tick."""
    import jax

    if not hasattr(model, "_eval_loss_jit"):
        model._eval_loss_jit = jax.jit(
            lambda p, s, i, c: model.loss_fn(p, s, i, c, train=False)[0]
        )
    return model._eval_loss_jit


def eval_loss(model, dataset, n_batches: int = 25, batch_size: int = 8,
              seed: int = 0) -> float:
    """Mean caption LM loss over random batches (eval_step parity for
    standalone evaluation).

    Uses the jitted chunked-loss path — one compiled program for all
    batches, and the (b, s, vocab) fp32 logits never materialize, so this
    runs against the 6B flagship on a single chip."""
    from magma_tpu.data.dataset import collate_fn

    loss_jit = _eval_loss_jit(model)
    rng = np.random.RandomState(seed)
    losses = []
    for _ in range(n_batches):
        idxs = rng.randint(0, len(dataset), batch_size)
        images, captions = collate_fn([dataset[i] for i in idxs],
                                      seq_len=model.seq_len)
        losses.append(loss_jit(model.params, model.state, images, captions))
    return float(np.mean([float(l) for l in losses]))


def eval_captions(model, dataset, n_samples: int = 4, max_steps: int = 30,
                  temperature: float = 0.7, top_p: float = 0.9,
                  seed: int = 0) -> List[Dict]:
    """Sample captions for n images in ONE batched generate call;
    returns [{pred, refs}]."""
    rng = np.random.RandomState(seed)
    idxs = [int(i) for i in rng.randint(0, len(dataset), n_samples)]
    images = np.concatenate([np.asarray(dataset[i][0]) for i in idxs])
    emb = model.embed([images])
    preds = model.generate(emb, max_steps=max_steps,
                           temperature=temperature, top_p=top_p)
    return [
        {"pred": pred, "refs": dataset.data[i].get("captions", [])}
        for pred, i in zip(preds, idxs)
    ]


def eval_vqa(
    model,
    data_dir: str,
    n_samples: Optional[int] = None,
    max_steps: int = 8,
    prompt_format: str = "Q: {question} A:",
    seed: int = 0,
    batch_size: int = 8,
) -> Dict:
    """Open-ended VQA over a standard-layout dataset dir.

    Each ``image_data/*/*.json`` must carry ``metadata.question`` and
    ``metadata.answers`` (a list of annotator answers).  Returns
    {"accuracy", "n", "answers": [{question, pred, answers, acc}]}.

    Questions run in batches of ``batch_size``: prompts are right-padded
    to a common length and decoded with per-row prompt lengths (ragged
    batched decode; numerics identical to one-at-a-time generation) — one
    compiled program and b× fewer decode loops than the per-image path.
    """
    import jax.numpy as jnp

    from magma_tpu.data.dataset import LazyLoader
    from pathlib import Path
    from PIL import Image

    data_dir = Path(data_dir)
    loader = LazyLoader(data_dir)
    idxs = list(range(len(loader)))
    if n_samples is not None and n_samples < len(idxs):
        np.random.RandomState(seed).shuffle(idxs)
        idxs = idxs[:n_samples]

    def sample_stream():
        """Decode images lazily so host RAM holds at most one batch of
        pixels (a full VQA val set preloaded would OOM the host)."""
        for i in idxs:
            data = loader[i]
            meta = data.get("metadata", {})
            question = meta.get("question")
            if question is None:
                continue
            img = Image.open(data_dir / data["image_path"])
            tokens = model.tokenizer.encode(
                prompt_format.format(question=question)
            )[0]
            yield {
                "question": question,
                "answers": meta.get("answers", []),
                "image": np.asarray(model.transforms(img)),
                "tokens": tokens,
            }

    def batched(it, n):
        buf = []
        for s in it:
            buf.append(s)
            if len(buf) == n:
                yield buf
                buf = []
        if buf:
            yield buf

    records = []
    eos = model.eos_token
    for chunk in batched(sample_stream(), batch_size):
        images = np.concatenate([s["image"] for s in chunk])
        # right-pad token prompts to the longest in the batch (pad = eos;
        # masked out of attention via per-row prompt_len)
        text_lens = [len(s["tokens"]) for s in chunk]
        width = max(text_lens)
        tokens = np.full((len(chunk), width), eos, np.int32)
        for r, s_ in enumerate(chunk):
            tokens[r, : text_lens[r]] = s_["tokens"]
        emb = model.embed([images, tokens])
        n_img = emb.shape[1] - width
        prompt_len = jnp.asarray(
            [n_img + t for t in text_lens], jnp.int32
        )
        preds = model.generate(
            emb, max_steps=max_steps, temperature=0.0, prompt_len=prompt_len
        )
        for s_, pred in zip(chunk, preds):
            # first line / sentence of the generation is the answer
            pred = re.split(r"[\n.]", pred)[0].strip()
            records.append({
                "question": s_["question"], "pred": pred,
                "answers": s_["answers"],
                "acc": vqa_accuracy(pred, s_["answers"]),
            })

    acc = float(np.mean([r["acc"] for r in records])) if records else 0.0
    return {"accuracy": acc, "n": len(records), "answers": records}
