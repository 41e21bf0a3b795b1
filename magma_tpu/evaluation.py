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


def eval_loss(model, dataset, n_batches: int = 25, batch_size: int = 8,
              seed: int = 0) -> float:
    """Mean caption LM loss over random batches (eval_step parity for
    standalone evaluation)."""
    from magma_tpu.data.dataset import collate_fn

    rng = np.random.RandomState(seed)
    losses = []
    for _ in range(n_batches):
        idxs = rng.randint(0, len(dataset), batch_size)
        images, captions = collate_fn([dataset[i] for i in idxs],
                                      seq_len=model.seq_len)
        loss, _ = model.forward(images, captions)
        losses.append(float(loss))
    return float(np.mean(losses))


def eval_captions(model, dataset, n_samples: int = 4, max_steps: int = 30,
                  temperature: float = 0.7, top_p: float = 0.9,
                  seed: int = 0) -> List[Dict]:
    """Sample captions for n images; returns [{pred, refs}]."""
    rng = np.random.RandomState(seed)
    out = []
    for i in rng.randint(0, len(dataset), n_samples):
        img, _ = dataset[int(i)]
        refs = dataset.data[int(i)].get("captions", [])
        emb = model.embed([np.asarray(img)])
        pred = model.generate(emb, max_steps=max_steps,
                              temperature=temperature, top_p=top_p)[0]
        out.append({"pred": pred, "refs": refs})
    return out


def eval_vqa(
    model,
    data_dir: str,
    n_samples: Optional[int] = None,
    max_steps: int = 8,
    prompt_format: str = "Q: {question} A:",
    seed: int = 0,
) -> Dict:
    """Open-ended VQA over a standard-layout dataset dir.

    Each ``image_data/*/*.json`` must carry ``metadata.question`` and
    ``metadata.answers`` (a list of annotator answers).  Returns
    {"accuracy", "n", "answers": [{question, pred, answers, acc}]}.
    """
    from magma_tpu.data.dataset import LazyLoader
    from pathlib import Path
    from PIL import Image

    data_dir = Path(data_dir)
    loader = LazyLoader(data_dir)
    idxs = list(range(len(loader)))
    if n_samples is not None and n_samples < len(idxs):
        np.random.RandomState(seed).shuffle(idxs)
        idxs = idxs[:n_samples]

    records = []
    for i in idxs:
        data = loader[i]
        meta = data.get("metadata", {})
        question = meta.get("question")
        answers = meta.get("answers", [])
        if question is None:
            continue
        img_path = data_dir / data["image_path"]
        img = Image.open(img_path)
        img_arr = model.transforms(img)
        prompt = prompt_format.format(question=question)
        emb = model.embed([np.asarray(img_arr),
                           model.tokenizer.encode(prompt)])
        pred = model.generate(emb, max_steps=max_steps, temperature=0.0)[0]
        # first line / sentence of the generation is the answer
        pred = re.split(r"[\n.]", pred)[0].strip()
        records.append({
            "question": question, "pred": pred, "answers": answers,
            "acc": vqa_accuracy(pred, answers),
        })

    acc = float(np.mean([r["acc"] for r in records])) if records else 0.0
    return {"accuracy": acc, "n": len(records), "answers": records}
