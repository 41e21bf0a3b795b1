"""Evaluation harness tests (VQA accuracy metric + end-to-end eval flows)."""

import json

import numpy as np
import pytest
from PIL import Image

from magma_tpu.evaluation import (
    eval_captions,
    eval_loss,
    eval_vqa,
    normalize_answer,
    vqa_accuracy,
)


def test_normalize_answer():
    assert normalize_answer("The Cat!") == "cat"
    assert normalize_answer("  a blue car ") == "blue car"


def test_vqa_accuracy_convention():
    answers = ["cat", "cat", "cat", "dog", "cat"]
    assert vqa_accuracy("the cat", answers) == 1.0          # 4 matches -> 1
    assert vqa_accuracy("dog", answers) == pytest.approx(1 / 3)
    assert vqa_accuracy("fish", answers) == 0.0
    assert vqa_accuracy("", answers) == 0.0


@pytest.fixture()
def vqa_dir(tmp_path):
    (tmp_path / "images" / "0").mkdir(parents=True)
    (tmp_path / "image_data" / "0").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / "images" / "0" / f"{i}.jpg"
        )
        with open(tmp_path / "image_data" / "0" / f"{i}.json", "w") as f:
            json.dump({
                "image_path": f"images/0/{i}.jpg",
                "captions": [f"caption {i}"],
                "metadata": {"question": f"what is {i}?",
                             "answers": ["thing"] * 5},
            }, f)
    return tmp_path


def test_eval_vqa_runs(tiny_magma, vqa_dir):
    res = eval_vqa(tiny_magma, str(vqa_dir), max_steps=3)
    assert res["n"] == 3
    assert 0.0 <= res["accuracy"] <= 1.0
    assert {"question", "pred", "answers", "acc"} <= set(res["answers"][0])


def test_eval_loss_and_captions(tiny_magma, vqa_dir):
    from magma_tpu.data.dataset import ImgCptDataset

    ds = ImgCptDataset(vqa_dir, tiny_magma.tokenizer, tiny_magma.transforms,
                       seq_len=tiny_magma.seq_len)
    loss = eval_loss(tiny_magma, ds, n_batches=1, batch_size=2)
    assert np.isfinite(loss) and loss > 5  # untrained ~ ln(vocab)
    caps = eval_captions(tiny_magma, ds, n_samples=2, max_steps=3,
                         temperature=0.0)
    assert len(caps) == 2 and "pred" in caps[0] and "refs" in caps[0]
