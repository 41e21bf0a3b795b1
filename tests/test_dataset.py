"""Dataset + converter tests over a tmpdir fixture in the reference's
json/images on-disk layout (magma/datasets/dataset.py:95)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from magma_tpu.data.convert import convert_dataset
from magma_tpu.data.dataset import (
    ConcatDataset,
    ImgCptDataset,
    collate_fn,
    random_split,
)
from magma_tpu.tokenizer import ByteFallbackTokenizer


def _identity_transform(img):
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)[None]


@pytest.fixture()
def dataset_dir(tmp_path):
    """Standard layout: images/0/*.jpg + image_data/0/*.json."""
    (tmp_path / "images" / "0").mkdir(parents=True)
    (tmp_path / "image_data" / "0").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        img = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
        img.save(tmp_path / "images" / "0" / f"img{i}.jpg")
        with open(tmp_path / "image_data" / "0" / f"{i}.json", "w") as f:
            json.dump(
                {
                    "image_path": f"images/0/img{i}.jpg",
                    "captions": [f"caption number {i}", f"alt caption {i}"],
                    "metadata": {},
                },
                f,
            )
    return tmp_path


def test_dataset_getitem(dataset_dir):
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64)
    assert len(ds) == 6
    img, cap = ds[0]
    assert img.shape == (1, 3, 32, 32)
    assert cap.shape == (1, 64)
    assert cap.dtype == np.int32


def test_dataset_eager_load(dataset_dir):
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64,
                       load_data_in_memory=True)
    assert len(ds) == 6
    img, cap = ds[3]
    assert img.shape == (1, 3, 32, 32)


def test_corrupt_image_falls_back_to_random_index(dataset_dir):
    # truncate one image file -> unreadable
    with open(dataset_dir / "images" / "0" / "img2.jpg", "wb") as f:
        f.write(b"not a jpeg")
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64)
    img, cap = ds[2]  # must not raise; retries another index
    assert img.shape == (1, 3, 32, 32)


def test_missing_image_path_inferred_from_json_name(dataset_dir):
    # rewrite one json without image_path; image renamed to match json stem
    os.rename(
        dataset_dir / "images" / "0" / "img4.jpg",
        dataset_dir / "images" / "0" / "4.jpg",
    )
    with open(dataset_dir / "image_data" / "0" / "4.json", "w") as f:
        json.dump({"captions": ["no path"], "metadata": {}}, f)
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64)
    img, cap = ds[4]
    assert img.shape == (1, 3, 32, 32)


def test_collate(dataset_dir):
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64)
    images, captions = collate_fn([ds[0], ds[1], ds[2]], seq_len=64)
    assert images.shape == (3, 3, 32, 32)
    assert captions.shape == (3, 64)


def test_concat_and_split(dataset_dir):
    tok = ByteFallbackTokenizer(64)
    ds = ImgCptDataset(dataset_dir, tok, _identity_transform, seq_len=64)
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 12
    img, _ = cat[7]
    assert img.shape == (1, 3, 32, 32)
    a, b = random_split(cat, [9, 3])
    assert len(a) == 9 and len(b) == 3
    a[0]


def test_convert_dataset_roundtrip(tmp_path):
    """convert_dataset builds the standard layout readable by
    ImgCptDataset (convert_datasets.py:33-118 parity)."""
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(1)
    items = []
    for i in range(5):
        p = src / f"pic{i}.jpg"
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
        items.append((p, {"captions": [f"c{i}"], "metadata": {}}))

    out = tmp_path / "converted"
    convert_dataset(out, dir_size=2, mode="cp", ds_iterator=items)

    jsons = sorted((out / "image_data").glob("*/*.json"))
    assert len(jsons) == 5
    data = json.loads(jsons[0].read_text())
    assert "image_path" in data and (out / data["image_path"]).exists()

    tok = ByteFallbackTokenizer(32)
    ds = ImgCptDataset(out, tok, _identity_transform, seq_len=32)
    assert len(ds) == 5
    img, cap = ds[0]
    assert img.shape == (1, 3, 16, 16)


def test_convert_dataset_dedup_hash(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    p = src / "same.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    items = [(p, {"captions": ["a"], "metadata": {}}),
             (p, {"captions": ["b"], "metadata": {}})]
    out = tmp_path / "conv"
    convert_dataset(out, mode="cp", hash_fn=lambda img: "HASH",
                    ds_iterator=items)
    jsons = sorted((out / "image_data").glob("*/*.json"))
    metas = [json.loads(j.read_text()) for j in jsons]
    assert all(m["metadata"]["image_hash"] == "HASH" for m in metas)
    # both entries point at the same stored image
    assert metas[0]["image_path"] == metas[1]["image_path"]
