"""Image-caption dataset over the MAGMA on-disk format.

Parity target: magma/datasets/dataset.py:92-160.  Format:

    {data_dir}/images/{n}/xxx.jpg
    {data_dir}/image_data/{n}/{idx}.json   — {"image_path": ...,
                                              "captions": [...],
                                              "metadata": {...}}

Behavioral parity:
* lazy per-item json loading with unreadable-json -> random retry
  (dataset.py:78-89),
* missing "image_path" key -> sibling .jpg inferred from the json path
  (dataset.py:119-132),
* random caption choice per access (dataset.py:135),
* captions tokenized padded to seq_len with EOS (dataset.py:136-142),
* corrupt/unreadable image -> random other index (dataset.py:144-152).

TPU-native: emits numpy arrays (no torch tensors); batching via
``collate_fn`` + the prefetching loader in data/loader.py feeding the
jit-sharded train step.
"""

from __future__ import annotations

import json
import random
import traceback
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np


def load_json(filename):
    try:
        with open(filename) as f:
            return json.load(f)
    except Exception:
        print(f"ERROR: Error loading json file {filename}")
        traceback.print_exc()
        return None


def _load_paths(data_dir: Path) -> List[Path]:
    img_data_dir = Path(data_dir) / "image_data"
    return sorted(img_data_dir.glob("*/*.json"))


class LazyLoader:
    """Lazy json-per-item access with corrupt-file fallback."""

    def __init__(self, data_dir):
        self.paths = _load_paths(Path(data_dir))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        data = load_json(self.paths[idx])
        if data is None:
            return self[random.randint(0, len(self) - 1)]
        return data


class ImgCptDataset:
    """Map-style dataset -> (image (1,3,H,W) float32, caption (1,seq) int32)."""

    def __init__(
        self,
        data_dir,
        tokenizer,
        transforms,
        seq_len: int = 2048,
        load_data_in_memory: bool = False,
    ):
        self.data_dir = Path(data_dir)
        self.tokenizer = tokenizer
        self.transforms = transforms
        self.seq_len = seq_len
        self.load_data_in_memory = load_data_in_memory
        self._lazy = LazyLoader(self.data_dir)
        if load_data_in_memory:
            self.data = [load_json(p) for p in self._lazy.paths]
            self.data = [d for d in self.data if d is not None]
        else:
            self.data = self._lazy

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image, UnidentifiedImageError

        img_data = self.data[idx]
        img_path = None
        try:
            if "image_path" in img_data:
                img_path = self.data_dir / img_data["image_path"]
            else:
                # infer sibling .jpg from the json path
                p = self._lazy.paths[idx]
                img_path = (
                    self.data_dir / "images" / p.parent.name
                ) / p.with_suffix(".jpg").name
            img = Image.open(img_path)
            img_arr = self.transforms(img)
            caption = random.choice(img_data["captions"])
            caption_arr = self.tokenizer.encode(
                caption, max_length=self.seq_len, padding="max_length",
                truncation=True,
            )
            return np.asarray(img_arr, np.float32), caption_arr
        except (UnidentifiedImageError, OSError, IndexError, KeyError):
            print(f"Warning: Could not load image {img_path}")
            return self[random.randint(0, len(self) - 1)]


def collate_fn(
    batch_data: Sequence[Tuple[np.ndarray, np.ndarray]], seq_len: int = 2048
) -> Tuple[np.ndarray, np.ndarray]:
    """[(img, cpt), ...] -> (images (b,3,H,W), captions (b,seq)).
    Parity: dataset.py:155-160."""
    all_images, all_captions = zip(*batch_data)
    return (
        np.concatenate(all_images, axis=0),
        np.concatenate([c[:, :seq_len] for c in all_captions], axis=0),
    )


class ConcatDataset:
    """Concatenation of datasets (replaces torch.utils.data.ConcatDataset
    used at train.py:36-38)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[ds][idx - int(self._offsets[ds])]


class SubsetDataset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


def random_split(dataset, lengths: Sequence[int], seed: int = 0):
    """Deterministic random split (replaces torch random_split at
    train.py:62)."""
    assert sum(lengths) == len(dataset)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(dataset))
    out, start = [], 0
    for n in lengths:
        out.append(SubsetDataset(dataset, perm[start : start + n]))
        start += n
    return out
