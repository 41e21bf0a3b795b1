"""Dataset converter: user iterator -> MAGMA standard on-disk layout.

Parity target: magma/datasets/convert_datasets.py:33-118.  The iterator
yields ``(img_path, {"captions": [...], "metadata": {...}})``; images are
moved/copied into ``images/{n}/`` and one json per sample is written to
``image_data/{n}/{idx}.json`` with at most ``dir_size`` files per
subdirectory.  Optional ``hash_fn`` (e.g. a perceptual hash) records a
dedup hash in metadata; images already relocated are referenced, not
copied twice.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Callable, Iterable, Optional


def save_to_jsons(data_list, target_dir, starting_idx: int = 0) -> None:
    for k, data in enumerate(data_list):
        with open(Path(target_dir) / f"{k + starting_idx}.json", "w") as f:
            json.dump(data, f)


def save_images(img_list, target_dir, mode: str = "mv") -> None:
    op = shutil.move if mode == "mv" else shutil.copy
    for img_path in img_list:
        op(str(img_path), str(target_dir))


def convert_dataset(
    data_dir,
    dir_size: int = 10000,
    hash_fn: Optional[Callable] = None,
    mode: str = "mv",
    ds_iterator: Optional[Iterable] = None,
) -> None:
    """Build a dataset directory in the standard format (see module doc)."""
    data_dir = Path(data_dir)
    os.makedirs(data_dir / "images", exist_ok=True)
    os.makedirs(data_dir / "image_data", exist_ok=True)

    items = list(ds_iterator)
    img_data_list = []
    img_path_list = []
    new_img_locations = {}
    num_img_dirs = 0
    save_img_dir = data_dir / "images" / "0"
    save_data_dir = data_dir / "image_data" / "0"

    for k, (img_path, data) in enumerate(items):
        img_cpt_data = dict(data)

        if str(img_path) in new_img_locations:
            entry = new_img_locations[str(img_path)]
            img_cpt_data["image_path"] = entry["new_img_path"]
            if hash_fn is not None and "hash" in entry:
                img_cpt_data.setdefault("metadata", {})["image_hash"] = entry["hash"]
        else:
            new_img_path = f"images/{save_img_dir.name}/{Path(img_path).name}"
            img_cpt_data["image_path"] = new_img_path
            new_img_locations[str(img_path)] = {"new_img_path": new_img_path}
            img_path_list.append(img_path)

            if hash_fn is not None:
                try:
                    from PIL import Image

                    img = Image.open(img_path).convert("RGB")
                    hash_str = str(hash_fn(img))
                    img_cpt_data.setdefault("metadata", {})["image_hash"] = hash_str
                    new_img_locations[str(img_path)]["hash"] = hash_str
                except Exception:
                    print("Warning: corrupted or non-existent Image")

        img_data_list.append(img_cpt_data)

        last = k == len(items) - 1
        if (len(img_path_list) % dir_size == 0 and len(img_path_list) > 0) or last:
            os.makedirs(save_img_dir, exist_ok=True)
            save_images(img_path_list, save_img_dir, mode=mode)
            img_path_list = []
            num_img_dirs += 1
            save_img_dir = data_dir / "images" / f"{num_img_dirs}"

        if ((k + 1) % dir_size == 0) or last:
            os.makedirs(save_data_dir, exist_ok=True)
            save_to_jsons(
                img_data_list, save_data_dir, starting_idx=max(k + 1 - dir_size, 0)
            )
            img_data_list = []
            save_data_dir = data_dir / "image_data" / f"{(k + 1) // dir_size}"
