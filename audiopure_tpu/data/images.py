"""Image-directory datasets for the improved-diffusion image CLIs.

Rebuild of ``Improved_Diffusion_Unconditional/improved_diffusion/
image_datasets.py:8-106``: recursive listing of jpg/jpeg/png/gif files,
optional class labels parsed from the filename prefix (``:31-36``),
BOX-downsample-by-halves then BICUBIC resize then center crop
(``:85-100``), values scaled to [-1, 1] CHW float32 (``:101-106``).

The reference shards across MPI ranks (``:41-43``); here sharding is an
explicit (shard, num_shards) pair — under a dp mesh the single controller
feeds every chip from one loader, so the default covers the whole dataset.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from audiopure_tpu.data.loader import DataLoader, infinite

_IMAGE_EXTS = ("jpg", "jpeg", "png", "gif")


def list_image_files(data_dir: str) -> list:
    """Recursive, sorted listing (ref ``_list_image_files_recursively``)."""
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1].lower()
        if "." in entry and ext in _IMAGE_EXTS:
            results.append(full)
        elif os.path.isdir(full):
            results.extend(list_image_files(full))
    return results


def _load_image(path: str, resolution: int) -> np.ndarray:
    """Decode + resize + center-crop one image to (3, R, R) in [-1, 1]
    (ref ``ImageDataset.__getitem__:78-106``)."""
    from PIL import Image

    with open(path, "rb") as f:
        pil_image = Image.open(f)
        pil_image.load()

    # BOX-downsample by powers of two first for quality (ref ``:85-90``)
    while min(*pil_image.size) >= 2 * resolution:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)

    scale = resolution / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.BICUBIC)

    arr = np.array(pil_image.convert("RGB"))
    crop_y = (arr.shape[0] - resolution) // 2
    crop_x = (arr.shape[1] - resolution) // 2
    arr = arr[crop_y:crop_y + resolution, crop_x:crop_x + resolution]
    arr = arr.astype(np.float32) / 127.5 - 1
    return np.transpose(arr, (2, 0, 1))


class ImageFolderDataset:
    """len/getitem dataset of (image, [label]) dicts.

    ``class_cond`` parses the label from the filename chunk before the
    first underscore, densely re-indexed over the sorted unique names
    (ref ``load_data:31-36``).
    """

    def __init__(self, data_dir: str, resolution: int,
                 class_cond: bool = False, shard: int = 0,
                 num_shards: int = 1):
        if not data_dir:
            raise ValueError("unspecified data directory")
        all_files = list_image_files(data_dir)
        classes = None
        if class_cond:
            names = [os.path.basename(p).split("_")[0] for p in all_files]
            index = {x: i for i, x in enumerate(sorted(set(names)))}
            classes = [index[x] for x in names]
        self.resolution = resolution
        self.files = all_files[shard:][::num_shards]
        self.classes = None if classes is None else \
            classes[shard:][::num_shards]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        out = {"image": _load_image(self.files[idx], self.resolution)}
        if self.classes is not None:
            out["y"] = np.int32(self.classes[idx])
        return out


def load_image_data(data_dir: str, batch_size: int, image_size: int,
                    class_cond: bool = False, deterministic: bool = False,
                    seed: int = 0) -> Iterator[dict]:
    """Infinite generator of collated image batches (ref ``load_data``)."""
    ds = ImageFolderDataset(data_dir, image_size, class_cond=class_cond)
    return infinite(DataLoader(ds, batch_size,
                               shuffle=not deterministic,
                               drop_last=True, seed=seed))


def area_downsample(batch: np.ndarray, small_size: int) -> np.ndarray:
    """(B, C, H, W) -> (B, C, s, s) by block mean — torch
    ``F.interpolate(mode="area")`` for integer factors
    (``super_res_train.py:71``)."""
    b, c, h, w = batch.shape
    assert h % small_size == 0 and w % small_size == 0, (h, w, small_size)
    fh, fw = h // small_size, w // small_size
    x = batch.reshape(b, c, small_size, fh, small_size, fw)
    return x.mean(axis=(3, 5))


def load_superres_data(data_dir: str, batch_size: int, large_size: int,
                       small_size: int, class_cond: bool = False,
                       seed: int = 0) -> Iterator[dict]:
    """Large images + area-downsampled ``low_res`` conditioning
    (ref ``super_res_train.py:63-72``)."""
    data = load_image_data(data_dir, batch_size, large_size,
                           class_cond=class_cond, seed=seed)
    for batch in data:
        batch = dict(batch)
        batch["low_res"] = area_downsample(np.asarray(batch["image"]),
                                           small_size)
        yield batch
