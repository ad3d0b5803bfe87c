"""Synthetic pet-like data for smoke tests and benchmarks.

Generates images with an elliptical "pet" (class 1=cat or 2=dog) on textured
background, with a 255 border ring around the object — structurally matching
the Oxford-IIIT Pet trimap format the reference consumes ({0,1,2,255} masks,
ImageNet-normalized RGB). Learnable in a few steps, so end-to-end smoke
trains can assert loss decrease and nonzero foreground Dice on CPU.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def synthetic_sample(
    rng: np.random.Generator, size: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """One (image[H,W,3] normalized f32, mask[H,W] int32) pair."""
    cls = int(rng.integers(1, 3))  # 1=cat, 2=dog
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy, cx = rng.uniform(0.3, 0.7, 2) * size
    ry, rx = rng.uniform(0.15, 0.3, 2) * size
    dist = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
    inside = dist <= 1.0
    border = (dist > 1.0) & (dist <= 1.25)

    mask = np.zeros((size, size), np.int32)
    mask[inside] = cls
    mask[border] = 255

    img = rng.normal(0.4, 0.08, (size, size, 3)).astype(np.float32)
    # Class-dependent object color so the task is learnable.
    color = np.array([0.85, 0.3, 0.25] if cls == 1 else [0.25, 0.35, 0.85], np.float32)
    img[inside] = color + rng.normal(0, 0.05, (int(inside.sum()), 3)).astype(np.float32)
    img = np.clip(img, 0, 1)
    img_norm = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img_norm.astype(np.float32), mask


def synthetic_batch(
    seed: int,
    batch_size: int,
    size: int = 128,
    with_clip: bool = False,
    reconstruction: bool = False,
) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    images, masks = zip(*(synthetic_sample(rng, size) for _ in range(batch_size)))
    batch = {"image": np.stack(images), "mask": np.stack(masks)}
    if reconstruction:
        # AE pipeline uses [0,1] images with target == image, no normalization
        # (reference reconstruction/src/train.py:256-266).
        raw = batch["image"] * IMAGENET_STD + IMAGENET_MEAN
        batch = {"image": raw.astype(np.float32), "target": raw.astype(np.float32)}
    if with_clip:
        batch["clip_features"] = rng.normal(size=(batch_size, 512)).astype(np.float32)
    return batch


def synthetic_epoch(
    seed: int,
    num_batches: int,
    batch_size: int,
    size: int = 128,
    **kw,
) -> Iterator[Dict[str, np.ndarray]]:
    for i in range(num_batches):
        yield synthetic_batch(seed * 100003 + i, batch_size, size, **kw)
