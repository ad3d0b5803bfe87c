"""Host-side dataset + threaded prefetching batch loader.

Replaces the reference's in-trainer Dataset classes + DataLoader workers
(``Our_UNet/src/train.py:204-394``, CLIP variant ``CLIP_UNet/src/train.py:
187-327``, AE variant ``reconstruction/src/train.py:185-267``) with one
host loader producing NHWC numpy batches ready for ``device_put``:

- images: cv2 BGR→RGB, resize LINEAR to 512², /255, ImageNet mean/std
  (segmentation) or plain [0,1] (reconstruction — the AE skips normalization)
- masks: grayscale, resize NEAREST, stray values ``(v>2)&(v!=255)→0``
- original dims recorded pre-resize (the eval protocol needs them)
- optional 224² CLIP image from ``resized_clip/`` (fallback: on-the-fly
  resize), ImageNet-normalized (reference quirk: ImageNet stats, not CLIP's)
- augmented images from ``../augmented/{images,masks}`` included for train
- multi-host: the file list is sharded by ``jax.process_index()``

Prefetching uses a small thread pool (images decode in parallel while the
device is busy) instead of forked DataLoader workers.
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class PetDataset:
    """File-list dataset over the processed directory schema."""

    def __init__(
        self,
        images_dir: str | Path,
        masks_dir: Optional[str | Path] = None,
        include_augmented: bool = True,
        target_size: Tuple[int, int] = (512, 512),
        mode: str = "segmentation",  # "segmentation" | "reconstruction"
        clip_dir: Optional[str | Path] = None,
        clip_size: int = 224,
        process_index: int = 0,
        process_count: int = 1,
        normalize: bool = True,
    ):
        # normalize=False leaves images in [0,1] — the online on-device
        # augmentation path normalizes AFTER augmenting (data/augment.py).
        self.images_dir = Path(images_dir)
        self.masks_dir = Path(masks_dir) if masks_dir else None
        self.target_size = target_size
        self.mode = mode
        self.normalize = normalize
        self.clip_dir = Path(clip_dir) if clip_dir else None
        self.clip_size = clip_size

        self.image_files: List[Path] = sorted(self.images_dir.glob("*.jpg"))
        self.aug_masks_dir: Optional[Path] = None
        if include_augmented:
            aug_images = self.images_dir.parent / "augmented" / "images"
            if aug_images.exists():
                self.aug_masks_dir = self.images_dir.parent / "augmented" / "masks"
                aug_list = sorted(aug_images.glob("*.jpg"))
                self.aug_files = set(aug_list)
                self.image_files.extend(aug_list)
        if self.aug_masks_dir is None:
            self.aug_files = set()

        # Multi-host input sharding: EQUAL-size contiguous shards (remainder
        # dropped). Striding (files[i::n]) would give hosts different file
        # counts — the host with an extra batch then dispatches a collective
        # the others never join (distributed deadlock).
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1:
            files = list(self.image_files)
            if files and len(files) % process_count:
                # Pad to a multiple of process_count by wrapping from the
                # start: per-host counts stay equal (no collective deadlock)
                # and no file is dropped from every epoch (a trailing
                # remainder would otherwise never be seen by any host).
                pad = process_count - len(files) % process_count
                # Wrap modularly: files[:pad] falls short when
                # len(files) < pad (e.g. 1 file / 3 hosts), which would
                # leave every host with an empty shard.
                files = files + [files[i % len(files)] for i in range(pad)]
            per_host = len(files) // process_count
            start = process_index * per_host
            self.image_files = files[start:start + per_host]

    def __len__(self) -> int:
        return len(self.image_files)

    def _mask_path(self, img_path: Path) -> Optional[Path]:
        if self.masks_dir is None:
            return None
        if img_path in self.aug_files and self.aug_masks_dir is not None:
            return self.aug_masks_dir / f"{img_path.stem}.png"
        return self.masks_dir / f"{img_path.stem}.png"

    def load_item(self, idx: int) -> Dict[str, np.ndarray]:
        img_path = self.image_files[idx]
        th, tw = self.target_size
        try:
            image = cv2.imread(str(img_path))
            if image is None:
                raise ValueError(f"Failed to load image: {img_path}")
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

            mask = None
            mask_path = self._mask_path(img_path)
            if mask_path is not None:
                mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
                if mask is None:
                    raise ValueError(f"Failed to load mask: {mask_path}")
                original_dims = np.array(mask.shape[:2], np.int32)
            else:
                original_dims = np.array(image.shape[:2], np.int32)
        except Exception as e:
            # Blank fallback sample, matching the reference's defensive path
            # (Our_UNet/src/train.py:284-289).
            print(f"Error loading image or mask: {e}")
            image = np.zeros((th, tw, 3), np.uint8)
            mask = np.zeros((th, tw), np.uint8) if self.masks_dir else None
            original_dims = np.array(self.target_size, np.int32)

        # Pre-resize decode, kept for the on-the-fly CLIP fallback below —
        # the precomputed resized_clip/ images are ONE resize from the
        # original; resizing the 512² copy again would drift pixel-wise.
        decoded = image
        if image.shape[:2] != (th, tw):
            image = cv2.resize(image, (tw, th), interpolation=cv2.INTER_LINEAR)

        item: Dict[str, np.ndarray] = {"original_dims": original_dims}

        if self.mode == "reconstruction":
            img_f = image.astype(np.float32) / 255.0
            item["image"] = img_f
            item["target"] = img_f
            return item

        img_f = image.astype(np.float32) / 255.0
        item["image"] = (
            (img_f - IMAGENET_MEAN) / IMAGENET_STD if self.normalize else img_f
        )

        if mask is not None:
            if mask.shape != (th, tw):
                mask = cv2.resize(mask, (tw, th), interpolation=cv2.INTER_NEAREST)
            mask = np.where((mask > 2) & (mask != 255), 0, mask)
            item["mask"] = mask.astype(np.int32)

        if self.clip_dir is not None:
            clip_path = self.clip_dir / img_path.name
            clip_img = cv2.imread(str(clip_path)) if clip_path.exists() else None
            if clip_img is None:
                clip_img = cv2.resize(
                    decoded, (self.clip_size, self.clip_size),
                    interpolation=cv2.INTER_LINEAR,
                )
            else:
                clip_img = cv2.cvtColor(clip_img, cv2.COLOR_BGR2RGB)
            if clip_img.shape[:2] != (self.clip_size, self.clip_size):
                # A clip_dir holding non-224 images (e.g. pointed at a
                # resized/ tree) still yields the SAME cv2 pixel path as the
                # fallback — one resize, before normalization.
                clip_img = cv2.resize(
                    clip_img, (self.clip_size, self.clip_size),
                    interpolation=cv2.INTER_LINEAR,
                )
            clip_f = clip_img.astype(np.float32) / 255.0
            item["clip_image"] = (clip_f - IMAGENET_MEAN) / IMAGENET_STD
        return item


def batch_iterator(
    dataset: PetDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    num_threads: int = 8,
    prefetch: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked numpy batches with threaded decode + prefetch."""
    num_threads = max(1, num_threads)
    prefetch = max(1, prefetch)
    indices = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(indices)
    if drop_last:
        indices = indices[: (len(indices) // batch_size) * batch_size]
    if len(indices) == 0:
        return

    chunks = [indices[i:i + batch_size] for i in range(0, len(indices), batch_size)]

    # Per-ITEM futures (not per-batch): every decode in the prefetch window
    # runs on the pool concurrently — cv2 releases the GIL in imread/resize,
    # so a 32-image batch decodes ~num_threads-wide instead of serially.
    with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
        def submit(chunk):
            return [pool.submit(dataset.load_item, int(i)) for i in chunk]

        pending = [submit(c) for c in chunks[:prefetch]]
        next_submit = prefetch
        for i in range(len(chunks)):
            futs = pending[i]
            pending[i] = None  # release consumed futures (and their items)
            if next_submit < len(chunks):
                pending.append(submit(chunks[next_submit]))
                next_submit += 1
            items = [f.result() for f in futs]
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
            batch["index"] = np.asarray(chunks[i], np.int64)
            yield batch
