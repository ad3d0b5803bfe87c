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

Decode-once cache: on a 1-core host, cv2 jpg decode sustains ~23 img/s while
the b32 train step consumes ~169 img/s/chip — a 7x starvation at reference
scale (8.6k imgs/epoch). ``cache_dir`` (or env ``UNET_TPU_DECODE_CACHE``)
builds a uint8 memmap cache of the decoded/resized arrays on first use; from
epoch 2 (or a warm cache) the loader streams from page cache at >1000 img/s
and only the float normalization runs per batch. The reference never needed
this (its DataLoader forks 4 workers, ``Our_UNet/src/train.py:369-392``);
on a TPU VM the idiomatic equivalent is decode-once, stream-forever.
"""

from __future__ import annotations

import concurrent.futures as cf
import hashlib
import json
import os
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
        cache_dir: Optional[str | Path] = None,
        emit_uint8: bool = False,
    ):
        # normalize=False leaves images in [0,1] — the online on-device
        # augmentation path normalizes AFTER augmenting (data/augment.py).
        # emit_uint8=True skips ALL host float math: images (and clip views /
        # AE targets) leave as raw uint8 and the jitted step normalizes them
        # in-graph (ops/normalize.py) — the 1-core-host starvation fix.
        # Masks stay int32 (cheap) so host-side eval/metrics code is
        # untouched. The device op sequence replays the host normalization
        # (~1-ulp equal under XLA fusion, tests/test_training.py).
        self.emit_uint8 = emit_uint8
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

        # Decode-once uint8 memmap cache (module docstring). Built AFTER
        # host sharding so each host caches only its own shard.
        if cache_dir is None:
            cache_dir = os.environ.get("UNET_TPU_DECODE_CACHE") or None
        self._cache: Optional[Dict[str, np.ndarray]] = None
        if cache_dir and self.image_files:
            self._cache = self._open_or_build_cache(Path(cache_dir))

    def __len__(self) -> int:
        return len(self.image_files)

    def _mask_path(self, img_path: Path) -> Optional[Path]:
        if self.masks_dir is None:
            return None
        if img_path in self.aug_files and self.aug_masks_dir is not None:
            return self.aug_masks_dir / f"{img_path.stem}.png"
        return self.masks_dir / f"{img_path.stem}.png"

    def load_item(self, idx: int) -> Dict[str, np.ndarray]:
        raw = self._decode(idx) if self._cache is None else self._cached(idx)
        return self._finalize(raw)

    def _decode(self, idx: int) -> Dict[str, np.ndarray]:
        """One-time file decode → uint8 arrays (exactly what the cache
        stores): resized RGB image, resized+clamped mask, original dims,
        resized 224² CLIP view. All float math lives in ``_finalize`` so a
        cache round-trip is bit-identical to the direct path."""
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

        raw: Dict[str, np.ndarray] = {
            "image": image, "original_dims": original_dims,
        }

        if mask is not None and self.mode != "reconstruction":
            if mask.shape != (th, tw):
                mask = cv2.resize(mask, (tw, th), interpolation=cv2.INTER_NEAREST)
            raw["mask"] = np.where(
                (mask > 2) & (mask != 255), 0, mask
            ).astype(np.uint8)

        if self.clip_dir is not None and self.mode != "reconstruction":
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
            raw["clip_image"] = clip_img
        return raw

    def _finalize(self, raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """uint8 arrays → the float batch contract (normalization etc.)."""
        item: Dict[str, np.ndarray] = {"original_dims": raw["original_dims"]}

        if self.emit_uint8:
            item["image"] = raw["image"]
            if self.mode == "reconstruction":
                item["target"] = raw["image"]
            else:
                if "mask" in raw:
                    item["mask"] = raw["mask"].astype(np.int32)
                if "clip_image" in raw:
                    item["clip_image"] = raw["clip_image"]
            return item

        img_f = raw["image"].astype(np.float32) / 255.0

        if self.mode == "reconstruction":
            item["image"] = img_f
            item["target"] = img_f
            return item

        item["image"] = (
            (img_f - IMAGENET_MEAN) / IMAGENET_STD if self.normalize else img_f
        )
        if "mask" in raw:
            item["mask"] = raw["mask"].astype(np.int32)
        if "clip_image" in raw:
            clip_f = raw["clip_image"].astype(np.float32) / 255.0
            item["clip_image"] = (clip_f - IMAGENET_MEAN) / IMAGENET_STD
        return item

    # ---- decode-once cache -------------------------------------------------

    def _cache_identity(self) -> Dict:
        return {
            "version": 1,
            "target_size": list(self.target_size),
            "mode": self.mode,
            "has_masks": self.masks_dir is not None,
            "clip_size": self.clip_size if self.clip_dir is not None else 0,
            # name+size+mtime per file: a re-run of the offline pipeline or
            # augmentation invalidates the cache without a manual flush.
            "files": [
                [p.name, st.st_size, st.st_mtime_ns]
                for p in self.image_files
                for st in [p.stat()]
            ],
        }

    def _open_or_build_cache(self, root: Path) -> Dict[str, np.ndarray]:
        ident = self._cache_identity()
        key = hashlib.sha1(json.dumps(
            [str(self.images_dir), str(self.masks_dir), ident["mode"],
             ident["target_size"], ident["clip_size"],
             self.process_index, self.process_count]
        ).encode()).hexdigest()[:12]
        d = root / f"{self.images_dir.parent.name}_{self.images_dir.name}_{key}"
        manifest = d / "manifest.json"
        if manifest.exists():
            try:
                if json.loads(manifest.read_text()) == ident:
                    return self._open_cache(d)
            except Exception:
                pass  # torn/stale manifest → rebuild below
        self._build_cache(d, ident)
        return self._open_cache(d)

    def _open_cache(self, d: Path) -> Dict[str, np.ndarray]:
        cache = {"image": np.load(d / "images.npy", mmap_mode="r"),
                 "original_dims": np.load(d / "dims.npy", mmap_mode="r")}
        if (d / "masks.npy").exists():
            cache["mask"] = np.load(d / "masks.npy", mmap_mode="r")
        if (d / "clips.npy").exists():
            cache["clip_image"] = np.load(d / "clips.npy", mmap_mode="r")
        return cache

    def _build_cache(self, d: Path, ident: Dict) -> None:
        n = len(self.image_files)
        th, tw = self.target_size
        d.mkdir(parents=True, exist_ok=True)
        print(f"decode cache: building {d} ({n} items)...", flush=True)
        mm = np.lib.format.open_memmap
        imgs = mm(d / "images.npy", mode="w+", dtype=np.uint8,
                  shape=(n, th, tw, 3))
        dims = mm(d / "dims.npy", mode="w+", dtype=np.int32, shape=(n, 2))
        masks = clips = None
        # Probe item 0 for which arrays this dataset produces (mask decode
        # can fail per-file, but the SCHEMA is fixed by ctor args).
        if self.masks_dir is not None and self.mode != "reconstruction":
            masks = mm(d / "masks.npy", mode="w+", dtype=np.uint8,
                       shape=(n, th, tw))
        if self.clip_dir is not None and self.mode != "reconstruction":
            cs = self.clip_size
            clips = mm(d / "clips.npy", mode="w+", dtype=np.uint8,
                       shape=(n, cs, cs, 3))
        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            for i, raw in enumerate(pool.map(self._decode, range(n))):
                imgs[i] = raw["image"]
                dims[i] = raw["original_dims"]
                if masks is not None:
                    # Blank-fallback items may lack a mask; zeros match the
                    # reference's blank sample (Our_UNet/src/train.py:284-289).
                    masks[i] = raw.get("mask", 0)
                if clips is not None:
                    clips[i] = raw["clip_image"]
                if (i + 1) % 2000 == 0:
                    print(f"decode cache: {i + 1}/{n}", flush=True)
        for arr in (imgs, dims, masks, clips):
            if arr is not None:
                arr.flush()
        # Manifest written LAST: a killed build leaves no manifest and is
        # rebuilt from scratch on the next run (crash-safe).
        (d / "manifest.json").write_text(json.dumps(ident))
        print(f"decode cache: built {d}", flush=True)

    def _cached(self, idx: int) -> Dict[str, np.ndarray]:
        # np.array copies out of the memmap so batches never pin cache pages.
        return {k: np.array(v[idx]) for k, v in self._cache.items()}


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
