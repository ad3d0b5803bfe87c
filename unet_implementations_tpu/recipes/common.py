"""Shared recipe plumbing: the evaluation protocols and artifact writers.

The segmentation eval protocol (``Our_UNet/src/evaluate.py:150-268``) is
original-resolution: argmax predictions AND 512² masks are nearest-resized to
each image's original dims before metric accumulation. Ragged per-image
shapes are hostile to jit, so the resize + accumulate happens host-side in
numpy with the exact torch-nearest index math (floor(dst*in/out)) — the
forward pass and argmax stay on device.

Writes ``evaluation_results.json`` with the reference's exact schema, and
``reconstruction_metrics.json`` for the AE recipe
(``reconstruction/src/evaluate.py:268-378``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.ops.losses import psnr as psnr_fn, ssim as ssim_fn
from unet_implementations_tpu.ops.metrics import SegmentationMetrics


def resize_nearest_np(arr: np.ndarray, size) -> np.ndarray:
    """Host-side nearest resize with torch/cv2 floor index semantics."""
    in_h, in_w = arr.shape[:2]
    out_h, out_w = int(size[0]), int(size[1])
    rows = np.clip(
        np.floor(np.arange(out_h, dtype=np.float64) * (in_h / out_h)).astype(np.int64),
        0, in_h - 1,
    )
    cols = np.clip(
        np.floor(np.arange(out_w, dtype=np.float64) * (in_w / out_w)).astype(np.int64),
        0, in_w - 1,
    )
    return arr[rows][:, cols]


def evaluate_segmentation(
    predict_fn: Callable[[Dict], np.ndarray],
    dataset: PetDataset,
    batch_size: int = 32,
    output_dir: Optional[str | Path] = None,
    verbose: bool = True,
) -> Dict:
    """Dataset-level evaluation at original resolution.

    ``predict_fn(batch) -> (B, 512, 512) int predictions`` (device-side
    forward + argmax). Returns the reference's results dict and writes
    ``evaluation_results.json`` when ``output_dir`` is given.
    """
    metrics = SegmentationMetrics(num_classes=3, ignore_index=255)
    for batch in batch_iterator(dataset, batch_size, shuffle=False):
        preds = np.asarray(predict_fn(batch))
        masks = batch["mask"]
        dims = batch["original_dims"]
        for j in range(preds.shape[0]):
            orig = (int(dims[j][0]), int(dims[j][1]))
            pred_r = resize_nearest_np(preds[j].astype(np.uint8), orig)
            mask_r = resize_nearest_np(masks[j].astype(np.uint8), orig)
            metrics.update(pred_r, mask_r)

    def cls_result(c):
        return {
            "dice": metrics.compute_dice(c),
            "iou": metrics.compute_iou(c),
            "precision": metrics.compute_precision(c),
            "recall": metrics.compute_recall(c),
        }

    results = {
        "pixel_accuracy": metrics.compute_pixel_accuracy(),
        "mean_iou": metrics.compute_mean_iou(),
        "background": cls_result(0),
        "cat": cls_result(1),
        "dog": cls_result(2),
    }
    results["mean_foreground_dice"] = float(
        np.nanmean([results["cat"]["dice"], results["dog"]["dice"]])
    )

    if verbose:
        print(f"Pixel Accuracy: {results['pixel_accuracy']:.4f}")
        print(f"Mean IoU: {results['mean_iou']:.4f}")
        print(f"Mean Foreground Dice: {results['mean_foreground_dice']:.4f}")
        for name in ("background", "cat", "dog"):
            m = results[name]
            print(f"{name.capitalize():<10} | Precision: {m['precision']:.4f} | "
                  f"Recall: {m['recall']:.4f} | IoU: {m['iou']:.4f} | "
                  f"Dice: {m['dice']:.4f}")

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        with open(output_dir / "evaluation_results.json", "w") as f:
            json.dump(results, f, indent=4)
    return results


def evaluate_reconstruction(
    recon_fn: Callable[[Dict], np.ndarray],
    dataset: PetDataset,
    batch_size: int = 32,
    output_dir: Optional[str | Path] = None,
    verbose: bool = True,
) -> Dict:
    """Per-image MSE/PSNR/SSIM over the test set → ``reconstruction_metrics.json``."""
    mses, psnrs, ssims = [], [], []
    for batch in batch_iterator(dataset, batch_size, shuffle=False):
        recon = jnp.asarray(np.asarray(recon_fn(batch)))
        target = jnp.asarray(batch["target"])
        diff = np.asarray(recon - target)
        mses.extend(np.mean(diff**2, axis=(1, 2, 3)).tolist())
        psnrs.extend(np.asarray(psnr_fn(recon, target)).tolist())
        ssims.extend(np.asarray(ssim_fn(recon, target)).tolist())

    results = {
        "mse": float(np.mean(mses)),
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "num_images": len(mses),
    }
    if verbose:
        print(f"MSE: {results['mse']:.6f}  PSNR: {results['psnr']:.2f} dB  "
              f"SSIM: {results['ssim']:.4f}  (n={results['num_images']})")
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        with open(output_dir / "reconstruction_metrics.json", "w") as f:
            json.dump(results, f, indent=4)
    return results
