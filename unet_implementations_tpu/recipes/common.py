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
from collections import deque
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.ops.losses import psnr as psnr_fn, ssim as ssim_fn
from unet_implementations_tpu.ops.metrics import SegmentationMetrics


def check_grad_accum(
    batch_size: int, grad_accum: int, use_mesh: bool = False
) -> None:
    """Fail fast on an indivisible accumulation split — BEFORE dataset
    loading and the (long) first-step compile. The train loops run with
    drop_last, so every training batch is exactly ``batch_size`` and this
    is the only way the microbatch split can fail.

    With ``use_mesh``, additionally warns when the microbatch does not
    divide the device count: that layout is CORRECT but uneven (XLA
    reshards inside every scan iteration — ``training/steps.py``). The
    device query happens AFTER argument validation so a bad flag pair
    fails instantly even when backend init would hang (tunnel outage)."""
    if grad_accum < 1:
        raise ValueError(f"--grad_accum must be >= 1, got {grad_accum}")
    if batch_size % grad_accum:
        raise ValueError(
            f"--grad_accum {grad_accum} does not divide --batch_size "
            f"{batch_size} into equal microbatches"
        )
    if use_mesh and grad_accum > 1:
        n_devices = jax.device_count()
        if (batch_size // grad_accum) % n_devices:
            print(
                f"WARNING: microbatch {batch_size // grad_accum} "
                f"(batch {batch_size} / accum {grad_accum}) does not "
                f"divide the {n_devices}-device mesh — every scan "
                f"iteration will reshard; prefer batch_size/grad_accum "
                f"a multiple of {n_devices}."
            )


def _augment_key(seed: int, epoch: int, i: int) -> jax.Array:
    """Per-batch augmentation key — shared by BOTH online-augment wrappers
    so the plain and with-clip paths draw identical transforms for the same
    (seed, epoch, batch)."""
    return jax.random.fold_in(jax.random.key(seed + 7), epoch * 100003 + i)


def wrap_online_augment(batch_iter, epoch: int, seed: int, policy=None):
    """Apply the on-device augmentation policy to a host batch iterator.

    Expects batches from a ``normalize=False`` loader ([0,1] images);
    yields ImageNet-normalized augmented batches (one fused device program
    per batch — see ``data/augment.py``).
    """
    from unet_implementations_tpu.data.augment import augment_and_normalize

    for i, batch in enumerate(batch_iter):
        img, msk = augment_and_normalize(
            _augment_key(seed, epoch, i),
            jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]),
            policy=policy,
        )
        yield dict(batch, image=img, mask=msk)


def wrap_online_augment_clip(batch_iter, epoch: int, seed: int, extractor,
                             policy=None):
    """Online-augment wrapper for the CLIP recipe: augment on device, derive
    the 224² view of the AUGMENTED pixels, and extract CLIP features live
    with the frozen encoder (embeddings cannot be cached — the pixels change
    every epoch; the reference also extracts per batch,
    ``CLIP_UNet/src/train.py:714-719``)."""
    from unet_implementations_tpu.data.augment import (
        augment_and_normalize_with_clip,
    )

    for i, batch in enumerate(batch_iter):
        img, msk, clip_img = augment_and_normalize_with_clip(
            _augment_key(seed, epoch, i),
            jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]),
            policy=policy,
        )
        out = dict(batch, image=img, mask=msk,
                   clip_features=extractor(clip_img))
        out.pop("clip_image", None)
        yield out


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
    visualize_samples: int = 0,
    probs_fn: Optional[Callable[[Dict], np.ndarray]] = None,
    num_threads: int = 8,
    mesh=None,
    verbose: bool = True,
) -> Dict:
    """Dataset-level evaluation at original resolution.

    ``predict_fn(batch) -> (B, 512, 512) int predictions`` (device-side
    forward + argmax). Returns the reference's results dict and writes
    ``evaluation_results.json`` when ``output_dir`` is given.

    ``mesh``: shard each batch's array leaves over the data axis so the
    forward runs on every device (a replicated-params jit follows its input
    sharding); without it, 7 of 8 chips idle through the eval pass.

    The device forward and the host-side original-resolution accumulation
    (``Our_UNet/src/evaluate.py:189-207`` protocol) are PIPELINED: batch
    i+1's forward is dispatched before batch i's predictions are fetched and
    resized, so the per-image nearest-resize loop runs while the TPU computes.

    ``visualize_samples > 0`` renders the first N batches (prediction
    triptychs, error analysis, and — when ``probs_fn`` is given — confidence
    maps) plus the dataset confusion matrix and class distribution, matching
    the reference evaluator's ``--visualize_samples``
    (``Our_UNet/src/evaluate.py:213-236``).
    """
    viz_dir = None
    if visualize_samples > 0 and output_dir is not None:
        viz_dir = Path(output_dir) / "visualizations"
        viz_dir.mkdir(parents=True, exist_ok=True)

    metrics = SegmentationMetrics(num_classes=3, ignore_index=255)

    def dispatch(idx, batch):
        fed = batch
        if mesh is not None:
            from unet_implementations_tpu.parallel import shard_batch

            arrays = {k: v for k, v in batch.items()
                      if k in ("image", "clip_features", "clip_image")}
            fed = dict(batch, **shard_batch(arrays, mesh))
        preds = predict_fn(fed)  # async dispatch; fetch deferred
        # Second forward (softmax probs) only for batches that will actually
        # render confidence maps — process() consumes probs only then.
        want_probs = (
            probs_fn is not None and viz_dir is not None and idx < visualize_samples
        )
        probs = probs_fn(fed) if want_probs else None
        return batch, preds, probs

    def process(i, batch, preds, probs):
        preds = np.asarray(preds)
        masks = batch["mask"]
        dims = batch["original_dims"]
        for j in range(preds.shape[0]):
            orig = (int(dims[j][0]), int(dims[j][1]))
            pred_r = resize_nearest_np(preds[j].astype(np.uint8), orig)
            mask_r = resize_nearest_np(masks[j].astype(np.uint8), orig)
            metrics.update(pred_r, mask_r)

        if viz_dir is not None and i < visualize_samples:
            from unet_implementations_tpu.utils import visualize as V

            V.visualize_prediction_batch(
                batch["image"], masks, preds, viz_dir / f"predictions_batch{i}.png"
            )
            V.visualize_error_analysis(
                batch["image"][0], preds[0], masks[0],
                viz_dir / f"error_analysis_batch{i}.png",
            )
            if probs is not None:
                V.visualize_confidence_maps(
                    batch["image"][0], np.asarray(probs)[0],
                    viz_dir / f"confidence_batch{i}.png",
                )

    pending = deque()
    done = 0
    dispatched = 0
    for batch in batch_iterator(dataset, batch_size, shuffle=False,
                                num_threads=num_threads):
        pending.append(dispatch(dispatched, batch))
        dispatched += 1
        if len(pending) > 2:  # bounded run-ahead
            process(done, *pending.popleft())
            done += 1
    while pending:
        process(done, *pending.popleft())
        done += 1

    if viz_dir is not None:
        from unet_implementations_tpu.utils import visualize as V

        V.plot_confusion_matrix(metrics.cm, viz_dir / "confusion_matrix.png")

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


def predict_segmentation(
    model_path: str | Path,
    inputs: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 32,
    dtype=None,
    overlay: bool = True,
    spatial: int = 0,
    verbose: bool = True,
) -> int:
    """Run the plain 6-stage UNet on an image file or directory of images.

    Writes per-image ``<stem>_mask.png`` (class ids {0,1,2} at the ORIGINAL
    resolution, nearest-resized back like the eval protocol,
    ``Our_UNet/src/evaluate.py:189-207``) and, with ``overlay``,
    ``<stem>_overlay.png`` (colorized mask blended over the image). Returns
    the number of images processed. Serving-style entry point — the
    reference only exposes dataset-level evaluation.

    ``model_path`` may be a training checkpoint OR an AOT serving artifact
    from ``cli export`` (auto-detected); the artifact path replays the
    exported StableHLO module without building the model.

    ``spatial`` > 1 runs the forward spatially partitioned: image rows
    shard over ``spatial`` devices on a 2-D (data, space) mesh
    (``parallel/spatial.py``) — batch-1 latency then scales with chip
    count. Checkpoint path only (an AOT artifact bakes its shardings).
    """
    import cv2
    import jax.numpy as jnp

    from unet_implementations_tpu.data.loader import IMAGENET_MEAN, IMAGENET_STD
    from unet_implementations_tpu.models.unet import unet_6stage
    from unet_implementations_tpu.ops.tuning import inference_jit
    from unet_implementations_tpu.training.checkpoint import restore_params
    from unet_implementations_tpu.utils.visualize import colorize_mask

    dtype = dtype if dtype is not None else jnp.bfloat16
    inputs = Path(inputs)
    files = sorted(
        p for p in ([inputs] if inputs.is_file() else inputs.iterdir())
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    from unet_implementations_tpu.serving.export import ARTIFACT_FORWARD

    if (Path(model_path) / ARTIFACT_FORWARD).exists():
        # AOT serving artifact (`cli export`): replay the exported module —
        # no model construction, no tracing. It fixes dtype and image size.
        from unet_implementations_tpu.serving import load_exported

        if spatial > 1:
            raise ValueError(
                "--spatial applies to training checkpoints; an AOT artifact "
                "replays its exported shardings"
            )
        served = load_exported(model_path)
        dtype = jnp.dtype(served.meta["input_dtype"])
        if served.meta["img_size"] != 512:
            raise ValueError(
                f"exported artifact is {served.meta['img_size']}px; predict "
                "expects a 512px export"
            )

        def forward(images):
            return np.argmax(served.predict(images), axis=-1).astype(np.int32)

    else:
        model = unet_6stage(dtype=dtype)
        abstract = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
        params = restore_params(model_path, abstract)

        if spatial > 1:
            from unet_implementations_tpu.parallel import (
                create_mesh_dp_sp,
                replicate,
                shard_batch_spatial,
            )

            if jax.device_count() < spatial:
                raise ValueError(
                    f"--spatial {spatial} needs >= {spatial} devices, "
                    f"have {jax.device_count()}"
                )
            mesh = create_mesh_dp_sp(spatial)
            params = replicate(params, mesh)

            # Shardings are inferred from the committed inputs:
            # shard_batch_spatial lays (batch, rows) on (data, space) and
            # falls back to replication on an indivisible axis (e.g. a
            # single image on a multi-row data axis), so any batch works.
            @jax.jit
            def _fwd(p, images):
                logits = model.apply({"params": p}, images, deterministic=True)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            def forward(images):
                images = shard_batch_spatial({"x": images}, mesh)["x"]
                return _fwd(params, images)

        else:

            @inference_jit
            def forward(images):
                logits = model.apply(
                    {"params": params}, images, deterministic=True
                )
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    n = 0
    for start in range(0, len(files), batch_size):
        chunk = files[start:start + batch_size]
        imgs, dims, ok = [], [], []
        for p in chunk:
            raw = cv2.imread(str(p))
            if raw is None:
                if verbose:
                    print(f"skipping unreadable image: {p}")
                continue
            rgb = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            dims.append(rgb.shape[:2])
            r = cv2.resize(rgb, (512, 512), interpolation=cv2.INTER_LINEAR)
            imgs.append(((r.astype(np.float32) / 255.0) - np.asarray(IMAGENET_MEAN))
                        / np.asarray(IMAGENET_STD))
            ok.append((p, rgb))
        if not imgs:
            continue
        stack = np.stack(imgs)
        # Pad the tail chunk to the full batch size — a second shape would
        # trigger a full recompile of the 512² UNet (tens of seconds).
        n_real = stack.shape[0]
        if n_real < batch_size and start > 0:
            pad = np.zeros((batch_size - n_real,) + stack.shape[1:], stack.dtype)
            stack = np.concatenate([stack, pad], axis=0)
        preds = np.asarray(forward(jnp.asarray(stack, dtype)))[:n_real]
        for (p, rgb), (oh, ow), pred in zip(ok, dims, preds):
            pred_r = resize_nearest_np(pred.astype(np.uint8), (oh, ow))
            cv2.imwrite(str(output_dir / f"{p.stem}_mask.png"), pred_r)
            if overlay:
                color = colorize_mask(pred_r)
                blend = (0.6 * rgb + 0.4 * color).astype(np.uint8)
                cv2.imwrite(str(output_dir / f"{p.stem}_overlay.png"),
                            cv2.cvtColor(blend, cv2.COLOR_RGB2BGR))
            n += 1
    if verbose:
        print(f"predicted {n} images -> {output_dir}")
    return n


def evaluate_reconstruction(
    recon_fn: Callable[[Dict], jax.Array],
    dataset: PetDataset,
    batch_size: int = 32,
    output_dir: Optional[str | Path] = None,
    num_threads: int = 8,
    verbose: bool = True,
) -> Dict:
    """Per-image MSE/PSNR/SSIM over the test set → ``reconstruction_metrics.json``.

    Same dispatch discipline as ``evaluate_segmentation``: the three metrics
    are ONE jitted device computation per batch (no reconstruction tensor
    ever crosses to the host), and the loop runs ahead of the device by a
    bounded window so the next batch's forward overlaps pulling the previous
    batch's per-image scalars."""

    @jax.jit
    def _metrics(recon, target):
        diff = (recon - target).astype(jnp.float32)
        return (jnp.mean(diff**2, axis=(1, 2, 3)),
                psnr_fn(recon, target), ssim_fn(recon, target))

    mses, psnrs, ssims = [], [], []
    pending: deque = deque()

    def drain(limit: int) -> None:
        while len(pending) > limit:
            m, p, s = pending.popleft()
            mses.extend(np.asarray(m).tolist())
            psnrs.extend(np.asarray(p).tolist())
            ssims.extend(np.asarray(s).tolist())

    for batch in batch_iterator(dataset, batch_size, shuffle=False,
                                num_threads=num_threads):
        pending.append(_metrics(recon_fn(batch), jnp.asarray(batch["target"])))
        drain(2)
    drain(0)

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
