"""Segmentation metrics via a single confusion-matrix accumulator.

The reference accumulates per-class intersections/unions/TP/FP/FN with numpy
loops per image (``Our_UNet/utils/metrics.py:59-91``). All of those statistics
are derivable from one (C, C) confusion matrix over valid (non-ignore) pixels:

    TP_c = cm[c, c]
    FN_c = sum(cm[c, :]) - cm[c, c]       (target row)
    FP_c = sum(cm[:, c]) - cm[c, c]       (prediction column)
    intersection_c = TP_c ;  union_c = TP_c + FP_c + FN_c
    pixel_accuracy = trace(cm) / sum(cm)

So the device-side accumulator here is a jit-able ``confusion_matrix`` update
(one ``bincount`` per batch), and the host-side ``SegmentationMetrics`` class
mirrors the reference API (reset/update/compute_*/get_all_metrics, NaN when a
denominator is zero, NaN-skipping means) on top of it.
"""

from __future__ import annotations

import functools
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = 255


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def confusion_matrix(
    pred: jax.Array,
    target: jax.Array,
    num_classes: int = 3,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """(num_classes, num_classes) confusion matrix, rows=target, cols=pred.

    Ignore-labelled target pixels contribute nothing. jit-able; use inside
    the evaluation step and sum across batches/devices.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)
    p = jnp.clip(pred, 0, num_classes - 1)
    idx = t * num_classes + p
    counts = jnp.bincount(
        idx, weights=valid.astype(jnp.float32), length=num_classes * num_classes
    )
    return counts.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> Dict[str, np.ndarray]:
    """Derive per-class statistics from a confusion matrix (host-side numpy)."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    fn = cm.sum(axis=1) - tp
    fp = cm.sum(axis=0) - tp
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "total": cm.sum(),
        "correct": tp.sum(),
    }


def _nan_div(num: float, den: float) -> float:
    return float(num / den) if den > 0 else float("nan")


class SegmentationMetrics:
    """Dataset-level metric accumulator (API-compatible with the reference).

    Reference: ``Our_UNet/utils/metrics.py:7-240``. NaN is returned when a
    denominator is zero, and means skip NaN entries — identical protocol.
    """

    def __init__(self, num_classes: int, ignore_index: int = IGNORE_INDEX):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.cm = np.zeros((self.num_classes, self.num_classes), dtype=np.float64)

    def update(
        self,
        pred: Union[np.ndarray, jax.Array],
        target: Union[np.ndarray, jax.Array],
    ) -> None:
        """Accumulate one prediction/target pair (any matching shape)."""
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        target = np.asarray(target).reshape(-1).astype(np.int64)
        # Stray target labels outside [0, num_classes) (other than the ignore
        # index) have no row in the confusion matrix — drop them, matching
        # the device-side ``confusion_matrix`` (JAX out-of-bounds scatters
        # drop). Real pipelines never produce them (the loader clamps,
        # Our_UNet/src/train.py:300), this only hardens direct callers.
        valid = (
            (target != self.ignore_index)
            & (target >= 0)
            & (target < self.num_classes)
        )
        t = target[valid]
        p = np.clip(pred[valid], 0, self.num_classes - 1)
        idx = t * self.num_classes + p
        self.cm += np.bincount(idx, minlength=self.num_classes**2).reshape(
            self.num_classes, self.num_classes
        )

    def update_confusion(self, cm: Union[np.ndarray, jax.Array]) -> None:
        """Accumulate a pre-computed confusion matrix (device-side path)."""
        self.cm += np.asarray(cm, dtype=np.float64)

    # -- derived metrics ---------------------------------------------------

    def compute_pixel_accuracy(self) -> float:
        return _nan_div(np.diag(self.cm).sum(), self.cm.sum())

    def compute_iou(self, cls: int) -> float:
        tp = self.cm[cls, cls]
        union = self.cm[cls, :].sum() + self.cm[:, cls].sum() - tp
        return _nan_div(tp, union)

    def compute_mean_iou(self) -> float:
        vals = [self.compute_iou(c) for c in range(self.num_classes)]
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    def compute_dice(self, cls: int) -> float:
        tp = self.cm[cls, cls]
        denom = self.cm[cls, :].sum() + self.cm[:, cls].sum()
        return _nan_div(2.0 * tp, denom)

    def compute_mean_dice(self) -> float:
        vals = [self.compute_dice(c) for c in range(self.num_classes)]
        vals = [v for v in vals if not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    def compute_precision(self, cls: int) -> float:
        return _nan_div(self.cm[cls, cls], self.cm[:, cls].sum())

    def compute_recall(self, cls: int) -> float:
        return _nan_div(self.cm[cls, cls], self.cm[cls, :].sum())

    def compute_f1_score(self, cls: int) -> float:
        return self.compute_dice(cls)

    def get_all_metrics(self) -> Dict:
        results = {
            "pixel_accuracy": self.compute_pixel_accuracy(),
            "mean_iou": self.compute_mean_iou(),
            "mean_dice": self.compute_mean_dice(),
            "class_metrics": {},
        }
        for cls in range(self.num_classes):
            results["class_metrics"][f"class_{cls}"] = {
                "iou": self.compute_iou(cls),
                "dice": self.compute_dice(cls),
                "precision": self.compute_precision(cls),
                "recall": self.compute_recall(cls),
                "f1_score": self.compute_f1_score(cls),
            }
        return results


# -- standalone convenience wrappers (reference utils/metrics.py:244-302) ---


def compute_dice(pred, target, cls: int, ignore_index: int = IGNORE_INDEX) -> float:
    m = SegmentationMetrics(max(cls + 1, 3), ignore_index)
    m.update(pred, target)
    return m.compute_dice(cls)


def compute_iou(pred, target, cls: int, ignore_index: int = IGNORE_INDEX) -> float:
    m = SegmentationMetrics(max(cls + 1, 3), ignore_index)
    m.update(pred, target)
    return m.compute_iou(cls)


def compute_pixel_accuracy(pred, target, ignore_index: int = IGNORE_INDEX) -> float:
    m = SegmentationMetrics(3, ignore_index)
    m.update(pred, target)
    return m.compute_pixel_accuracy()


@functools.partial(jax.jit, static_argnames=("ignore_index",))
def batch_dice_scores(
    pred: jax.Array,
    mask: jax.Array,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Per-class hard Dice over one batch, the validation-loop protocol.

    The reference ``validate()`` computes, per batch, for each class:
    ``dice = 2*I / (U + 1e-5)`` over the whole batch (not per image), with
    255 masked out, and dice=1.0 when the union is empty
    (``Our_UNet/src/train.py:556-577``). Batch-mean of these is what lands in
    ``training_log.csv`` — systematically different from the dataset-level
    eval protocol, preserved here for log parity. Returns (3,) [bg, cat, dog].
    """
    valid = (mask != ignore_index).astype(jnp.float32)
    scores = []
    for cls in range(3):
        p = (pred == cls).astype(jnp.float32) * valid
        t = (mask == cls).astype(jnp.float32) * valid
        inter = jnp.sum(p * t)
        union = jnp.sum(p) + jnp.sum(t)
        dice = jnp.where(union > 0, 2.0 * inter / (union + 1e-5), 1.0)
        scores.append(dice)
    return jnp.stack(scores)
