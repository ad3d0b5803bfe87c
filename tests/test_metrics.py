"""Tests for confusion-matrix metrics vs brute-force numpy loops."""

import numpy as np
import jax.numpy as jnp

from unet_implementations_tpu.ops import metrics as M


def _case(seed=0, shape=(2, 31, 29)):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, 3, size=shape).astype(np.int32)
    target = rng.integers(0, 3, size=shape).astype(np.int32)
    target = np.where(rng.random(shape) < 0.1, 255, target)
    return pred, target


def _brute_force(pred, target, num_classes=3):
    """Direct per-class loop implementation of the metric definitions."""
    mask = target != 255
    out = {"total": mask.sum(), "correct": ((pred == target) & mask).sum()}
    for c in range(num_classes):
        p = (pred == c) & mask
        t = (target == c) & mask
        inter = (p & t).sum()
        out[c] = {
            "tp": inter,
            "fp": p.sum() - inter,
            "fn": t.sum() - inter,
            "union": p.sum() + t.sum() - inter,
        }
    return out


class TestConfusionMatrix:
    def test_device_accumulator_matches(self):
        pred, target = _case(0)
        cm = np.asarray(M.confusion_matrix(jnp.asarray(pred), jnp.asarray(target)))
        bf = _brute_force(pred, target)
        stats = M.metrics_from_confusion(cm)
        for c in range(3):
            assert stats["tp"][c] == bf[c]["tp"]
            assert stats["fp"][c] == bf[c]["fp"]
            assert stats["fn"][c] == bf[c]["fn"]
        assert stats["total"] == bf["total"]
        assert stats["correct"] == bf["correct"]


class TestSegmentationMetrics:
    def test_all_metrics_match_brute_force(self):
        m = M.SegmentationMetrics(num_classes=3)
        agg_pred, agg_target = [], []
        for seed in range(3):
            pred, target = _case(seed)
            m.update(pred, target)
            agg_pred.append(pred.ravel())
            agg_target.append(target.ravel())
        pred = np.concatenate(agg_pred)
        target = np.concatenate(agg_target)
        bf = _brute_force(pred, target)

        assert m.compute_pixel_accuracy() == bf["correct"] / bf["total"]
        for c in range(3):
            assert m.compute_iou(c) == bf[c]["tp"] / bf[c]["union"]
            assert m.compute_dice(c) == 2 * bf[c]["tp"] / (
                2 * bf[c]["tp"] + bf[c]["fp"] + bf[c]["fn"]
            )
            assert m.compute_precision(c) == bf[c]["tp"] / (bf[c]["tp"] + bf[c]["fp"])
            assert m.compute_recall(c) == bf[c]["tp"] / (bf[c]["tp"] + bf[c]["fn"])

    def test_nan_semantics(self):
        # Class 2 never appears in pred or target → NaN iou/dice, skipped in means.
        m = M.SegmentationMetrics(num_classes=3)
        pred = np.array([[0, 1], [1, 0]])
        target = np.array([[0, 1], [0, 1]])
        m.update(pred, target)
        assert np.isnan(m.compute_iou(2))
        assert np.isnan(m.compute_dice(2))
        miou = m.compute_mean_iou()
        assert not np.isnan(miou)
        np.testing.assert_allclose(
            miou, np.mean([m.compute_iou(0), m.compute_iou(1)])
        )

    def test_ignored_pixels_excluded(self):
        m = M.SegmentationMetrics(num_classes=3)
        pred = np.array([[0, 1, 2]])
        target = np.array([[255, 255, 255]])
        m.update(pred, target)
        assert np.isnan(m.compute_pixel_accuracy())

    def test_device_path_equals_host_path(self):
        pred, target = _case(7)
        host = M.SegmentationMetrics(3)
        host.update(pred, target)
        dev = M.SegmentationMetrics(3)
        dev.update_confusion(M.confusion_matrix(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(host.cm, dev.cm)

    def test_get_all_metrics_structure(self):
        pred, target = _case(8)
        m = M.SegmentationMetrics(3)
        m.update(pred, target)
        res = m.get_all_metrics()
        assert set(res) == {"pixel_accuracy", "mean_iou", "mean_dice", "class_metrics"}
        assert set(res["class_metrics"]) == {"class_0", "class_1", "class_2"}


class TestBatchDice:
    def test_matches_manual(self):
        pred, target = _case(9)
        scores = np.asarray(M.batch_dice_scores(jnp.asarray(pred), jnp.asarray(target)))
        valid = target != 255
        for c in range(3):
            p = ((pred == c) & valid).astype(np.float64)
            t = ((target == c) & valid).astype(np.float64)
            inter = (p * t).sum()
            union = p.sum() + t.sum()
            expected = 2 * inter / (union + 1e-5) if union > 0 else 1.0
            np.testing.assert_allclose(scores[c], expected, rtol=1e-5)

    def test_empty_union_gives_one(self):
        pred = np.zeros((1, 4, 4), np.int32)
        target = np.zeros((1, 4, 4), np.int32)
        scores = np.asarray(M.batch_dice_scores(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(scores[1], 1.0)  # no cat pixels anywhere
        np.testing.assert_allclose(scores[2], 1.0)
