"""Smoke tests for the visualization suite (headless Agg)."""

import numpy as np
import pytest

from unet_implementations_tpu.utils import visualize as V
from unet_implementations_tpu.utils.dataset_analyzer import analyze_dataset


def _fake(seed=0, n=2, h=32, w=32):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(n, h, w, 3)).astype(np.float32)
    masks = rng.integers(0, 3, (n, h, w)).astype(np.int32)
    masks[:, 0, :] = 255
    preds = rng.integers(0, 3, (n, h, w)).astype(np.int32)
    return images, masks, preds


class TestColorize:
    def test_colors(self):
        mask = np.array([[0, 1], [2, 255]])
        out = V.colorize_mask(mask)
        np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(out[0, 1], [255, 0, 0])
        np.testing.assert_array_equal(out[1, 0], [0, 255, 0])
        np.testing.assert_array_equal(out[1, 1], [0, 0, 0])

    def test_error_map_codes(self):
        pred = np.array([[1, 0, 2, 1, 0]])
        target = np.array([[1, 1, 1, 0, 255]])
        out = V.error_analysis_map(pred, target)
        np.testing.assert_array_equal(out[0, 0], [0, 255, 0])    # correct fg
        np.testing.assert_array_equal(out[0, 1], [0, 0, 255])    # FN
        np.testing.assert_array_equal(out[0, 2], [255, 255, 0])  # wrong class
        np.testing.assert_array_equal(out[0, 3], [255, 0, 0])    # FP
        np.testing.assert_array_equal(out[0, 4], [0, 0, 0])      # ignored


class TestRenderers:
    def test_all_renderers_write_files(self, tmp_path):
        images, masks, preds = _fake()
        V.visualize_prediction_batch(images, masks, preds, tmp_path / "pred.png")
        probs = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        V.visualize_confidence_maps(images[0], probs, tmp_path / "conf.png")
        V.visualize_error_analysis(images[0], preds[0], masks[0], tmp_path / "err.png")
        cm = np.array([[50, 3, 2], [4, 30, 1], [2, 2, 40]], float)
        V.plot_confusion_matrix(cm, tmp_path / "cm.png")
        shares = V.plot_class_distribution(list(masks), tmp_path / "dist.png")
        assert abs(sum(shares.values()) - 1.0) < 1e-6
        o = np.random.default_rng(2).random((2, 32, 32, 3)).astype(np.float32)
        V.save_comparison_grid(o, o * 0.9, tmp_path / "grid.png")
        for f in ("pred.png", "conf.png", "err.png", "cm.png", "dist.png", "grid.png"):
            assert (tmp_path / f).stat().st_size > 0

    def test_training_curves_both_schemas(self, tmp_path):
        seg = tmp_path / "seg.csv"
        seg.write_text(
            "epoch,train_loss,val_loss,dice_background,dice_cat,dice_dog,"
            "dice_mean_foreground,learning_rate,epoch_time\n"
            "1,2.0,1.5,0.5,0.3,0.4,0.35,0.005,100\n"
            "2,1.5,1.2,0.6,0.4,0.5,0.45,0.004,90\n")
        V.plot_training_curves(seg, tmp_path / "seg.png")
        ae = tmp_path / "ae.csv"
        ae.write_text(
            "epoch,train_loss,val_loss,val_mse,val_psnr,learning_rate,epoch_time\n"
            "1,0.01,0.009,0.009,20.1,0.001,100\n")
        V.plot_training_curves(ae, tmp_path / "ae.png")
        assert (tmp_path / "seg.png").exists() and (tmp_path / "ae.png").exists()


class TestAnalyzer:
    def test_analyze(self, tmp_path):
        import cv2
        from PIL import Image

        (tmp_path / "imgs").mkdir()
        (tmp_path / "masks").mkdir()
        rng = np.random.default_rng(3)
        for i in range(3):
            img = (rng.random((64 + i, 80, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / "imgs" / f"a_{i}.jpg"), img)
            m = np.zeros((64 + i, 80), np.uint8)
            m[10:20, 10:20] = 1 if i < 2 else 2
            Image.fromarray(m).save(tmp_path / "masks" / f"a_{i}.png")
        stats = analyze_dataset(tmp_path / "imgs", tmp_path / "masks")
        assert stats.num_images == 3 and stats.num_masks == 3
        assert stats.class_counts[1] == 2 and stats.class_counts[2] == 1
        assert "class counts" in stats.summary()
