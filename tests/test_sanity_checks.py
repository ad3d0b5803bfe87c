"""Tests for the dataset sanity-check suite."""

import numpy as np
import cv2
from PIL import Image

from unet_implementations_tpu.data.sanity_checks import (
    check_mask_values,
    check_pair_consistency,
    check_resized_dimensions,
    debug_mask_values,
    run_sanity_checks,
)


def _make_tree(root, consistent=True):
    rng = np.random.default_rng(0)
    (root / "Train" / "resized").mkdir(parents=True)
    (root / "Train" / "resized_label").mkdir(parents=True)
    for i in range(3):
        img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "Train" / "resized" / f"a_{i}.jpg"), img)
        m = np.zeros((512, 512), np.uint8)
        m[10:20, 10:20] = 1
        Image.fromarray(m).save(root / "Train" / "resized_label" / f"a_{i}.png")
    if not consistent:
        (root / "Train" / "resized_label" / "a_2.png").unlink()


class TestChecks:
    def test_all_pass_on_consistent_tree(self, tmp_path):
        _make_tree(tmp_path)
        reports = run_sanity_checks(tmp_path)
        assert reports and all(r.passed for r in reports)

    def test_missing_mask_detected(self, tmp_path):
        _make_tree(tmp_path, consistent=False)
        reports = run_sanity_checks(tmp_path)
        assert not all(r.passed for r in reports)
        failing = [r for r in reports if not r.passed][0]
        assert any("a_2" in d for d in failing.details)

    def test_bad_dimension_detected(self, tmp_path):
        d = tmp_path / "resized"
        d.mkdir()
        cv2.imwrite(str(d / "x.jpg"), np.zeros((100, 100, 3), np.uint8))
        r = check_resized_dimensions(d)
        assert not r.passed

    def test_bad_mask_values_detected(self, tmp_path):
        d = tmp_path / "labels"
        d.mkdir()
        Image.fromarray(np.full((8, 8), 7, np.uint8)).save(d / "x.png")
        r = check_mask_values(d)
        assert not r.passed

    def test_debug_mask_values(self, tmp_path):
        m = np.zeros((8, 8), np.uint8)
        m[2, 2] = 128
        Image.fromarray(m).save(tmp_path / "m.png")
        info = debug_mask_values(tmp_path / "m.png")
        assert info["pil_values"][128] == 1
        assert info["cv2_values"][0] == 63
