"""Resize primitives must match torch/cv2 index math bit-for-bit (nearest)
and to float tolerance (bilinear) — the eval protocol depends on it."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from unet_implementations_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_nhwc,
)


SIZES = [((512, 512), (375, 500)), ((375, 500), (512, 512)), ((17, 23), (8, 40)),
         ((16, 16), (32, 32)), ((32, 32), (16, 16))]


class TestNearest:
    @pytest.mark.parametrize("in_size,out_size", SIZES)
    def test_matches_torch(self, in_size, out_size):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, size=(1, *in_size)).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(x), out_size))
        ref = F.interpolate(torch.from_numpy(x)[None], size=out_size, mode="nearest")
        np.testing.assert_array_equal(ours, ref.numpy()[0])

    @pytest.mark.parametrize("in_size,out_size", SIZES)
    def test_matches_cv2(self, in_size, out_size):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 255, size=in_size).astype(np.uint8)
        ours = np.asarray(resize_nearest(jnp.asarray(x), out_size))
        ref = cv2.resize(x, (out_size[1], out_size[0]), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref)

    def test_mask_values_preserved(self):
        # Nearest must never invent values — critical for {0,1,2,255} masks.
        rng = np.random.default_rng(2)
        mask = rng.choice([0, 1, 2, 255], size=(200, 300)).astype(np.uint8)
        out = np.asarray(resize_nearest(jnp.asarray(mask), (512, 512)))
        assert set(np.unique(out)) <= {0, 1, 2, 255}


class TestBilinear:
    @pytest.mark.parametrize("in_size,out_size", SIZES)
    def test_matches_torch_align_corners_false(self, in_size, out_size):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, *in_size, 4)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_size,
            mode="bilinear",
            align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        # torch fuses both axes in one f32 expression; our separable two-pass
        # rounds differently at ~1e-5 — identical index math, loose float tol.
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)

    def test_identity_when_same_size(self):
        x = np.random.default_rng(4).normal(size=(1, 8, 8, 3)).astype(np.float32)
        out = np.asarray(resize_bilinear(jnp.asarray(x), (8, 8)))
        np.testing.assert_array_equal(out, x)


class TestUpsample2x:
    @pytest.mark.parametrize("hw", [(4, 6), (16, 16), (7, 5)])
    def test_matches_torch_2x(self, hw):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, *hw, 8)).astype(np.float32)
        ours = np.asarray(upsample2x_nhwc(jnp.asarray(x)))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2, mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_matches_gather_path(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
        fast = np.asarray(upsample2x_nhwc(jnp.asarray(x)))
        general = np.asarray(resize_bilinear(jnp.asarray(x), (32, 32), spatial_axes=(1, 2)))
        np.testing.assert_allclose(fast, general, rtol=1e-6, atol=1e-6)
