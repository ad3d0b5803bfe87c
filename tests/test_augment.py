"""Tests for the on-device augmentation pipeline (policy-level checks)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from unet_implementations_tpu.data import augment as A


def _pair(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), np.int32)
    mask[16:48, 16:48] = 1
    mask[14:16, 14:50] = 255
    return img, mask


class TestAugmentBatch:
    def test_shapes_and_ranges(self):
        img, mask = _pair()
        images = jnp.asarray(np.stack([img] * 4))
        masks = jnp.asarray(np.stack([mask] * 4))
        cls = jnp.asarray([0, 1, 0, 1], jnp.int32)
        out_i, out_m = A.augment_batch(jax.random.key(0), images, masks, cls)
        assert out_i.shape == images.shape
        assert out_m.shape == masks.shape
        out_i = np.asarray(out_i)
        assert out_i.min() >= 0.0 and out_i.max() <= 1.0
        assert np.all(np.isfinite(out_i))

    @pytest.mark.slow
    def test_custom_policy_is_live_not_baked(self):
        """A custom policy takes effect even after the default policy has
        already been traced (regression: POLICY used to be a jit-baked
        constant, silently ignoring load_policy_yaml results)."""
        img, mask = _pair()
        images = jnp.asarray(np.stack([img] * 2))
        masks = jnp.asarray(np.stack([mask] * 2))
        cls = jnp.asarray([0, 1], jnp.int32)
        key = jax.random.key(1)

        # Warm the jit cache with the DEFAULT policy first.
        default_i, _ = A.augment_batch(key, images, masks, cls)

        # All probabilities zero → identity augmentation.
        ident = {
            k: ((0.0, 0.0) if k.endswith("_prob") else v)
            for k, v in A.POLICY.items()
        }
        out_i, out_m = A.augment_batch(key, images, masks, cls, policy=ident)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(images),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(masks))
        # ...and the default draw is NOT the identity for this key.
        assert not np.allclose(np.asarray(default_i), np.asarray(images),
                               atol=1e-3)

    @pytest.mark.slow
    def test_mask_values_preserved(self):
        # NEAREST warping + fill 0 must never invent label values.
        img, mask = _pair(1)
        images = jnp.asarray(np.stack([img] * 8))
        masks = jnp.asarray(np.stack([mask] * 8))
        cls = jnp.zeros(8, jnp.int32)
        for seed in range(3):
            _, out_m = A.augment_batch(jax.random.key(seed), images, masks, cls)
            vals = set(np.unique(np.asarray(out_m)))
            assert vals <= {0, 1, 255}, vals

    @pytest.mark.slow
    def test_deterministic_per_key(self):
        img, mask = _pair(2)
        images = jnp.asarray(img[None])
        masks = jnp.asarray(mask[None])
        cls = jnp.zeros(1, jnp.int32)
        a_i, a_m = A.augment_batch(jax.random.key(7), images, masks, cls)
        b_i, b_m = A.augment_batch(jax.random.key(7), images, masks, cls)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))

    def test_different_keys_differ(self):
        img, mask = _pair(3)
        images = jnp.asarray(img[None])
        masks = jnp.asarray(mask[None])
        cls = jnp.zeros(1, jnp.int32)
        a_i, _ = A.augment_batch(jax.random.key(0), images, masks, cls)
        b_i, _ = A.augment_batch(jax.random.key(1), images, masks, cls)
        assert not np.array_equal(np.asarray(a_i), np.asarray(b_i))

    def test_image_mask_geometric_consistency(self):
        """The object in the mask should roughly follow the object pixels:
        augment a bright object on black background and check overlap."""
        h = w = 64
        img = np.zeros((h, w, 3), np.float32)
        img[20:44, 20:44] = 1.0
        mask = np.zeros((h, w), np.int32)
        mask[20:44, 20:44] = 1
        overlaps = []
        for seed in range(8):
            out_i, out_m = A.augment_batch(
                jax.random.key(seed),
                jnp.asarray(img[None]), jnp.asarray(mask[None]),
                jnp.zeros(1, jnp.int32),
            )
            oi = np.asarray(out_i)[0].mean(-1)
            om = np.asarray(out_m)[0]
            bright = oi > 0.45
            if om.sum() == 0 or bright.sum() == 0:
                continue
            inter = (bright & (om == 1)).sum()
            union = (bright | (om == 1)).sum()
            overlaps.append(inter / union)
        # pixel-level transforms shift brightness, so demand moderate IoU
        assert np.mean(overlaps) > 0.5, overlaps


@pytest.mark.slow
class TestPolicyDistribution:
    def test_flip_rate_approximately_half(self):
        """Distribution-level policy validation (SURVEY §7.3: validate the
        *policy*, not pixel equality): hflip prob is 0.5 for both classes —
        estimate the realized flip rate on an asymmetric image."""
        h = w = 32
        img = np.zeros((h, w, 3), np.float32)
        img[:, : w // 2] = 1.0  # left half bright
        mask = np.zeros((h, w), np.int32)
        mask[:, : w // 2] = 1
        n = 64
        images = jnp.asarray(np.stack([img] * n))
        masks = jnp.asarray(np.stack([mask] * n))
        cls = jnp.zeros(n, jnp.int32)
        _, out_m = A.augment_batch(jax.random.key(123), images, masks, cls)
        out_m = np.asarray(out_m)
        # flipped iff the mask's right half has more fg than the left half
        left = (out_m[:, :, : w // 2] == 1).sum(axis=(1, 2))
        right = (out_m[:, :, w // 2:] == 1).sum(axis=(1, 2))
        flip_rate = float((right > left).mean())
        assert 0.25 < flip_rate < 0.75, flip_rate

    def test_cat_more_aggressive_than_dog(self):
        """Cat policy transforms more often: measure how frequently the
        output differs substantially from the input across many samples."""
        rng = np.random.default_rng(11)
        img = rng.random((32, 32, 3)).astype(np.float32)
        mask = np.zeros((32, 32), np.int32)
        n = 96
        images = jnp.asarray(np.stack([img] * n))
        masks = jnp.asarray(np.stack([mask] * n))

        def change_rate(cls_idx, key):
            out_i, _ = A.augment_batch(key, images, masks,
                                       jnp.full((n,), cls_idx, jnp.int32))
            diff = np.abs(np.asarray(out_i) - img).mean(axis=(1, 2, 3))
            return float((diff > 0.02).mean())

        cat = change_rate(0, jax.random.key(5))
        dog = change_rate(1, jax.random.key(5))
        assert cat >= dog - 0.05, (cat, dog)


class TestHelpers:
    def test_reflect101(self):
        c = np.asarray(A._reflect101(jnp.asarray([-2.0, -1.0, 0.0, 5.0, 6.0, 7.0]), 6))
        np.testing.assert_allclose(c, [2.0, 1.0, 0.0, 5.0, 4.0, 3.0])

    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(4)
        img = rng.random((16, 16, 3)).astype(np.float32)
        back = np.asarray(A._hsv_to_rgb(A._rgb_to_hsv(jnp.asarray(img))))
        np.testing.assert_allclose(back, img, atol=1e-4)

    def test_equalize_lut_monotone(self):
        rng = np.random.default_rng(5)
        ch = jnp.asarray(rng.integers(0, 256, (64, 64)), jnp.int32)
        lut = np.asarray(A._equalize_lut(ch))
        assert lut.shape == (256,)
        assert np.all(np.diff(lut) >= -1e-6)

    def test_class_index_for(self):
        assert A.class_index_for(np.array([[1, 0]]), "whatever") == 0
        assert A.class_index_for(np.array([[2, 0]]), "whatever") == 1
        assert A.class_index_for(np.array([[0, 0]]), "persian_12") == 0
        assert A.class_index_for(np.array([[0, 0]]), "beagle_3") == 1


class TestOfflineExpansion:
    def test_offline_augmentation_writes_outputs(self, tmp_path):
        import cv2
        from PIL import Image

        img_dir = tmp_path / "Train" / "resized"
        mask_dir = tmp_path / "Train" / "resized_label"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        rng = np.random.default_rng(6)
        for name, cls in [("persian_1", 1), ("beagle_1", 2)]:
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"{name}.jpg"), img)
            mask = np.zeros((64, 64), np.uint8)
            mask[20:40, 20:40] = cls
            Image.fromarray(mask).save(mask_dir / f"{name}.png")

        stats = A.augment_dataset_offline(
            tmp_path, cat_augmentations=2, dog_augmentations=1,
            batch_size=2, verbose=False,
        )
        assert stats["outputs"] == 3
        out_imgs = sorted((tmp_path / "Train" / "augmented" / "images").glob("*.jpg"))
        out_masks = sorted((tmp_path / "Train" / "augmented" / "masks").glob("*.png"))
        assert len(out_imgs) == 3 and len(out_masks) == 3
        assert (tmp_path / "Train" / "augmented" / "augmentation_report.txt").exists()
        # cat got 2 copies, dog 1
        assert sum("persian" in p.name for p in out_imgs) == 2
        assert sum("beagle" in p.name for p in out_imgs) == 1
