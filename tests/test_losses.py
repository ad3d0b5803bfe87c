"""Golden tests for segmentation/reconstruction losses.

torch is used as an independent oracle (its CrossEntropyLoss/conv2d are the
primitives the reference composes); the dice/weight formulas are re-derived
by hand in numpy here — nothing is compared against reference *code*.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from unet_implementations_tpu.ops import losses as L


def _random_case(seed=0, b=2, h=17, w=13, c=3, with_ignore=True):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    mask = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    if with_ignore:
        ign = rng.random(size=mask.shape) < 0.15
        mask = np.where(ign, 255, mask)
    return logits, mask


class TestClassWeights:
    def test_matches_formula(self):
        _, mask = _random_case(1)
        w = np.asarray(L.compute_class_weights(jnp.asarray(mask)))
        valid = mask != 255
        counts = np.array([((mask == c) & valid).sum() for c in range(3)], np.float64)
        counts = np.where(counts == 0, 1.0, counts)
        expected = valid.sum() / counts
        expected *= 3 / expected.sum()
        np.testing.assert_allclose(w, expected, rtol=1e-5)

    def test_missing_class_clamped(self):
        mask = np.zeros((1, 8, 8), np.int32)  # only background
        w = np.asarray(L.compute_class_weights(jnp.asarray(mask)))
        assert np.all(np.isfinite(w))
        np.testing.assert_allclose(w.sum(), 3.0, rtol=1e-5)


class TestCrossEntropy:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_weighted_matches_torch(self, seed):
        logits, mask = _random_case(seed)
        weights = np.array([0.5, 1.7, 0.8], np.float32)
        ours = L.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(mask), jnp.asarray(weights)
        )
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(mask.astype(np.int64)),
            weight=torch.from_numpy(weights),
            ignore_index=255,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_unweighted_matches_torch(self):
        logits, mask = _random_case(3)
        ours = L.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(mask))
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(mask.astype(np.int64)),
            ignore_index=255,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestSoftDice:
    def test_matches_numpy_formula(self):
        logits, mask = _random_case(4)
        ours = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(mask)))
        # Hand-computed: per class, per sample soft dice on masked softmax.
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        valid = (mask != 255).astype(np.float64)
        total = 0.0
        for c in range(3):
            t = (mask == c).astype(np.float64) * valid
            p = probs[..., c] * valid
            inter = (p * t).reshape(len(mask), -1).sum(1)
            union = p.reshape(len(mask), -1).sum(1) + t.reshape(len(mask), -1).sum(1)
            dice = (2 * inter + 1e-5) / (union + 1e-5)
            total += 1 - dice.mean()
        np.testing.assert_allclose(ours, total / 3, rtol=1e-5)

    def test_perfect_prediction_near_zero(self):
        mask = np.zeros((1, 8, 8), np.int32)
        mask[0, :4] = 1
        logits = np.full((1, 8, 8, 3), -50.0, np.float32)
        for c in range(3):
            logits[..., c] = np.where(mask == c, 50.0, -50.0)
        val = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(mask)))
        # class 2 is absent: its dice = smooth/smooth = 1 → contributes 0.
        assert val < 1e-4


class TestCombined:
    def test_dynamic_weights_path(self):
        logits, mask = _random_case(5)
        ours = float(
            L.segmentation_loss(jnp.asarray(logits), jnp.asarray(mask))
        )
        w = np.asarray(L.compute_class_weights(jnp.asarray(mask)))
        ce = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(mask.astype(np.int64)),
            weight=torch.from_numpy(w.astype(np.float32)),
            ignore_index=255,
        )
        dice = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(mask)))
        np.testing.assert_allclose(ours, float(ce) + dice, rtol=1e-5)

    def test_logit_resize_path(self):
        # Logits at half resolution must be bilinearly upsampled first.
        rng = np.random.default_rng(6)
        logits = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        mask = rng.integers(0, 3, size=(1, 16, 16)).astype(np.int32)
        val = float(L.segmentation_loss(jnp.asarray(logits), jnp.asarray(mask)))
        assert np.isfinite(val)

    def test_jit_and_grad(self):
        logits, mask = _random_case(7)
        fn = jax.jit(L.segmentation_loss)
        g = jax.grad(lambda lg: L.segmentation_loss(lg, jnp.asarray(mask)))(
            jnp.asarray(logits)
        )
        assert np.isfinite(float(fn(jnp.asarray(logits), jnp.asarray(mask))))
        assert np.all(np.isfinite(np.asarray(g)))


class TestReconstruction:
    def test_perceptual_weight_actually_contributes(self):
        """Regression: the AE recipe used to parse perceptual_weight but
        never pass feature_fns, silently training plain MSE."""
        import jax

        from unet_implementations_tpu.models.vgg import make_features_fn

        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        b = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        fn = make_features_fn(jax.random.key(0), (1, 32, 32, 3),
                              taps=("relu1_2",))
        mse_only = L.reconstruction_loss(a, b, mse_weight=1.0)
        combined = L.reconstruction_loss(
            a, b, mse_weight=1.0, perceptual_weight=0.5, feature_fns=fn
        )
        assert float(combined) > float(mse_only)
        # the single-callable path accepts a dict-returning trunk
        p = L.perceptual_loss(a, b, fn)
        assert np.isfinite(float(p)) and float(p) > 0

    def test_make_train_step_requires_features_for_perceptual(self):
        import pytest

        from unet_implementations_tpu.recipes.ae_recon import make_train_step

        with pytest.raises(ValueError):
            make_train_step(perceptual_weight=0.5)

    def test_psnr_matches_torch_formula(self):
        rng = np.random.default_rng(8)
        a = rng.random((2, 16, 16, 3)).astype(np.float32)
        b = rng.random((2, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(L.psnr(jnp.asarray(a), jnp.asarray(b)))
        mse = ((a - b) ** 2).mean(axis=(1, 2, 3)).clip(min=1e-10)
        np.testing.assert_allclose(ours, 10 * np.log10(1.0 / mse), rtol=1e-4)

    def test_ssim_identical_images(self):
        rng = np.random.default_rng(9)
        a = rng.random((1, 32, 32, 3)).astype(np.float32)
        val = np.asarray(L.ssim(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(val, 1.0, atol=1e-4)

    def test_ssim_matches_torch_oracle(self):
        rng = np.random.default_rng(10)
        a = rng.random((2, 24, 24, 3)).astype(np.float32)
        b = (a + 0.1 * rng.normal(size=a.shape)).clip(0, 1).astype(np.float32)
        ours = np.asarray(L.ssim(jnp.asarray(a), jnp.asarray(b)))

        # Oracle: same gaussian-window SSIM via torch conv2d.
        coords = torch.arange(11).float() - 5.0
        g = torch.exp(-(coords**2) / (2 * 1.5**2))
        g = g / g.sum()
        win = (g[:, None] @ g[None, :]).view(1, 1, 11, 11)
        at = torch.from_numpy(a).permute(0, 3, 1, 2).reshape(6, 1, 24, 24)
        bt = torch.from_numpy(b).permute(0, 3, 1, 2).reshape(6, 1, 24, 24)
        mu1 = F.conv2d(at, win, padding=5)
        mu2 = F.conv2d(bt, win, padding=5)
        s11 = F.conv2d(at * at, win, padding=5) - mu1**2
        s22 = F.conv2d(bt * bt, win, padding=5) - mu2**2
        s12 = F.conv2d(at * bt, win, padding=5) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s11 + s22 + c2)
        )
        ref = m.reshape(2, 3, 24, 24).mean(dim=(1, 2, 3)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_reconstruction_loss_mse_only(self):
        rng = np.random.default_rng(11)
        a = rng.random((2, 16, 16, 3)).astype(np.float32)
        b = rng.random((2, 16, 16, 3)).astype(np.float32)
        val = float(L.reconstruction_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(val, ((a - b) ** 2).mean(), rtol=1e-5)
