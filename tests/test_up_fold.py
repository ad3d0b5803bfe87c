"""Tests for folding the decoder 2x upsample into the s2d conv.

``models/s2d.py::conv_up_fold`` must match the live composite
``conv_s2d(upsample2x_into_s2d(x), transform_kernel(K))`` everywhere —
interior via the folded kernel, the 1-block border frame via the
reference-path strip recompute. The fold changes rounding order (kernel
rounding instead of lerp-activation rounding), so comparisons are f32
allclose, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_implementations_tpu.models.s2d import (
    conv_dense_up_fold,
    conv_s2d_multi,
    conv_s2d_multi_up_fold,
    conv_up_fold,
    transform_kernel,
    upsample2x_into_s2d,
)


def _composite(x, k):
    up = upsample2x_into_s2d(x)
    kt = transform_kernel(k)
    return jax.lax.conv_general_dilated(
        up, kt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestConvUpFold:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 8, 16), (1, 12, 16, 4, 4),
                                       (2, 16, 8, 8, 8), (1, 6, 6, 3, 5)])
    def test_matches_composite(self, shape):
        b, h, w, cin, cout = shape
        rng = np.random.default_rng(h * w)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        ref = _composite(x, k)
        got = conv_up_fold(x, k)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_multi_matches(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 12, 4)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
        ref = conv_s2d_multi([upsample2x_into_s2d(x), skip], k, bias, (8, 4))
        got = conv_s2d_multi_up_fold(x, [skip], k, bias, (8, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_gradients_match(self):
        # Training correctness: the fold is plain differentiable ops; its
        # gradient must match the live path's.
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)

        g_ref = jax.grad(lambda k: jnp.sum(_composite(x, k) ** 2))(k)
        g_fold = jax.grad(lambda k: jnp.sum(conv_up_fold(x, k) ** 2))(k)
        np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)

        gx_ref = jax.grad(lambda x: jnp.sum(_composite(x, k) ** 2))(x)
        gx_fold = jax.grad(lambda x: jnp.sum(conv_up_fold(x, k) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx_fold), np.asarray(gx_ref),
                                   atol=2e-4, rtol=1e-3)


def _dense_composite(x, skip, k, bias):
    """Reference: materialized upsample + conv over the channel concat."""
    from unet_implementations_tpu.ops.resize import upsample2x_nhwc

    up = upsample2x_nhwc(x)
    cat = jnp.concatenate([up, skip], axis=-1)
    y = jax.lax.conv_general_dilated(
        cat, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


class TestConvDenseUpFold:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 8, 16, 4), (1, 3, 5, 4, 4, 8),
                                       (2, 16, 8, 8, 8, 8), (1, 6, 6, 3, 5, 2)])
    def test_matches_composite(self, shape):
        b, h, w, cin, cskip, cout = shape
        rng = np.random.default_rng(h * w + cin)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w, cskip)),
                           jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin + cskip, cout)) * 0.1,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        ref = _dense_composite(x, skip, k, bias)
        got = conv_dense_up_fold(x, [skip], k, bias)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_gradients_match(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((1, 12, 12, 3)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 7, 4)) * 0.1, jnp.float32)
        bias = jnp.zeros((4,), jnp.float32)

        def loss_ref(k, x):
            return jnp.sum(_dense_composite(x, skip, k, bias) ** 2)

        def loss_fold(k, x):
            return jnp.sum(conv_dense_up_fold(x, [skip], k, bias) ** 2)

        for arg in (0, 1):
            g_ref = jax.grad(loss_ref, argnums=arg)(k, x)
            g_fold = jax.grad(loss_fold, argnums=arg)(k, x)
            np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                                       atol=2e-4, rtol=1e-3)

    def test_dense_upblock_fold_on_off(self, monkeypatch):
        # Module level: a dense UpBlock (s2d=False) must produce the same
        # output with the fold on and off, with the same param tree.
        from unet_implementations_tpu.models.blocks import UpBlock

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 12)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((2, 16, 16, 6)), jnp.float32)
        m = UpBlock(features=8, dtype=jnp.float32)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        p = m.init(jax.random.key(0), x, skip)["params"]
        y_off = m.apply({"params": p}, x, skip)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        p_on = m.init(jax.random.key(0), x, skip)["params"]
        assert jax.tree.map(lambda a: a.shape, p) == jax.tree.map(
            lambda a: a.shape, p_on)
        y_on = m.apply({"params": p}, x, skip)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-4)

    def test_small_coarse_grid_falls_back(self, monkeypatch):
        # < 3 coarse rows/cols can't run the border-strip recompute; the
        # UpBlock must silently use the live path (and stay exact).
        from unet_implementations_tpu.models.blocks import UpBlock

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 2, 2, 4)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
        m = UpBlock(features=4, dtype=jnp.float32)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        p = m.init(jax.random.key(0), x, skip)["params"]
        y_on = m.apply({"params": p}, x, skip)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        y_off = m.apply({"params": p}, x, skip)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   atol=1e-6, rtol=1e-6)

    def test_s2d_small_coarse_grid_falls_back(self, monkeypatch):
        # Same guard for the s2d UpBlock branch: a 2x2 coarse grid cannot
        # run conv_up_fold's 3-row border-strip recompute; with the fold
        # forced on, the block must use the live upsample path and stay
        # exact vs fold-off.
        from unet_implementations_tpu.models.blocks import UpBlock

        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((1, 2, 2, 8)), jnp.float32)
        skip = jnp.asarray(rng.standard_normal((1, 2, 2, 16)), jnp.float32)
        m = UpBlock(features=4, dtype=jnp.float32, s2d=True)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        p = m.init(jax.random.key(1), x, skip)["params"]
        y_on = m.apply({"params": p}, x, skip)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        y_off = m.apply({"params": p}, x, skip)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   atol=1e-6, rtol=1e-6)

    def test_conv_up_fold_rejects_tiny_grids(self):
        # Misuse fails loudly instead of silently clamping the border strips.
        x = jnp.zeros((1, 2, 2, 4), jnp.float32)
        k = jnp.zeros((3, 3, 4, 4), jnp.float32)
        with pytest.raises(ValueError, match=">=3x3 coarse grid"):
            conv_up_fold(x, k)


class TestModelFold:
    def test_unet_fold_on_off(self, monkeypatch):
        from unet_implementations_tpu.models.unet import unet_6stage

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
            jnp.float32)
        m = unet_6stage(dtype=jnp.float32)
        p = m.init(jax.random.key(0), x)["params"]

        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        y_off = m.apply({"params": p}, x, deterministic=True)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        y_on = m.apply({"params": p}, x, deterministic=True)
        assert y_on.shape == y_off.shape
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-4)

    def test_param_tree_identical(self, monkeypatch):
        # The fold must not change the checkpoint contract: same param
        # names and shapes either way.
        from unet_implementations_tpu.models.unet import unet_6stage

        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        m = unet_6stage(dtype=jnp.float32)
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        p_off = m.init(jax.random.key(0), x)["params"]
        monkeypatch.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        p_on = m.init(jax.random.key(0), x)["params"]
        t_off = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_off)
        t_on = jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_on)
        assert t_off == t_on
