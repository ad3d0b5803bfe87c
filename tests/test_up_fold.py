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
