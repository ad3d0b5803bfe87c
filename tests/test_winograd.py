"""Exactness tests for the Winograd F(2,3) Pallas kernel (interpret mode).

The kernel is mathematically validated here but OFF by default in the model:
measured on v5e it does not beat XLA's direct conv at any eligible UNet
level (best 0.86-1.00x; see docs/PERFORMANCE.md "Winograd" section for the
full negative result). Kept as the measured counter-example + a correct
reference implementation should a future toolchain lift the Mosaic matmul
ceiling that makes it lose today.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_implementations_tpu.kernels.winograd import (
    _depth_to_space,
    _direct_conv,
    _space_to_depth,
    eligible,
    transform_weights,
    transform_weights_folded,
    winograd_conv,
    winograd_conv_s2d,
)


def _setup(seed, n, s, cin, cout, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(k1, (n, s, s, cin), dtype)
    w = jax.random.normal(k2, (3, 3, cin, cout), dtype) * 0.05
    b = jax.random.normal(k3, (cout,), dtype)
    return x, w, b


class TestForwardExactness:
    @pytest.mark.parametrize(
        "n,s,cin,cout",
        [(2, 16, 128, 128), (1, 32, 128, 256), (1, 8, 256, 128)],
    )
    @pytest.mark.slow
    def test_matches_direct_conv(self, n, s, cin, cout):
        x, w, b = _setup(0, n, s, cin, cout)
        ref = _direct_conv(x, w, b)
        got = winograd_conv(x, w, b, interpret=True)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-8
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)

    def test_s2d_layout_roundtrip(self):
        x, w, b = _setup(1, 1, 16, 128, 128)
        ref = _space_to_depth(_direct_conv(x, w, b))
        got = winograd_conv_s2d(_space_to_depth(x), w, b, interpret=True)
        assert got.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref))) + 1e-8
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-4)


class TestGradients:
    def test_custom_vjp_matches_direct(self):
        x, w, b = _setup(2, 1, 8, 128, 128)

        def f_ref(x, w, b):
            return jnp.sum(_direct_conv(x, w, b) ** 2)

        def f_win(x, w, b):
            return jnp.sum(winograd_conv(x, w, b, interpret=True) ** 2)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
        g_win = jax.grad(f_win, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(g_ref, g_win):
            scale = float(jnp.max(jnp.abs(a))) + 1e-8
            np.testing.assert_allclose(c / scale, a / scale, atol=1e-4)


class TestWeightTransforms:
    def test_folded_is_signed_concat_of_unfolded(self):
        w = jax.random.normal(jax.random.key(3), (3, 3, 128, 128)) * 0.1
        u = np.asarray(transform_weights(w)).reshape(4, 4, 128, 128)
        uf = np.asarray(transform_weights_folded(w))
        assert uf.shape == (8, 3 * 128, 128)
        for b in range(4):
            np.testing.assert_allclose(
                uf[2 * b], np.concatenate([u[0, b], u[1, b], u[2, b]], axis=0)
            )
            np.testing.assert_allclose(
                uf[2 * b + 1],
                np.concatenate([u[1, b], -u[2, b], -u[3, b]], axis=0),
            )


class TestEligibility:
    def test_rules(self):
        assert eligible((1, 64, 64, 256), (3, 3, 256, 256), 1)
        assert not eligible((1, 64, 64, 256), (3, 3, 256, 256), 2)  # stride
        assert not eligible((1, 64, 64, 64), (3, 3, 64, 128), 1)  # cin % 128
        assert not eligible((1, 63, 64, 256), (3, 3, 256, 256), 1)  # odd h
        assert not eligible((1, 4, 4, 256), (3, 3, 256, 256), 1)  # too small
        assert not eligible((1, 64, 64, 256), (1, 1, 256, 256), 1)  # k != 3
