"""Tests for the Pallas one-pass upsample (kernels/upsample.py).

The kernel ships OFF by default (measured end-to-end negative result — see
the module docstring and docs/PERFORMANCE.md) but its numerics contract is
maintained: bitwise-equal to the jnp reference in bf16, 1-2 ulp (FMA
contraction) in f32. Interpret mode exercises the kernels on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_implementations_tpu.kernels.upsample import (
    _upsample2x_dense_pallas,
    _upsample2x_s2d_pallas,
    upsample2x_nhwc_fast,
)
from unet_implementations_tpu.models.s2d import upsample2x_into_s2d
from unet_implementations_tpu.ops.resize import upsample2x_nhwc

SHAPES = [(2, 16, 16, 128), (1, 32, 8, 256), (3, 8, 24, 128)]


class TestDenseKernel:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_bf16_bitwise(self, shape):
        x = jnp.asarray(
            np.random.default_rng(shape[1]).standard_normal(shape),
            jnp.bfloat16)
        ref = upsample2x_nhwc(x)
        got = _upsample2x_dense_pallas(x, interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        assert bool(jnp.all(got == ref))

    def test_f32_ulp(self):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 16, 128)),
            jnp.float32)
        ref = upsample2x_nhwc(x)
        got = _upsample2x_dense_pallas(x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


class TestS2dKernel:
    @pytest.mark.parametrize("shape", SHAPES)
    def test_bf16_bitwise(self, shape):
        x = jnp.asarray(
            np.random.default_rng(shape[2]).standard_normal(shape),
            jnp.bfloat16)
        ref = upsample2x_into_s2d(x)
        got = _upsample2x_s2d_pallas(x, interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        assert bool(jnp.all(got == ref))


class TestWrapper:
    def test_cpu_fallback_and_grad(self):
        # Off-TPU the wrapper takes the reference path; the custom VJP is
        # the linear transpose of the reference — gradients must match.
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 8, 8, 4)),
            jnp.float32)
        assert bool(jnp.all(upsample2x_nhwc_fast(x) == upsample2x_nhwc(x)))
        g_fast = jax.grad(lambda x: jnp.sum(upsample2x_nhwc_fast(x) ** 2))(x)
        g_ref = jax.grad(lambda x: jnp.sum(upsample2x_nhwc(x) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-6, rtol=1e-6)
