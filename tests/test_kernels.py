"""Tests for Pallas kernels: fused InstanceNorm+LeakyReLU (value + grad)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_implementations_tpu.kernels import instance_norm as K


def _reference(x, scale, bias, eps=1e-5, slope=0.01, group=1):
    """Straightforward composition: IN (biased var) → affine → leaky."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    if group > 1:
        # q-major s2d layout: channel = q*C + c (models/s2d.py)
        xg = xf.reshape(b, h, w, group, c // group)
        mean = jnp.mean(xg, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 3), keepdims=True)
        y = (xg - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale[None, None, None, None, :] + bias[None, None, None, None, :]
        y = y.reshape(b, h, w, c)
    else:
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.where(y >= 0, y, slope * y)


def _case(seed=0, shape=(2, 8, 16, 6), group=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape) * 2 + 0.5, jnp.float32)
    c = shape[-1] // group
    scale = jnp.asarray(rng.normal(size=(c,)) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)) * 0.3, jnp.float32)
    return x, scale, bias


class TestForward:
    @pytest.mark.parametrize("group", [1, 4])
    def test_matches_reference(self, group):
        shape = (2, 8, 16, 8) if group == 4 else (2, 8, 16, 6)
        x, scale, bias = _case(0, shape, group)
        out = K.fused_instance_norm(x, scale, bias, 1e-5, 0.01, group)
        ref = _reference(x, scale, bias, group=group)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_matches_jnp(self):
        """The pallas kernel body itself, run in interpreter mode on CPU."""
        from jax.experimental.pallas import tpu as pltpu

        x, scale, bias = _case(1, (2, 8, 16, 8), group=4)
        with pltpu.force_tpu_interpret_mode():
            y_pallas, m1, r1 = K._pallas_forward(x, scale, bias, 1e-5, 0.01, 4)
        y_jnp, m2, r2 = K._jnp_forward(x, scale, bias, 1e-5, 0.01, 4)
        np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_jnp),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)

    def test_bf16_input(self):
        x, scale, bias = _case(2, (1, 8, 8, 4))
        out = K.fused_instance_norm(x.astype(jnp.bfloat16), scale, bias)
        assert out.dtype == jnp.bfloat16
        ref = _reference(x.astype(jnp.bfloat16), scale, bias)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestGradients:
    @pytest.mark.parametrize("group", [1, 4])
    def test_grads_match_reference(self, group):
        shape = (2, 6, 10, 8) if group == 4 else (2, 6, 10, 5)
        x, scale, bias = _case(3, shape, group)

        def loss_fused(x, s, b):
            y = K.fused_instance_norm(x, s, b, 1e-5, 0.01, group)
            return jnp.sum(y * jnp.cos(y))  # nontrivial downstream

        def loss_ref(x, s, b):
            y = _reference(x, s, b, group=group)
            return jnp.sum(y * jnp.cos(y))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_jit_grad(self):
        x, scale, bias = _case(4, (2, 8, 8, 4))
        fn = jax.jit(jax.grad(
            lambda x: jnp.sum(K.fused_instance_norm(x, scale, bias))
        ))
        g = fn(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestModelIntegration:
    def test_fused_block_matches_unfused(self):
        from unet_implementations_tpu.models.blocks import ConvBlock

        x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16, 16, 4)),
                        jnp.float32)
        fused = ConvBlock(features=8, fuse_norm_act=True)
        plain = ConvBlock(features=8, fuse_norm_act=False)
        params = plain.init(jax.random.key(0), x)
        a = fused.apply(params, x)
        b = plain.apply(params, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
