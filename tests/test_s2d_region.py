"""Whole-region fused s2d tail (kernels/s2d_region.py).

The region replaces [IN -> lrelu -> conv_1 -> IN -> lrelu] of every
s2d-level ConvBlock for inference jits. Parity contract: identical to the
module composition up to (a) conv_1 bias omission — exact cancellation in
IN2 pre-rounding — and (b) lrelu-in-f32-before-cast rounding, both ~1 ulp
of the activation dtype (documented in the kernel module docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_implementations_tpu.kernels.s2d_region import (
    _pallas_tail,
    fused_s2d_tail,
    jnp_tail,
    region_applicable,
)
from unet_implementations_tpu.models.blocks import ConvBlock
from unet_implementations_tpu.models.s2d import space_to_depth


def _mk(b=2, h=16, w=128, c=8, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 6)
    x = jax.random.normal(ks[0], (b, h, w, 4 * c), dtype)
    scale1 = jax.random.uniform(ks[1], (c,), jnp.float32, 0.5, 1.5)
    bias1 = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[3], (3, 3, c, c), jnp.float32) * 0.2
    scale2 = jax.random.uniform(ks[4], (c,), jnp.float32, 0.5, 1.5)
    bias2 = jax.random.normal(ks[5], (c,), jnp.float32) * 0.1
    return x, scale1, bias1, k2, scale2, bias2


class TestKernelParity:
    @pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                           (jnp.bfloat16, 4e-2)])
    def test_interpret_matches_jnp(self, dtype, tol):
        args = _mk(dtype=dtype)
        ref = jnp_tail(*args)
        got = _pallas_tail(*args, eps=1e-5, neg=0.01, interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=tol, rtol=tol)

    def test_multi_chunk_rows(self):
        # h=64 -> chunked fori path with ch=64? _chunk_rows picks 64; force
        # multiple chunks with h=128 (ch=64, 2 chunks).
        args = _mk(b=1, h=128, w=128, c=8)
        ref = jnp_tail(*args)
        got = _pallas_tail(*args, eps=1e-5, neg=0.01, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bias_cancellation_vs_module_path(self):
        # The full module composition (WITH conv_1 bias) must agree with the
        # fused tail (bias omitted): a per-channel constant shifts IN2's
        # mean by itself exactly.
        x, scale1, bias1, k2, scale2, bias2 = _mk(c=8)
        from unet_implementations_tpu.models.s2d import (
            conv_s2d,
            instance_norm_s2d,
        )

        bias_c = jax.random.normal(jax.random.key(9), (8,), jnp.float32)
        y = instance_norm_s2d(x, scale1, bias1, 1e-5, out_dtype=x.dtype)
        y = jnp.where(y >= 0, y, y * 0.01)
        y = conv_s2d(y, k2, bias_c)  # bias present
        y = instance_norm_s2d(y, scale2, bias2, 1e-5, out_dtype=x.dtype)
        ref = jnp.where(y >= 0, y, y * 0.01)
        got = jnp_tail(x, scale1, bias1, k2, scale2, bias2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_applicability_gate(self):
        assert region_applicable((2, 256, 256, 128), jnp.bfloat16)
        assert region_applicable((2, 128, 128, 256), jnp.bfloat16)
        assert not region_applicable((2, 256, 250, 128), jnp.bfloat16)
        assert not region_applicable((2, 256, 256, 96), jnp.bfloat16)
        assert not region_applicable((2, 4, 128, 128), jnp.bfloat16)


class TestModelIntegration:
    def test_convblock_region_matches_module_path(self, monkeypatch):
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "0")
        block = ConvBlock(features=8, s2d=True, dtype=jnp.float32)
        x = space_to_depth(
            jax.random.normal(jax.random.key(1), (2, 32, 64, 8), jnp.float32))
        params = block.init(jax.random.key(2), x, True)
        ref = block.apply(params, x, True)

        monkeypatch.setenv("UNET_TPU_S2D_REGION", "1")
        got = block.apply(params, x, True)  # same param tree, region path
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_region_param_tree_identical(self, monkeypatch):
        x = space_to_depth(
            jax.random.normal(jax.random.key(1), (1, 32, 64, 8), jnp.float32))
        block = ConvBlock(features=8, s2d=True, dtype=jnp.float32)
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "0")
        p_off = jax.tree_util.tree_structure(block.init(jax.random.key(2), x, True))
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "1")
        p_on = jax.tree_util.tree_structure(block.init(jax.random.key(2), x, True))
        assert p_on == p_off

    def test_train_mode_unaffected(self, monkeypatch):
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "1")
        block = ConvBlock(features=8, s2d=True, dropout_rate=0.3,
                          dtype=jnp.float32)
        x = space_to_depth(
            jax.random.normal(jax.random.key(1), (2, 32, 64, 8), jnp.float32))
        params = block.init(jax.random.key(2), x, True)
        # deterministic=False must trace the module path (dropout active).
        y = block.apply(params, x, False,
                        rngs={"dropout": jax.random.key(3)})
        assert y.shape == x.shape

    def test_unet_forward_region_parity(self, monkeypatch):
        from unet_implementations_tpu.models.unet import UNet

        model = UNet(dtype=jnp.float32)
        img = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "0")
        params = model.init(jax.random.key(1), img)
        ref = model.apply(params, img)
        monkeypatch.setenv("UNET_TPU_S2D_REGION", "1")
        got = model.apply(params, img)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
