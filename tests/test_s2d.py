"""Space-to-depth execution must be numerically exact vs the dense path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_implementations_tpu.models import s2d as S
from unet_implementations_tpu.models.unet import UNet, autoencoder_6stage


class TestPrimitives:
    def test_s2d_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 10, 5)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(S.depth_to_space(S.space_to_depth(x))), np.asarray(x)
        )

    def test_conv_s2d_exact(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(7,)), jnp.float32)
        dense = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        ours = S.depth_to_space(S.conv_s2d(S.space_to_depth(x), k, b))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_conv_s2d_1x1_exact(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 4, 3)), jnp.float32)
        b = jnp.zeros((3,), jnp.float32)
        dense = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ours = S.depth_to_space(S.conv_s2d(S.space_to_depth(x), k, b))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(dense),
                                   rtol=1e-5, atol=1e-6)

    def test_instance_norm_s2d_exact(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 6)) * 3 + 1, jnp.float32)
        scale = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
        xf = np.asarray(x)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        dense = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)
        ours = S.depth_to_space(
            S.instance_norm_s2d(S.space_to_depth(x), scale, bias)
        )
        np.testing.assert_allclose(np.asarray(ours), dense, rtol=1e-4, atol=1e-5)

    def test_upsample_into_s2d_exact(self):
        from unet_implementations_tpu.ops.resize import upsample2x_nhwc

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
        dense = np.asarray(upsample2x_nhwc(x))
        ours = np.asarray(S.depth_to_space(S.upsample2x_into_s2d(x)))
        np.testing.assert_allclose(ours, dense, rtol=1e-5, atol=1e-6)


class TestModelEquivalence:
    def _compare(self, make_model, shape=(2, 32, 32, 3), **apply_kw):
        dense = make_model(s2d=False)
        fast = make_model(s2d=True)
        x = jnp.asarray(np.random.default_rng(5).normal(size=shape), jnp.float32)
        params = dense.init(jax.random.key(0), x)
        out_dense = dense.apply(params, x, **apply_kw)
        out_fast = fast.apply(params, x, **apply_kw)  # SAME params
        np.testing.assert_allclose(
            np.asarray(out_fast), np.asarray(out_dense), rtol=1e-4, atol=1e-4
        )

    def test_unet_segmentation_equivalent(self):
        self._compare(lambda s2d: UNet(
            features_per_stage=(8, 16, 16), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.0),
            decoder_dropout_rates=(0.0, 0.0), s2d_level0=s2d,
        ))

    def test_unet_reconstruction_equivalent(self):
        self._compare(lambda s2d: UNet(
            features_per_stage=(8, 16), strides=(1, 2),
            encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
            head="reconstruction", s2d_level0=s2d,
        ))

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 32, 32, 3))
        a = UNet(features_per_stage=(8, 16), strides=(1, 2),
                 encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
                 s2d_level0=False).init(jax.random.key(0), x)
        b = UNet(features_per_stage=(8, 16), strides=(1, 2),
                 encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
                 s2d_level0=True).init(jax.random.key(0), x)
        assert jax.tree.structure(a) == jax.tree.structure(b)
        for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            assert pa.shape == pb.shape
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    @pytest.mark.slow
    def test_remat_is_exact(self):
        """remat=True gives identical outputs AND gradients (same params)."""
        make = lambda remat: UNet(
            features_per_stage=(8, 16), strides=(1, 2),
            encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
            remat=remat,
        )
        x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 16, 16, 3)),
                        jnp.float32)
        params = make(False).init(jax.random.key(0), x)
        assert jax.tree.structure(params) == jax.tree.structure(
            make(True).init(jax.random.key(0), x)
        )

        def loss(p, remat):
            return jnp.sum(make(remat).apply(p, x) ** 2)

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_odd_size_falls_back(self):
        model = UNet(features_per_stage=(8, 16), strides=(1, 2),
                     encoder_dropout_rates=(0.0, 0.0),
                     decoder_dropout_rates=(0.0,), s2d_level0=True)
        x = jnp.zeros((1, 33, 33, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 33, 33, 3)

    @pytest.mark.slow
    def test_low_channel_decoder_s2d_equivalent(self):
        """s2d_low_channel_decoders wraps sub-128ch dense decoder levels in
        s2d space (MAC-neutral there); outputs, grads, and the param tree
        must match the dense path exactly (same params)."""
        make = lambda wrap: UNet(
            # decoder feats=64 < 128 with (4*64) % 128 == 0 → wrap triggers
            # on decoder_0; decoder_1 is the s2d_level0 stage.
            features_per_stage=(32, 64, 128), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.0),
            decoder_dropout_rates=(0.0, 0.0),
            s2d_low_channel_decoders=wrap,
        )
        x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        params = make(False).init(jax.random.key(0), x)
        p2 = make(True).init(jax.random.key(0), x)
        assert jax.tree.structure(params) == jax.tree.structure(p2)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            assert a.shape == b.shape

        out_dense = make(False).apply(params, x)
        out_wrap = make(True).apply(params, x)
        np.testing.assert_allclose(np.asarray(out_wrap), np.asarray(out_dense),
                                   rtol=1e-4, atol=1e-4)

        def loss(p, wrap):
            return jnp.sum(make(wrap).apply(p, x) ** 2)

        g0 = jax.grad(loss)(params, False)
        g1 = jax.grad(loss)(params, True)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            # Different summation order ⇒ f32 noise; scale atol to the
            # leaf's magnitude. Floor covers analytically-zero leaves
            # (conv bias feeding an instance norm: IN subtracts the mean,
            # so those grads are exactly 0 and both arrays are rounding
            # noise ~1e-3); kernel/scale leaves are O(0.1-10) and still
            # get the tight 0.2% relative check.
            atol = max(5e-3, 2e-3 * float(np.max(np.abs(a), initial=0.0)))
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=atol)

    def test_low_channel_decoder_dropout_masks_match(self):
        """Wrapped decoders draw the same channel-dropout mask as dense."""
        make = lambda wrap: UNet(
            features_per_stage=(32, 64, 128), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.0),
            decoder_dropout_rates=(0.5, 0.0),
            s2d_low_channel_decoders=wrap,
        )
        x = jnp.asarray(np.random.default_rng(12).normal(size=(1, 32, 32, 3)),
                        jnp.float32)
        params = make(False).init(jax.random.key(0), x)
        kw = dict(deterministic=False, rngs={"dropout": jax.random.key(7)})
        a = make(False).apply(params, x, **kw)
        b = make(True).apply(params, x, **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    def test_low_channel_decoder_wrap_skips_odd_sizes(self):
        model = UNet(features_per_stage=(32, 64, 128), strides=(1, 2, 2),
                     encoder_dropout_rates=(0.0, 0.0, 0.0),
                     decoder_dropout_rates=(0.0, 0.0))
        x = jnp.zeros((1, 36, 36, 3))  # 36/2=18 (even) but 18/2=9: the
        # decoder_0 skip is 18² (even) so the wrap may run; at 34² the skip
        # is 17² (odd) and the wrap must fall back to the dense path.
        params = model.init(jax.random.key(0), x)
        assert model.apply(params, x).shape == (1, 36, 36, 3)
        x2 = jnp.zeros((1, 34, 34, 3))
        p2 = model.init(jax.random.key(0), x2)
        assert model.apply(p2, x2).shape == (1, 34, 34, 3)

    def test_dropout_masks_match_between_modes(self):
        """Channel-dropout draws the same mask in both layouts (same rng)."""
        make = lambda s2d: UNet(
            features_per_stage=(8, 16), strides=(1, 2),
            encoder_dropout_rates=(0.5, 0.0), decoder_dropout_rates=(0.0,),
            s2d_level0=s2d,
        )
        x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 16, 16, 3)), jnp.float32)
        params = make(False).init(jax.random.key(0), x)
        kw = dict(deterministic=False, rngs={"dropout": jax.random.key(3)})
        a = make(False).apply(params, x, **kw)
        b = make(True).apply(params, x, **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)
