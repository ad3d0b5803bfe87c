"""Tests for Grad-CAM and the VGG16 perceptual feature extractor."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_implementations_tpu.models.unet import UNet
from unet_implementations_tpu.models.vgg import VGG16Features, make_feature_fns
from unet_implementations_tpu.ops.losses import perceptual_loss
from unet_implementations_tpu.utils.gradcam import gradcam


def tiny_unet():
    return UNet(
        features_per_stage=(8, 16), strides=(1, 2),
        encoder_dropout_rates=(0.0, 0.0), decoder_dropout_rates=(0.0,),
    )


class TestGradCAM:
    def test_cam_shape_and_range(self):
        model = tiny_unet()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)),
                        jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]
        cam = gradcam(model, params, x, target_class=1)
        assert cam.shape == (16, 16)
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6

    def test_render(self, tmp_path):
        from unet_implementations_tpu.utils.gradcam import visualize_gradcam

        model = tiny_unet()
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 16, 3)),
                        jnp.float32)
        params = model.init(jax.random.key(0), x)["params"]
        visualize_gradcam(model, params, x, 2, tmp_path / "cam.png")
        assert (tmp_path / "cam.png").stat().st_size > 0

    def test_bad_path_raises(self):
        model = tiny_unet()
        x = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.key(0), x)["params"]
        import pytest

        with pytest.raises(ValueError):
            gradcam(model, params, x, 0, target_path=("nope",))


class TestVGG:
    def test_feature_shapes(self):
        model = VGG16Features()
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.key(0), x)
        feats = model.apply(params, x)
        assert feats["relu1_2"].shape == (1, 64, 64, 64)
        assert feats["relu2_2"].shape == (1, 32, 32, 128)
        assert feats["relu3_3"].shape == (1, 16, 16, 256)
        assert feats["relu4_3"].shape == (1, 8, 8, 512)

    def test_perceptual_loss_integration(self):
        fns = make_feature_fns(jax.random.key(0), (1, 32, 32, 3),
                               taps=("relu1_2", "relu2_2"))
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        b = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        val = float(perceptual_loss(a, b, fns))
        assert np.isfinite(val) and val > 0
        assert float(perceptual_loss(a, a, fns)) < 1e-10

    def test_perceptual_loss_differentiable(self):
        fns = make_feature_fns(jax.random.key(0), (1, 16, 16, 3),
                               taps=("relu1_2",))
        a = jnp.ones((1, 16, 16, 3)) * 0.3
        b = jnp.ones((1, 16, 16, 3)) * 0.7
        g = jax.grad(lambda x: perceptual_loss(x, b, fns))(a)
        assert np.all(np.isfinite(np.asarray(g)))
