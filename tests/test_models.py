"""Model tests: shapes, parameter counts, torch block-level parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn_t

from unet_implementations_tpu.models import ConvBlock, UNet
from unet_implementations_tpu.models.unet import (
    autoencoder_6stage,
    encoder_param_names,
    unet_6stage,
)


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _expected_unet_params(features=(32, 64, 128, 256, 512, 512), num_classes=3,
                          in_ch=3, n_convs=2, k=3, head="segmentation"):
    """Arithmetic parameter count: conv k*k*cin*cout + cout bias, IN 2*cout."""
    total = 0
    cin = in_ch
    for f in features:  # encoder
        for _ in range(n_convs):
            total += k * k * cin * f + f + 2 * f
            cin = f
    n = len(features)
    for d in range(n - 1):  # decoder d consumes skip n-2-d
        skip_f = features[n - 2 - d]
        cin = features[n - 1 - d] + skip_f  # upsampled + skip concat
        for _ in range(n_convs):
            total += k * k * cin * skip_f + skip_f + 2 * skip_f
            cin = skip_f
    if head == "segmentation":
        total += 1 * 1 * features[0] * num_classes + num_classes
    else:
        total += 3 * 3 * features[0] * 3 + 3
    return total


class TestUNetShapes:
    def test_segmentation_output_shape(self):
        model = unet_6stage()
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 64, 64, 3)
        assert out.dtype == jnp.float32

    def test_reconstruction_output_range(self):
        model = autoencoder_6stage()
        x = jnp.ones((1, 64, 64, 3)) * 0.5
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 64, 64, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    @pytest.mark.slow
    def test_odd_input_sizes(self):
        # Decoder must upsample back to exact skip sizes (e.g. 375x500-ish).
        model = unet_6stage()
        x = jnp.zeros((1, 96, 160, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 96, 160, 3)

    def test_bottleneck_flatten(self):
        model = autoencoder_6stage()
        x = jnp.zeros((2, 64, 64, 3))
        params = model.init(jax.random.key(0), x)
        out, z = model.apply(params, x, return_bottleneck=True)
        assert z.shape == (2, 2 * 2 * 512)  # 64 / 2^5 = 2


class TestParamCounts:
    def test_segmentation_param_count(self):
        model = unet_6stage()
        params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        assert _param_count(params) == _expected_unet_params()

    def test_autoencoder_param_count(self):
        model = autoencoder_6stage()
        params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        assert _param_count(params) == _expected_unet_params(head="reconstruction")

    def test_clip_fusion_adds_static_layer(self):
        model = UNet(clip_fusion=True)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 512))
        )
        extra = 1 * 1 * 1024 * 512 + 512 + 2 * 512  # fusion conv + IN
        assert _param_count(params) == _expected_unet_params() + extra

    def test_encoder_subtree_names(self):
        model = unet_6stage()
        params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        for name in encoder_param_names(6):
            assert name in params["params"]


class TestTorchParity:
    """Block-level numeric parity against torch primitives with shared weights."""

    @pytest.mark.parametrize("stride", [1, 2])
    def test_convblock_matches_torch(self, stride):
        cin, cout, h, w = 5, 8, 16, 16
        block = ConvBlock(features=cout, stride=stride)
        x = np.random.default_rng(0).normal(size=(2, h, w, cin)).astype(np.float32)
        variables = block.init(jax.random.key(1), jnp.asarray(x))
        ours = np.asarray(block.apply(variables, jnp.asarray(x)))

        # torch oracle with identical weights
        layers = []
        p = variables["params"]
        c = cin
        with torch.no_grad():
            for i in range(2):
                conv = nn_t.Conv2d(c, cout, 3, stride if i == 0 else 1, 1)
                conv.weight.copy_(
                    torch.from_numpy(np.transpose(np.asarray(p[f"conv_{i}"]["kernel"]), (3, 2, 0, 1)))
                )
                conv.bias.copy_(torch.from_numpy(np.asarray(p[f"conv_{i}"]["bias"])))
                norm = nn_t.InstanceNorm2d(cout, eps=1e-5, affine=True)
                norm.weight.copy_(torch.from_numpy(np.asarray(p[f"norm_{i}"]["scale"])))
                norm.bias.copy_(torch.from_numpy(np.asarray(p[f"norm_{i}"]["bias"])))
                layers += [conv, norm, nn_t.LeakyReLU(0.01)]
                c = cout
            ref = nn_t.Sequential(*layers)(torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_full_unet_matches_torch_composition(self):
        """Tiny 3-stage UNet vs torch composition of the same architecture."""
        features = (4, 8, 8)
        model = UNet(
            features_per_stage=features,
            strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.0),
            decoder_dropout_rates=(0.0, 0.0),
        )
        x = np.random.default_rng(2).normal(size=(1, 16, 16, 3)).astype(np.float32)
        variables = model.init(jax.random.key(3), jnp.asarray(x))
        ours = np.asarray(model.apply(variables, jnp.asarray(x)))

        p = variables["params"]

        def _lookup(prefix):
            node = p
            for part in prefix.split("/"):
                node = node[part]
            return node

        def torch_convblock(prefix, cin, cout, stride):
            node = _lookup(prefix)
            layers = []
            c = cin
            with torch.no_grad():
                for i in range(2):
                    conv = nn_t.Conv2d(c, cout, 3, stride if i == 0 else 1, 1)
                    conv.weight.copy_(torch.from_numpy(
                        np.transpose(np.asarray(node[f"conv_{i}"]["kernel"]), (3, 2, 0, 1))))
                    conv.bias.copy_(torch.from_numpy(np.asarray(node[f"conv_{i}"]["bias"])))
                    norm = nn_t.InstanceNorm2d(cout, eps=1e-5, affine=True)
                    norm.weight.copy_(torch.from_numpy(np.asarray(node[f"norm_{i}"]["scale"])))
                    norm.bias.copy_(torch.from_numpy(np.asarray(node[f"norm_{i}"]["bias"])))
                    layers += [conv, norm, nn_t.LeakyReLU(0.01)]
                    c = cout
            return nn_t.Sequential(*layers)

        import torch.nn.functional as F

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            e0 = torch_convblock("encoder_0", 3, 4, 1)(xt)
            e1 = torch_convblock("encoder_1", 4, 8, 2)(e0)
            e2 = torch_convblock("encoder_2", 8, 8, 2)(e1)
            d0_in = torch.cat([
                F.interpolate(e2, size=e1.shape[2:], mode="bilinear", align_corners=False), e1
            ], dim=1)
            d0 = torch_convblock("decoder_0/conv_block", 16, 8, 1)(d0_in)
            d1_in = torch.cat([
                F.interpolate(d0, size=e0.shape[2:], mode="bilinear", align_corners=False), e0
            ], dim=1)
            d1 = torch_convblock("decoder_1/conv_block", 12, 4, 1)(d1_in)
            head = nn_t.Conv2d(4, 3, 1)
            head.weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(p["head"]["kernel"]), (3, 2, 0, 1))))
            head.bias.copy_(torch.from_numpy(np.asarray(p["head"]["bias"])))
            ref = head(d1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestDropout:
    def test_spatial_dropout_drops_whole_channels(self):
        block = ConvBlock(features=16, dropout_rate=0.5)
        x = jnp.ones((1, 8, 8, 4))
        variables = block.init(jax.random.key(0), x)
        out = block.apply(
            variables, x, deterministic=False, rngs={"dropout": jax.random.key(42)}
        )
        out = np.asarray(out)
        # Every channel is either entirely zero or entirely nonzero.
        per_channel = out[0].reshape(-1, 16)
        zero_frac = (per_channel == 0).mean(axis=0)
        assert np.all((zero_frac == 0.0) | (zero_frac == 1.0))

    def test_deterministic_is_identity_in_eval(self):
        block = ConvBlock(features=16, dropout_rate=0.5)
        x = jnp.ones((1, 8, 8, 4))
        variables = block.init(jax.random.key(0), x)
        a = block.apply(variables, x, deterministic=True)
        b = block.apply(variables, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestClipFusion:
    def test_fusion_changes_output(self):
        model = UNet(clip_fusion=True)
        x = jnp.ones((1, 64, 64, 3))
        cf = jnp.ones((1, 512))
        params = model.init(jax.random.key(0), x, cf)
        with_cf = model.apply(params, x, cf)
        without = model.apply(params, x, None)
        assert not np.allclose(np.asarray(with_cf), np.asarray(without))

    def test_none_features_skips_fusion(self):
        # Mirrors reference behavior: clip_features=None bypasses fusion
        # (CLIP_UNet/models/unet.py:442), used by the reference evaluator.
        model = UNet(clip_fusion=True)
        x = jnp.ones((1, 64, 64, 3))
        params = model.init(jax.random.key(0), x, jnp.ones((1, 512)))
        out = model.apply(params, x, None)
        assert out.shape == (1, 64, 64, 3)
