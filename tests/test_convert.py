"""Torch→Flax checkpoint conversion: key mapping + numeric parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F

from unet_implementations_tpu.models.convert import torch_unet_state_dict_to_params
from unet_implementations_tpu.models.unet import UNet


def _fabricate_state_dict(g, features=(4, 8, 8), enc_rates=(0.0, 0.0, 0.1),
                          dec_rates=(0.1, 0.0), head="segmentation"):
    """Reference-layout state dict with random weights (torch tensors)."""
    sd = {}
    cin = 3
    for i, f in enumerate(features):
        step = 4 if enc_rates[i] > 0 else 3
        c = cin
        for j in range(2):
            sd[f"encoder_stages.{i}.block.{j * step}.weight"] = torch.randn(f, c, 3, 3, generator=g) * 0.2
            sd[f"encoder_stages.{i}.block.{j * step}.bias"] = torch.randn(f, generator=g) * 0.1
            sd[f"encoder_stages.{i}.block.{j * step + 1}.weight"] = torch.rand(f, generator=g) + 0.5
            sd[f"encoder_stages.{i}.block.{j * step + 1}.bias"] = torch.randn(f, generator=g) * 0.1
            c = f
        cin = f
    n = len(features)
    for d in range(n - 1):
        skip_f = features[n - 2 - d]
        in_f = features[n - 1 - d] + skip_f
        step = 4 if dec_rates[d] > 0 else 3
        c = in_f
        for j in range(2):
            sd[f"decoder_stages.{d}.conv_block.block.{j * step}.weight"] = torch.randn(skip_f, c, 3, 3, generator=g) * 0.2
            sd[f"decoder_stages.{d}.conv_block.block.{j * step}.bias"] = torch.randn(skip_f, generator=g) * 0.1
            sd[f"decoder_stages.{d}.conv_block.block.{j * step + 1}.weight"] = torch.rand(skip_f, generator=g) + 0.5
            sd[f"decoder_stages.{d}.conv_block.block.{j * step + 1}.bias"] = torch.randn(skip_f, generator=g) * 0.1
            c = skip_f
    if head == "segmentation":
        sd["segmentation_output.weight"] = torch.randn(3, features[0], 1, 1, generator=g) * 0.2
        sd["segmentation_output.bias"] = torch.randn(3, generator=g) * 0.1
    else:
        sd["reconstruction_output.0.weight"] = torch.randn(3, features[0], 3, 3, generator=g) * 0.2
        sd["reconstruction_output.0.bias"] = torch.randn(3, generator=g) * 0.1
    return sd


def _torch_forward(sd, x, features=(4, 8, 8), enc_rates=(0.0, 0.0, 0.1),
                   dec_rates=(0.1, 0.0), strides=(1, 2, 2)):
    """Functional reference forward using the fabricated weights (eval mode)."""

    def block(prefix, x, n_convs, rate, stride):
        step = 4 if rate > 0 else 3
        for j in range(2):
            w = sd[f"{prefix}.block.{j * step}.weight"]
            b = sd[f"{prefix}.block.{j * step}.bias"]
            s = stride if j == 0 else 1
            x = F.conv2d(x, w, b, stride=s, padding=1)
            x = F.instance_norm(
                x, weight=sd[f"{prefix}.block.{j * step + 1}.weight"],
                bias=sd[f"{prefix}.block.{j * step + 1}.bias"], eps=1e-5,
            )
            x = F.leaky_relu(x, 0.01)
        return x

    skips = []
    n = len(features)
    for i in range(n):
        x = block(f"encoder_stages.{i}", x, 2, enc_rates[i], strides[i])
        if i < n - 1:
            skips.append(x)
    for d in range(n - 1):
        skip = skips[n - 2 - d]
        x = F.interpolate(x, size=skip.shape[2:], mode="bilinear", align_corners=False)
        x = torch.cat([x, skip], dim=1)
        x = block(f"decoder_stages.{d}.conv_block", x, 2, dec_rates[d], 1)
    return F.conv2d(x, sd["segmentation_output.weight"], sd["segmentation_output.bias"])


class TestConversion:
    def test_numeric_parity_with_torch(self):
        g = torch.Generator().manual_seed(0)
        sd = _fabricate_state_dict(g)
        model = UNet(
            features_per_stage=(4, 8, 8), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.1),
            decoder_dropout_rates=(0.1, 0.0),
        )
        params = torch_unet_state_dict_to_params(sd, model)

        x = np.random.default_rng(1).normal(size=(1, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = _torch_forward(sd, torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_tree_structure_matches_init(self):
        g = torch.Generator().manual_seed(2)
        sd = _fabricate_state_dict(g)
        model = UNet(
            features_per_stage=(4, 8, 8), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.1),
            decoder_dropout_rates=(0.1, 0.0),
        )
        params = torch_unet_state_dict_to_params(sd, model)
        init_params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
        assert jax.tree.structure(dict(init_params)) == jax.tree.structure(params)
        for a, b in zip(jax.tree.leaves(dict(init_params)), jax.tree.leaves(params)):
            assert a.shape == b.shape

    def test_convert_cli_roundtrip(self, tmp_path):
        """`convert` writes an Orbax checkpoint that evaluate/predict load."""
        from unet_implementations_tpu.models.convert import (
            convert_torch_checkpoint,
        )
        from unet_implementations_tpu.models.unet import (
            DEFAULT_DEC_DROPOUT,
            DEFAULT_ENC_DROPOUT,
            DEFAULT_FEATURES,
            unet_6stage,
        )
        from unet_implementations_tpu.training.checkpoint import restore_params

        g = torch.Generator().manual_seed(4)
        sd = _fabricate_state_dict(
            g, features=DEFAULT_FEATURES, enc_rates=DEFAULT_ENC_DROPOUT,
            dec_rates=DEFAULT_DEC_DROPOUT,
        )
        torch.save({"model_state_dict": sd, "epoch": 7, "best_dice": 0.71},
                   tmp_path / "ref.pth")

        out = tmp_path / "converted"
        convert_torch_checkpoint(tmp_path / "ref.pth", out)
        import json

        meta = json.loads((out / "meta.json").read_text())
        assert meta["epoch"] == 7
        assert meta["best_metric"] == 0.71
        assert meta["config"]["arch"] == "our_unet"

        model = unet_6stage()
        abstract = model.init(jax.random.key(0),
                              jnp.zeros((1, 64, 64, 3)))["params"]
        params = restore_params(out, abstract)
        expected = np.transpose(
            sd["segmentation_output.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_allclose(np.asarray(params["head"]["kernel"]),
                                   expected, rtol=1e-6)

    def test_reverse_roundtrip_bitwise(self, tmp_path):
        """torch → orbax → torch: the exported .pth reproduces the original
        state dict BITWISE on every tensor, with the exact key set the
        reference's strict load_state_dict requires."""
        from unet_implementations_tpu.models.convert import (
            convert_torch_checkpoint,
            export_torch_checkpoint,
        )
        from unet_implementations_tpu.models.unet import (
            DEFAULT_DEC_DROPOUT,
            DEFAULT_ENC_DROPOUT,
            DEFAULT_FEATURES,
        )

        g = torch.Generator().manual_seed(5)
        sd = _fabricate_state_dict(
            g, features=DEFAULT_FEATURES, enc_rates=DEFAULT_ENC_DROPOUT,
            dec_rates=DEFAULT_DEC_DROPOUT,
        )
        torch.save({"model_state_dict": sd, "epoch": 3, "best_dice": 0.5},
                   tmp_path / "ref.pth")
        convert_torch_checkpoint(tmp_path / "ref.pth", tmp_path / "orbax")
        export_torch_checkpoint(tmp_path / "orbax", tmp_path / "back.pth")

        back = torch.load(tmp_path / "back.pth", weights_only=False)
        assert back["epoch"] == 3
        assert back["best_dice"] == 0.5
        bsd = back["model_state_dict"]
        assert set(bsd) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(
                bsd[k].numpy(), sd[k].numpy(), err_msg=k)

    def test_export_torch_parser(self):
        from unet_implementations_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["export_torch", "--checkpoint", "c", "--output", "o.pth",
             "--arch", "ae_recon"])
        assert args.arch == "ae_recon"

    def test_reconstruction_head(self):
        g = torch.Generator().manual_seed(3)
        sd = _fabricate_state_dict(g, head="reconstruction")
        model = UNet(
            features_per_stage=(4, 8, 8), strides=(1, 2, 2),
            encoder_dropout_rates=(0.0, 0.0, 0.1),
            decoder_dropout_rates=(0.1, 0.0),
            head="reconstruction",
        )
        params = torch_unet_state_dict_to_params(sd, model)
        out = model.apply({"params": params}, jnp.zeros((1, 16, 16, 3)))
        assert out.shape == (1, 16, 16, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 1
