"""Cross-implementation parity against the ACTUAL reference torch classes.

Unlike tests/test_convert.py (which checks against a hand-rewritten torch
composition), these tests import the reference's own model modules from
/root/reference, build the exact 6-stage configurations the trainers
construct (``Our_UNet/src/train.py:776-795``, ``CLIP_UNet/src/train.py:
476-495``, ``AE_pretrained/reconstruction/src/train.py:351-368``,
``AE_pretrained/transfer_learning/src/train.py:415-436``), convert their
randomly initialized state dicts with ``models/convert.py``, and assert
512x512 forward parity for all four variants — plus the phase-2 encoder
transfer contract (``transfer_learning/models/unet.py:409-453``) against
``training/checkpoint.py::extract_encoder_params``.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn_t
import jax
import jax.numpy as jnp

from unet_implementations_tpu.models.convert import torch_unet_state_dict_to_params
from unet_implementations_tpu.models.unet import (
    AE_DEC_DROPOUT,
    AE_ENC_DROPOUT,
    UNet,
    autoencoder_6stage,
    unet_6stage,
)

REF = "/root/reference"
SIZE = 512  # the reference's actual input resolution


def _load_ref(name: str, rel_path: str):
    path = os.path.join(REF, rel_path)
    if not os.path.exists(path):  # pragma: no cover
        pytest.skip(f"reference snapshot not present: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_COMMON = dict(
    n_stages=6,
    features_per_stage=[32, 64, 128, 256, 512, 512],
    kernel_sizes=[[3, 3]] * 6,
    strides=[[1, 1], [2, 2], [2, 2], [2, 2], [2, 2], [2, 2]],
    n_conv_per_stage=[2] * 6,
    n_conv_per_stage_decoder=[2] * 5,
    conv_bias=True,
    norm_op=nn_t.InstanceNorm2d,
    norm_op_kwargs={"eps": 1e-5, "affine": True},
    dropout_op=None,
    nonlin=nn_t.LeakyReLU,
    nonlin_kwargs={"inplace": True},
)
_SEG_DROPOUT = dict(
    encoder_dropout_rates=[0.0, 0.0, 0.1, 0.2, 0.3, 0.3],
    decoder_dropout_rates=[0.3, 0.2, 0.2, 0.1, 0.0],
)
_AE_DROPOUT = dict(
    encoder_dropout_rates=list(AE_ENC_DROPOUT),
    decoder_dropout_rates=list(AE_DEC_DROPOUT),
)


def _rand_image(seed: int, size: int = SIZE) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(1, size, size, 3)).astype(
        np.float32
    )


def _assert_forward_parity(ref_model, flax_model, x_nhwc, clip_emb=None):
    ref_model.eval()
    params = torch_unet_state_dict_to_params(ref_model.state_dict(), flax_model)
    xt = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    with torch.no_grad():
        if clip_emb is not None:
            # The reference extractor broadcasts the global embedding over a
            # 16x16 grid (CLIP_UNet/models/unet.py:599-613).
            grid = torch.from_numpy(clip_emb)[:, :, None, None].expand(
                -1, -1, 16, 16
            )
            ref = ref_model(xt, clip_features=grid)
        else:
            ref = ref_model(xt)
    ref = ref.permute(0, 2, 3, 1).numpy()
    kwargs = {}
    if clip_emb is not None:
        kwargs["clip_features"] = jnp.asarray(clip_emb)
    ours = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x_nhwc), **kwargs))
    assert ours.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3)


@pytest.mark.slow
class TestReferenceForwardParity:
    def test_our_unet_512(self):
        ref_mod = _load_ref("ref_our_unet", "Our_UNet/models/unet.py")
        torch.manual_seed(0)
        model = ref_mod.UNet(in_channels=3, num_classes=3, **_COMMON, **_SEG_DROPOUT)
        _assert_forward_parity(model, unet_6stage(), _rand_image(1))

    def test_clip_unet_512(self):
        ref_mod = _load_ref("ref_clip_unet", "CLIP_UNet/models/unet.py")
        torch.manual_seed(1)
        model = ref_mod.UNet(
            in_channels=3,
            num_classes=3,
            **_COMMON,
            **_SEG_DROPOUT,
            with_clip_features=True,
            clip_dim=512,
        )
        emb = np.random.default_rng(2).normal(size=(1, 512)).astype(np.float32)
        _assert_forward_parity(model, unet_6stage(clip_fusion=True), _rand_image(3), emb)

    def test_autoencoder_512(self):
        ref_mod = _load_ref(
            "ref_autoencoder", "AE_pretrained/reconstruction/models/autoencoder.py"
        )
        torch.manual_seed(2)
        model = ref_mod.Autoencoder(
            in_channels=3, out_channels=3, **_COMMON, **_AE_DROPOUT
        )
        _assert_forward_parity(model, autoencoder_6stage(), _rand_image(4))

    def test_transfer_unet_512(self):
        ref_mod = _load_ref(
            "ref_transfer_unet", "AE_pretrained/transfer_learning/models/unet.py"
        )
        torch.manual_seed(3)
        model = ref_mod.UNet(in_channels=3, num_classes=3, **_COMMON, **_SEG_DROPOUT)
        _assert_forward_parity(model, unet_6stage(), _rand_image(5))


class TestEncoderTransferContract:
    """Phase-2 contract: reference load_pretrained_encoder vs our Orbax graft."""

    def _small(self, cls, head_kwargs, rates):
        return cls(
            n_stages=3,
            features_per_stage=[4, 8, 8],
            kernel_sizes=[[3, 3]] * 3,
            strides=[[1, 1], [2, 2], [2, 2]],
            n_conv_per_stage=[2] * 3,
            n_conv_per_stage_decoder=[2] * 2,
            conv_bias=True,
            norm_op=nn_t.InstanceNorm2d,
            norm_op_kwargs={"eps": 1e-5, "affine": True},
            dropout_op=None,
            nonlin=nn_t.LeakyReLU,
            nonlin_kwargs={"inplace": True},
            encoder_dropout_rates=rates[0],
            decoder_dropout_rates=rates[1],
            **head_kwargs,
        )

    def test_reference_load_matches_our_graft(self, tmp_path):
        ae_mod = _load_ref(
            "ref_autoencoder_c", "AE_pretrained/reconstruction/models/autoencoder.py"
        )
        tl_mod = _load_ref(
            "ref_transfer_unet_c", "AE_pretrained/transfer_learning/models/unet.py"
        )
        rates = ([0.0, 0.0, 0.1], [0.1, 0.0])
        torch.manual_seed(10)
        ae = self._small(ae_mod.Autoencoder, {"in_channels": 3, "out_channels": 3}, rates)
        ckpt = tmp_path / "ae_best.pth"
        torch.save({"model_state_dict": ae.state_dict(), "epoch": 1}, ckpt)

        # Reference path: load + freeze the encoder from the AE checkpoint.
        torch.manual_seed(11)
        tl = self._small(
            tl_mod.UNet,
            {"in_channels": 3, "num_classes": 3, "pretrained_encoder_path": None},
            rates,
        )
        tl.load_pretrained_encoder(str(ckpt))
        for p in tl.encoder_stages.parameters():
            assert not p.requires_grad  # frozen (unet.py:450-453)

        # Our path: convert the AE state dict, save encoder sub-trees via
        # Orbax, graft into the (differently initialized) UNet params.
        flax_arch = UNet(
            features_per_stage=(4, 8, 8),
            strides=(1, 2, 2),
            encoder_dropout_rates=rates[0],
            decoder_dropout_rates=rates[1],
        )
        ae_flax = UNet(
            features_per_stage=(4, 8, 8),
            strides=(1, 2, 2),
            head="reconstruction",
            encoder_dropout_rates=rates[0],
            decoder_dropout_rates=rates[1],
        )
        ae_params = torch_unet_state_dict_to_params(ae.state_dict(), ae_flax)
        import orbax.checkpoint as ocp

        ocp.PyTreeCheckpointer().save(
            tmp_path / "ae_orbax", {"params": jax.device_get(ae_params)}
        )
        unet_params = torch_unet_state_dict_to_params(tl.state_dict(), flax_arch)
        from unet_implementations_tpu.training.checkpoint import extract_encoder_params

        # Re-convert the torch model AFTER its load_pretrained_encoder to get
        # the reference's post-graft truth; compare against our graft of the
        # pre-load params.
        pre_load_params = torch_unet_state_dict_to_params(
            self._reinit_decoder_only(tl), flax_arch
        )
        grafted = extract_encoder_params(
            tmp_path / "ae_orbax", pre_load_params, n_stages=3
        )
        for i in range(3):
            a = jax.tree.leaves(grafted[f"encoder_{i}"])
            b = jax.tree.leaves(unet_params[f"encoder_{i}"])
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    @staticmethod
    def _reinit_decoder_only(tl):
        """State dict with encoder entries scrambled — proves the graft is
        what restores them, not the original init."""
        sd = {k: v.clone() for k, v in tl.state_dict().items()}
        g = torch.Generator().manual_seed(99)
        for k in sd:
            if k.startswith("encoder_stages."):
                sd[k] = torch.randn(sd[k].shape, generator=g)
        return sd
