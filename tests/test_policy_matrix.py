"""One matrix test for the DEFAULT configuration's policy-flag resolution.

The perf policies (`UNET_TPU_S2D_UP_FOLD`, `UNET_TPU_DENSE_UP_FOLD`,
`UNET_TPU_PALLAS_UPSAMPLE`) and the module-field defaults (`s2d_level0`,
`s2d_low_channel_decoders`, `remat`, `fuse_norm_act`) each carry their own
docs and tests; this file pins what they RESOLVE TO together, per backend,
with no environment overrides — the configuration a user actually runs.
Change a default deliberately: update the matrix here and the rationale in
docs/PERFORMANCE.md in the same commit.
"""

import jax
import pytest

from unet_implementations_tpu.kernels import upsample as up_k
from unet_implementations_tpu.models import s2d
from unet_implementations_tpu.models.blocks import ConvBlock
from unet_implementations_tpu.models.unet import UNet


@pytest.fixture
def clean_env(monkeypatch):
    for var in (
        "UNET_TPU_S2D_UP_FOLD",
        "UNET_TPU_DENSE_UP_FOLD",
        "UNET_TPU_PALLAS_UPSAMPLE",
        "UNET_TPU_DISABLE_PALLAS_UPSAMPLE",
    ):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


def _fake_backend(monkeypatch, name):
    monkeypatch.setattr(jax, "default_backend", lambda: name)


class TestDefaultTPUConfiguration:
    """jax.default_backend() == 'tpu', no env vars set."""

    def test_folds_on_pallas_off(self, clean_env):
        _fake_backend(clean_env, "tpu")
        # s2d-level fold ON for both modes (round-2 win: helped train AND
        # inference); dense-level fold PER-MODE — inference jits only
        # (round-3 same-day isolation: +4.5% infer, −6% train).
        assert s2d.up_fold_enabled() is True
        assert s2d.dense_up_fold_enabled(deterministic=True) is True
        assert s2d.dense_up_fold_enabled(deterministic=False) is False
        # Pallas upsample kernels OFF (measured end-to-end loss: relayout
        # copies around the custom call — docs/PERFORMANCE.md).
        assert up_k._enabled("s2d") is False
        assert up_k._enabled("dense") is False

    def test_module_field_defaults(self):
        m = UNet()
        assert m.s2d_level0 is True
        assert m.s2d_low_channel_decoders is True
        assert m.remat is False  # measured neutral at the b32 HBM ceiling
        # fuse_norm_act defaults off at the block level (Pallas IN+LeakyReLU
        # measured loss: breaks XLA's conv+elementwise fusion).
        assert ConvBlock.__dataclass_fields__["fuse_norm_act"].default is False

    def test_axon_tunnel_counts_as_tpu(self, clean_env):
        _fake_backend(clean_env, "axon")
        assert s2d.up_fold_enabled() is True
        assert s2d.dense_up_fold_enabled(deterministic=True) is True
        assert s2d.dense_up_fold_enabled(deterministic=False) is False


class TestDefaultCPUConfiguration:
    """CPU (the test/CI backend): reference-path numerics everywhere."""

    def test_everything_off(self, clean_env):
        _fake_backend(clean_env, "cpu")
        assert s2d.up_fold_enabled() is False
        assert s2d.dense_up_fold_enabled(deterministic=True) is False
        assert s2d.dense_up_fold_enabled(deterministic=False) is False
        assert up_k._enabled("s2d") is False
        assert up_k._enabled("dense") is False


class TestOverrides:
    """Each env knob flips exactly its own policy."""

    def test_fold_overrides(self, clean_env):
        _fake_backend(clean_env, "tpu")
        clean_env.setenv("UNET_TPU_S2D_UP_FOLD", "0")
        assert s2d.up_fold_enabled() is False
        # dense fold FOLLOWS the s2d policy unless overridden itself...
        assert s2d.dense_up_fold_enabled(deterministic=True) is False
        # ...and its own var takes precedence over the fallback AND over
        # the per-mode split (explicit override forces BOTH modes — the
        # hardware-ablation contract).
        clean_env.setenv("UNET_TPU_DENSE_UP_FOLD", "1")
        assert s2d.dense_up_fold_enabled(deterministic=True) is True
        assert s2d.dense_up_fold_enabled(deterministic=False) is True
        assert s2d.up_fold_enabled() is False
        clean_env.setenv("UNET_TPU_DENSE_UP_FOLD", "0")
        assert s2d.dense_up_fold_enabled(deterministic=True) is False

    def test_cpu_can_opt_in(self, clean_env):
        _fake_backend(clean_env, "cpu")
        clean_env.setenv("UNET_TPU_S2D_UP_FOLD", "1")
        assert s2d.up_fold_enabled() is True

    def test_pallas_upsample_modes(self, clean_env):
        _fake_backend(clean_env, "tpu")
        clean_env.setenv("UNET_TPU_PALLAS_UPSAMPLE", "all")
        assert up_k._enabled("s2d") is True
        assert up_k._enabled("dense") is True
        clean_env.setenv("UNET_TPU_PALLAS_UPSAMPLE", "dense")
        assert up_k._enabled("s2d") is False
        assert up_k._enabled("dense") is True
        # The kill switch wins over any mode.
        clean_env.setenv("UNET_TPU_DISABLE_PALLAS_UPSAMPLE", "1")
        assert up_k._enabled("dense") is False
