"""Flax model zoo: parametric UNet covering all four reference variants."""

from unet_implementations_tpu.models.blocks import (  # noqa: F401
    InstanceNorm,
    ConvBlock,
    UpBlock,
)
from unet_implementations_tpu.models.unet import UNet, unet_6stage, autoencoder_6stage  # noqa: F401
