"""Pallas TPU kernels for the hot fused ops."""

from unet_implementations_tpu.kernels.instance_norm import fused_instance_norm  # noqa: F401
