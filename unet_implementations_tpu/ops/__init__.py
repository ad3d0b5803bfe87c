"""Core numerical ops: losses, metrics, resize primitives."""

from unet_implementations_tpu.ops.losses import (  # noqa: F401
    compute_class_weights,
    weighted_cross_entropy,
    soft_dice_loss,
    segmentation_loss,
    mse_loss,
    psnr,
    ssim,
    ssim_loss,
    perceptual_loss,
    reconstruction_loss,
)
from unet_implementations_tpu.ops.metrics import (  # noqa: F401
    confusion_matrix,
    metrics_from_confusion,
    SegmentationMetrics,
)
from unet_implementations_tpu.ops.resize import (  # noqa: F401
    resize_nearest,
    resize_bilinear,
)
