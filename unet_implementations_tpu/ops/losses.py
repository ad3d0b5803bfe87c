"""Loss functions (pure JAX, jit-friendly, f32 accumulation).

Reimplements the reference objectives as fused functional ops instead of the
reference's per-class Python loops and per-step ``nn.CrossEntropyLoss``
rebuilding:

- Combined Dice + weighted cross-entropy segmentation loss with border-ignore
  (reference: ``Our_UNet/models/losses.py:5-121``). Dynamic per-batch class
  weights are computed with one-hot reductions inside the jitted step
  (reference recomputes them eagerly per forward, ``losses.py:24-62``).
- Reconstruction losses: MSE, Gaussian-window SSIM, PSNR
  (reference: ``AE_pretrained/reconstruction/models/losses.py:171-247``,
  ``AE_pretrained/reconstruction/utils/metrics.py:15-142``), and a perceptual
  feature-MSE combinator (``models/losses.py:82-168``).

Conventions: logits/images are NHWC; segmentation masks are integer (B, H, W)
with ignore label 255. All reductions are performed in float32 regardless of
input dtype (bf16-safe on TPU).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

IGNORE_INDEX = 255


def _valid_mask(mask: jax.Array, ignore_index: int) -> jax.Array:
    return (mask != ignore_index).astype(jnp.float32)


def compute_class_weights(
    mask: jax.Array,
    num_classes: int = 3,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Inverse-frequency class weights over a batch of masks.

    ``w_c = total_valid_pixels / count_c`` with zero counts clamped to 1,
    normalized so ``sum(w) == num_classes``. Matches the reference's
    per-batch dynamic weights (``Our_UNet/models/losses.py:24-62``) expressed
    as one-hot reductions instead of a per-class Python loop.
    """
    valid = _valid_mask(mask, ignore_index)
    # one_hot maps out-of-range labels (255) to the all-zero row.
    onehot = jax.nn.one_hot(mask, num_classes, dtype=jnp.float32)
    counts = jnp.sum(onehot * valid[..., None], axis=tuple(range(mask.ndim)))
    total = jnp.sum(valid)
    counts = jnp.where(counts == 0, 1.0, counts)
    weights = total / counts
    return weights * (num_classes / jnp.sum(weights))


def weighted_cross_entropy(
    logits: jax.Array,
    mask: jax.Array,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Class-weighted CE with ignore label, torch-``CrossEntropyLoss`` semantics.

    ``loss = sum_i w[y_i] * nll_i / sum_i w[y_i]`` over valid pixels
    (unweighted mean when ``class_weights`` is None).
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    valid = _valid_mask(mask, ignore_index)
    # One-hot arithmetic instead of take_along_axis / weight-table gathers:
    # gathers cost ~10x on TPU and (being only on the VALUE path) made
    # returning the loss 167ms/step more expensive than its gradient.
    onehot = jax.nn.one_hot(mask, num_classes, dtype=jnp.float32)  # 255 → 0s
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if class_weights is None:
        pixel_w = valid
    else:
        pixel_w = jnp.sum(onehot * class_weights.astype(jnp.float32), axis=-1) * valid
    denom = jnp.maximum(jnp.sum(pixel_w), 1e-12)
    return jnp.sum(nll * pixel_w) / denom


def soft_dice_loss(
    logits: jax.Array,
    mask: jax.Array,
    ignore_index: int = IGNORE_INDEX,
    smooth: float = 1e-5,
) -> jax.Array:
    """Soft Dice loss over all classes (incl. background), border masked out.

    Per class c and per sample b: ``dice = (2*I + s) / (U + s)`` with
    ``I = sum(p_c * t_c)``, ``U = sum(p_c) + sum(t_c)`` over valid pixels;
    loss is ``mean_c(1 - mean_b(dice))``. Matches the reference formula
    (``Our_UNet/models/losses.py:84-121``) without the per-class loop.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = _valid_mask(mask, ignore_index)[..., None]  # (B, H, W, 1)
    onehot = jax.nn.one_hot(mask, num_classes, dtype=jnp.float32) * valid
    probs = probs * valid
    # Reduce spatial dims → (B, C)
    spatial_axes = tuple(range(1, probs.ndim - 1))
    intersection = jnp.sum(probs * onehot, axis=spatial_axes)
    union = jnp.sum(probs, axis=spatial_axes) + jnp.sum(onehot, axis=spatial_axes)
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return jnp.mean(1.0 - jnp.mean(dice, axis=0))


def segmentation_loss(
    logits: jax.Array,
    mask: jax.Array,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    class_weights: Optional[jax.Array] = None,
    dynamic_weights: bool = True,
    ignore_index: int = IGNORE_INDEX,
    smooth: float = 1e-5,
) -> jax.Array:
    """Combined ``weight_ce*CE + weight_dice*Dice``.

    With ``dynamic_weights`` the CE class weights are recomputed per batch
    from inverse pixel frequency; ``class_weights`` provides the static-weight
    path; both None/False gives unweighted CE. Mirrors the three trainer
    configurations at ``Our_UNet/src/train.py:814-878``.
    """
    if logits.shape[1:3] != mask.shape[1:3]:
        from unet_implementations_tpu.ops.resize import resize_bilinear

        logits = resize_bilinear(logits, mask.shape[1:3])
    if dynamic_weights and class_weights is None:
        class_weights = compute_class_weights(
            mask, logits.shape[-1], ignore_index
        )
    ce = weighted_cross_entropy(logits, mask, class_weights, ignore_index)
    dice = soft_dice_loss(logits, mask, ignore_index, smooth)
    return weight_ce * ce + weight_dice * dice


# ---------------------------------------------------------------------------
# Reconstruction losses / metrics
# ---------------------------------------------------------------------------


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements (torch ``nn.MSELoss`` default)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR, NHWC input → (B,). MSE clamped at 1e-10.

    Reference: ``AE_pretrained/reconstruction/utils/metrics.py:15-40``.
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    mse = jnp.mean(diff * diff, axis=tuple(range(1, pred.ndim)))
    mse = jnp.maximum(mse, 1e-10)
    return 10.0 * jnp.log10(max_val**2 / mse)


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


@functools.partial(jax.jit, static_argnames=("kernel_size", "sigma", "max_val", "size_average"))
def ssim(
    pred: jax.Array,
    target: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    max_val: float = 1.0,
    size_average: bool = False,
) -> jax.Array:
    """Gaussian-window SSIM, NHWC input.

    Zero-padded depthwise convolution, C1=(0.01*max)^2, C2=(0.03*max)^2 —
    matches ``AE_pretrained/reconstruction/utils/metrics.py:74-142`` (and the
    SSIMLoss variant at ``models/losses.py:201-222`` when
    ``size_average=True``). Returns per-image mean SSIM (B,) by default, or a
    scalar mean over the whole map when ``size_average``.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    channels = pred.shape[-1]
    win = _gaussian_window(kernel_size, sigma)
    # Depthwise kernel: (H, W, in_per_group=1, out=C)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, channels))
    pad = kernel_size // 2

    def blur(x):
        # HIGHEST precision: this is a metric — the backend's default conv
        # precision (bf16-ish) visibly perturbs the variance cancellation.
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=channels,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    var_p = blur(pred * pred) - mu_pp
    var_t = blur(target * target) - mu_tt
    cov = blur(pred * target) - mu_pt
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    ssim_map = ((2 * mu_pt + c1) * (2 * cov + c2)) / (
        (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))


def ssim_loss(pred: jax.Array, target: jax.Array, kernel_size: int = 11) -> jax.Array:
    """``1 - SSIM`` averaged over the whole map (reference SSIMLoss)."""
    return 1.0 - ssim(pred, target, kernel_size=kernel_size, size_average=True)


def perceptual_loss(
    pred: jax.Array,
    target: jax.Array,
    feature_fns: Sequence[Callable[[jax.Array], jax.Array]],
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> jax.Array:
    """Feature-space MSE averaged over extractor layers.

    ``feature_fns`` is either a single callable mapping normalized NHWC
    images to a dict of feature maps (``models/vgg.py::make_features_fn`` —
    ONE trunk pass per branch) or a sequence of per-tap callables. The
    target branch is detached, matching
    ``AE_pretrained/reconstruction/models/losses.py:138-168``.
    """
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    pred_n = (pred.astype(jnp.float32) - m) / s
    target_n = (target.astype(jnp.float32) - m) / s
    if callable(feature_fns):
        pf = feature_fns(pred_n)
        tf = jax.lax.stop_gradient(feature_fns(target_n))
        losses = [mse_loss(pf[k], tf[k]) for k in sorted(pf)]
        return sum(losses) / len(losses)
    loss = 0.0
    for fn in feature_fns:
        pf = fn(pred_n)
        tf = jax.lax.stop_gradient(fn(target_n))
        loss = loss + mse_loss(pf, tf)
    return loss / len(feature_fns)


def reconstruction_loss(
    pred: jax.Array,
    target: jax.Array,
    mse_weight: float = 1.0,
    perceptual_weight: float = 0.0,
    ssim_weight: float = 0.0,
    feature_fns: Optional[Sequence[Callable[[jax.Array], jax.Array]]] = None,
) -> jax.Array:
    """``mse_w*MSE + perc_w*Perceptual + ssim_w*(1-SSIM)``.

    Reference: ``AE_pretrained/reconstruction/models/losses.py:12-79``. Note
    the reference AE trainer actually optimizes plain MSE only
    (``reconstruction/src/train.py:420-437`` ignores the weight flags); the
    ``ae_recon`` recipe defaults follow that trained truth.
    """
    total = mse_weight * mse_loss(pred, target)
    if perceptual_weight > 0 and feature_fns:
        total = total + perceptual_weight * perceptual_loss(pred, target, feature_fns)
    if ssim_weight > 0:
        total = total + ssim_weight * ssim_loss(pred, target)
    return total
