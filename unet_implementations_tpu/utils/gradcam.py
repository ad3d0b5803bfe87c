"""Grad-CAM for Flax models (reference V3: ``Our_UNet/utils/visualize.py:372-515``).

The reference registers forward/backward torch hooks on a chosen layer
(default ``decoder_stages[0].conv_block.block[0]`` — the first conv of the
first decoder stage). The JAX equivalent uses ``nn.intercept_methods`` to
add a zero perturbation at the target module's output; the class-score
gradient w.r.t. that perturbation IS the gradient w.r.t. the activation, and
the activation itself is captured in the same pass. CAM = ReLU(Σ_c w_c·A_c)
with w = spatial mean of the gradients, normalized and upsampled to the
input size.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# First conv of the first decoder stage — the reference's default target.
DEFAULT_TARGET: Tuple[str, ...] = ("decoder_0", "conv_block", "conv_0")


def gradcam(
    model: nn.Module,
    params,
    image: jax.Array,           # (1, H, W, 3)
    target_class: int,
    target_path: Tuple[str, ...] = DEFAULT_TARGET,
) -> np.ndarray:
    """Returns a (H, W) float32 CAM in [0, 1] for ``target_class``."""

    captured: Dict[str, jax.Array] = {}

    def capture_interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if tuple(getattr(context.module, "path", ())) == tuple(target_path):
            captured["act"] = out
        return out

    with nn.intercept_methods(capture_interceptor):
        _ = model.apply({"params": params}, image, deterministic=True)
    if "act" not in captured:
        raise ValueError(f"target module path {target_path} not found")
    activation = captured["act"]

    def forward_with_perturbation(pert):
        def interceptor(next_fn, args, kwargs, context):
            out = next_fn(*args, **kwargs)
            if tuple(getattr(context.module, "path", ())) == tuple(target_path):
                return out + pert
            return out

        with nn.intercept_methods(interceptor):
            logits = model.apply({"params": params}, image, deterministic=True)
        # class score: sum of the target-class logit map (reference protocol)
        return jnp.sum(logits[..., target_class].astype(jnp.float32))

    grads = jax.grad(forward_with_perturbation)(jnp.zeros_like(activation))

    weights = jnp.mean(grads.astype(jnp.float32), axis=(1, 2))      # (1, C)
    cam = jnp.maximum(
        jnp.sum(activation.astype(jnp.float32) * weights[:, None, None, :], axis=-1),
        0.0,
    )[0]
    cam = cam - cam.min()
    cam = cam / jnp.maximum(cam.max(), 1e-8)

    from unet_implementations_tpu.ops.resize import resize_bilinear

    cam = resize_bilinear(cam[..., None], image.shape[1:3], spatial_axes=(0, 1))
    return np.asarray(cam[..., 0], np.float32)


def visualize_gradcam(
    model, params, image, target_class: int, save_path,
    target_path: Tuple[str, ...] = DEFAULT_TARGET,
) -> np.ndarray:
    """Render the CAM as a jet overlay on the image (reference figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    from unet_implementations_tpu.utils.visualize import denormalize_image

    cam = gradcam(model, params, image, target_class, target_path)
    base = denormalize_image(np.asarray(image)[0]).astype(np.float32) / 255.0
    heat = cm.jet(cam)[..., :3]
    blend = np.clip(0.5 * base + 0.5 * heat, 0, 1)
    fig, axes = plt.subplots(1, 3, figsize=(14, 5))
    for ax, img, title in [(axes[0], base, "Image"), (axes[1], cam, "Grad-CAM"),
                           (axes[2], blend, "Overlay")]:
        ax.imshow(img, cmap="jet" if title == "Grad-CAM" else None)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(save_path, dpi=100)
    plt.close(fig)
    return cam
