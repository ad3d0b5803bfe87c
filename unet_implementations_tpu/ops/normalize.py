"""Device-side pixel normalization — the uint8 input path.

The host loader can emit raw uint8 pixels (``data/loader.py``
``emit_uint8=True``) so a weak host core does IO only; the float conversion
and ImageNet normalization then run inside the jitted step, where XLA fuses
them into the first conv's prologue — one elementwise pass over an input the
step already reads, free against the 512² conv stack. It also shrinks the
per-batch H2D transfer 4x (uint8 vs float32).

Why: the reference normalizes on the host inside the torch Dataset
(``Our_UNet/src/train.py:303-308``) with 4 forked DataLoader workers. On a
1-core TPU-VM host that design starves the chip — measured 80 img/s of host
float math against a train step consuming 169 img/s at 512² (round-5 soak).

The op sequence matches the host path (``data/loader.py::_finalize``)
exactly — /255., -mean, /std in float32. The standalone op is bit-identical
to the host pixels; inside a fused step XLA may re-round the chain, leaving
~1-ulp differences (far below bf16 training precision) — both guarded by
``tests/test_training.py::TestUint8Batches``.
"""

from __future__ import annotations

import jax.numpy as jnp

from unet_implementations_tpu.data.loader import IMAGENET_MEAN, IMAGENET_STD


def normalize_image(image: jnp.ndarray, mode: str = "imagenet") -> jnp.ndarray:
    """uint8 pixels → normalized float32; float inputs pass through unchanged.

    Step factories call this unconditionally: dtype dispatch is static under
    jit, so the float path compiles to a no-op and existing float batches
    (tests, online-augment outputs, golden tensors) are untouched.

    ``mode``: "imagenet" = /255 then ImageNet mean/std (segmentation);
    "unit" = /255 only (reconstruction — the AE skips normalization,
    ``reconstruction/src/train.py:256-266``).
    """
    if image.dtype != jnp.uint8:
        return image
    img = image.astype(jnp.float32) / 255.0
    if mode == "imagenet":
        img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    elif mode != "unit":
        raise ValueError(f"unknown normalize mode: {mode!r}")
    return img
