"""UNet building blocks as Flax modules (NHWC, bf16-friendly).

TPU-first re-expressions of the reference blocks
(``Our_UNet/models/unet.py:13-231``):

- ``SpatialDropout2d`` → ``flax.linen.Dropout(broadcast_dims=(1, 2))``: the
  Bernoulli mask has shape (B, 1, 1, C) in NHWC, i.e. whole channels drop,
  scaled by 1/(1-p) — identical semantics without a custom module.
- ``InstanceNorm2d(eps=1e-5, affine=True)`` → per-image spatial mean/var with
  float32 accumulation regardless of the activation dtype (naive bf16 means
  over 512² pixels drift — SURVEY §7.3), biased variance like torch.
- ``ConvBlock`` — n_convs × [Conv(k=3, explicit k//2 padding, stride only on
  the first conv, bias) → InstanceNorm → LeakyReLU(0.01) → channel dropout].
  Explicit (1, 1) padding (not XLA SAME) so stride-2 downsamples pick the same
  pixels as torch's symmetric-padding floor-division convs.
- Kaiming-normal fan_out init with sqrt(2) gain, zero bias, IN scale=1/bias=0
  (reference ``initialize_weights``, ``unet.py:386-397``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(mode='fan_out', nonlinearity='leaky_relu') with the
# default a=0 gives gain²=2 → variance_scaling(2.0, fan_out, normal).
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class InstanceNorm(nn.Module):
    """Per-image, per-channel normalization over spatial dims, f32 stats."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class ConvBlock(nn.Module):
    """n_convs × [Conv → InstanceNorm → LeakyReLU → spatial dropout]."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    n_convs: int = 2
    dropout_rate: float = 0.0
    negative_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        k = self.kernel_size
        pad = k // 2
        for i in range(self.n_convs):
            stride = self.stride if i == 0 else 1
            x = nn.Conv(
                self.features,
                (k, k),
                strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=True,
                kernel_init=kaiming_fan_out,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(x)
            x = InstanceNorm(dtype=self.dtype, name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
            if self.dropout_rate > 0:
                x = nn.Dropout(
                    rate=self.dropout_rate,
                    broadcast_dims=(1, 2),
                    name=f"dropout_{i}",
                )(x, deterministic=deterministic)
        return x


class UpBlock(nn.Module):
    """Bilinear upsample to the skip's spatial size, concat, ConvBlock.

    Reference: ``Our_UNet/models/unet.py:143-231`` (align_corners=False).
    """

    features: int
    kernel_size: int = 3
    n_convs: int = 2
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        from unet_implementations_tpu.ops.resize import resize_bilinear, upsample2x_nhwc

        if x.shape[1:3] != skip.shape[1:3]:
            if (skip.shape[1], skip.shape[2]) == (2 * x.shape[1], 2 * x.shape[2]):
                x = upsample2x_nhwc(x)  # fused fast path, exact same values
            else:
                x = resize_bilinear(x, skip.shape[1:3], spatial_axes=(1, 2))
        x = jnp.concatenate([x.astype(self.dtype), skip.astype(self.dtype)], axis=-1)
        return ConvBlock(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=1,
            n_convs=self.n_convs,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="conv_block",
        )(x, deterministic=deterministic)
