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

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_implementations_tpu.ops.quant import qconv

# torch kaiming_normal_(mode='fan_out', nonlinearity='leaky_relu') with the
# default a=0 gives gain²=2 → variance_scaling(2.0, fan_out, normal).
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class InstanceNorm(nn.Module):
    """Per-image, per-channel normalization over spatial dims, f32 stats.

    With ``s2d=True`` the input is a space-to-depth tensor (q-major layout)
    and statistics pool each original channel's 4 sub-pixels — numerically
    identical to dense InstanceNorm on the full-resolution tensor.
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32
    s2d: bool = False
    # When set, LeakyReLU with this slope is fused into the norm via the
    # Pallas two-pass kernel (kernels/instance_norm.py) — one bf16 stats
    # read + one normalize read/write instead of XLA's f32 materialization.
    fused_negative_slope: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        if return_params:
            # Param-extraction mode for the fused whole-region tail
            # (kernels/s2d_region.py): create the EXACT same params (same
            # scope path, name, shape — checkpoint-independent dispatch)
            # and return them instead of computing.
            group = 4 if self.s2d else 1
            c = x.shape[-1] // group
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            return scale, bias
        if self.fused_negative_slope is not None:
            from unet_implementations_tpu.kernels.instance_norm import (
                fused_instance_norm,
            )

            group = 4 if self.s2d else 1
            c = x.shape[-1] // group
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            return fused_instance_norm(
                x, scale, bias, self.eps, self.fused_negative_slope, group
            ).astype(self.dtype)
        if self.s2d:
            from unet_implementations_tpu.models.s2d import instance_norm_s2d

            c = x.shape[-1] // 4
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            return instance_norm_s2d(x, scale, bias, self.eps, out_dtype=self.dtype)
        xf = x.astype(jnp.float32)
        # Single-pass statistics (E[x²] − E[x]²): both reductions fuse into
        # ONE read of the activation, vs jnp.var's mean-then-squared-dev
        # second pass — worth ~13% of full-model latency at 512² (measured).
        # f32 accumulators; biased variance like torch InstanceNorm2d.
        n = x.shape[1] * x.shape[2]
        s1 = jnp.sum(xf, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(xf * xf, axis=(1, 2), keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class ConvOp(nn.Module):
    """Conv2d with canonical (k, k, Cin, Cout) params, dispatchable to the
    space-to-depth execution path. Param names/shapes match ``nn.Conv``
    exactly (``kernel``/``bias``), so checkpoints are mode-independent."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    s2d: bool = False            # s2d in → s2d out (stride 1)
    s2d_input: bool = False      # s2d in → DENSE half-res out (stride 2, k=3)
    # Dense channel counts when the s2d input is a channel-concat of
    # independently rearranged tensors (q-major layout; see models/s2d.py).
    s2d_segments: Optional[Tuple[int, ...]] = None
    # Segment 0 of the tuple input is the PRE-upsample dense tensor; the 2x
    # bilinear upsample is folded into its kernel (models/s2d.py::
    # conv_up_fold) instead of being materialized.
    s2d_up_fold: bool = False
    # Dense-level variant of the same fold: segment 0 is pre-upsample, the
    # conv output stays DENSE at the fine grid (models/s2d.py::
    # conv_dense_up_fold). Requires k=3 and exact-2x geometry.
    dense_up_fold: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        k = self.kernel_size
        if isinstance(x, (tuple, list)):
            # Segmented input: a logical channel-concat passed unmerged so the
            # conv can split over segments — ``conv(concat(xs), K) ==
            # Σ conv(x_i, K_i)`` — and the concat (the model's largest
            # tensor at the decoder levels) is never materialized.
            if self.s2d:
                assert self.s2d_segments is not None
                cin = sum(self.s2d_segments)
            else:
                cin = sum(xi.shape[-1] for xi in x)
        else:
            cin = x.shape[-1] // (4 if (self.s2d or self.s2d_input) else 1)
        kernel = self.param(
            "kernel", kaiming_fan_out, (k, k, cin, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if return_params:
            # See InstanceNorm.__call__(return_params=True): identical param
            # creation (canonical kernel layout), no compute.
            return kernel, bias
        if isinstance(x, (tuple, list)):
            if self.s2d and self.s2d_up_fold:
                from unet_implementations_tpu.models.s2d import (
                    conv_s2d_multi_up_fold,
                )

                return conv_s2d_multi_up_fold(
                    x[0].astype(self.dtype),
                    [xi.astype(self.dtype) for xi in x[1:]],
                    kernel.astype(self.dtype), bias.astype(self.dtype),
                    self.s2d_segments,
                )
            if self.s2d:
                from unet_implementations_tpu.models.s2d import conv_s2d_multi

                return conv_s2d_multi(
                    [xi.astype(self.dtype) for xi in x],
                    kernel.astype(self.dtype), bias.astype(self.dtype),
                    self.s2d_segments,
                )
            assert self.stride == 1, "segmented input supports stride-1 only"
            if self.dense_up_fold:
                from unet_implementations_tpu.models.s2d import (
                    conv_dense_up_fold,
                )

                assert k == 3, "dense up-fold requires a 3x3 kernel"
                return conv_dense_up_fold(
                    x[0].astype(self.dtype),
                    [xi.astype(self.dtype) for xi in x[1:]],
                    kernel.astype(self.dtype), bias.astype(self.dtype),
                )
            pad = k // 2
            y, base = None, 0
            for xi in x:
                cs = xi.shape[-1]
                yi = qconv(
                    xi.astype(self.dtype),
                    kernel[:, :, base:base + cs, :].astype(self.dtype),
                    (1, 1), [(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = yi if y is None else y + yi
                base += cs
            return y + bias.astype(y.dtype)
        if self.s2d_input:
            from unet_implementations_tpu.models.s2d import conv_s2d_to_dense_stride2

            assert self.stride == 2 and k == 3, "s2d_input requires stride-2 3x3"
            return conv_s2d_to_dense_stride2(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias.astype(self.dtype),
            )
        if self.s2d:
            from unet_implementations_tpu.models.s2d import conv_s2d

            assert self.stride == 1, "s2d path supports stride-1 convs only"
            return conv_s2d(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias.astype(self.dtype), in_segments=self.s2d_segments,
            )
        pad = k // 2
        y = qconv(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class ConvBlock(nn.Module):
    """n_convs × [Conv → InstanceNorm → LeakyReLU → spatial dropout].

    ``s2d=True`` runs the whole block in space-to-depth layout (input must
    already be s2d, stride must be 1) — exact same numbers, far better MXU
    utilization for low-channel full-resolution stages (see models/s2d.py).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    n_convs: int = 2
    dropout_rate: float = 0.0
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    s2d: bool = False
    s2d_input_first: bool = False  # conv_0 consumes an s2d tensor (stride 2)
    # conv_0's s2d input is a concat of independently rearranged tensors
    # (dense channel counts per segment; q-major layout — models/s2d.py).
    s2d_segments_first: Optional[Tuple[int, ...]] = None
    # conv_0's segment 0 is pre-upsample dense; fold the 2x upsample into
    # its kernel (see ConvOp.s2d_up_fold).
    s2d_up_fold_first: bool = False
    # Dense-level fold: conv_0's segment 0 is pre-upsample, output dense at
    # the fine grid (see ConvOp.dense_up_fold).
    dense_up_fold_first: bool = False
    # Pallas-fused InstanceNorm+LeakyReLU (kernels/instance_norm.py). OFF by
    # default: measured end-to-end it LOSES to XLA (99.9ms → 139.8ms @512²
    # b32) because the custom call breaks producer/consumer fusion with the
    # surrounding convs — XLA fuses the stats read into the conv epilogue.
    # Kept for standalone-norm use cases and as the counter-example.
    fuse_norm_act: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        use_region = False
        if self.s2d and self.n_convs == 2 and deterministic:
            from unet_implementations_tpu.kernels.s2d_region import (
                s2d_region_enabled,
            )

            use_region = s2d_region_enabled()
        if use_region:
            # Whole-region fused tail (kernels/s2d_region.py): conv_0 runs on
            # its existing path (segmented/folded dispatch intact), then
            # [IN -> lrelu -> conv_1 -> IN -> lrelu] executes as ONE Pallas
            # program with the image resident in VMEM. Inference-only
            # (trace-time dispatch on ``deterministic``, like the dense-fold
            # policy); dropout is inactive in this mode and both level-0
            # block rates are 0.0 anyway. Params are created through the
            # same submodules (return_params) — same tree, any checkpoint.
            from unet_implementations_tpu.kernels.s2d_region import (
                fused_s2d_tail,
                region_applicable,
            )

            x = ConvOp(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dtype=self.dtype,
                s2d=True,
                s2d_segments=self.s2d_segments_first,
                s2d_up_fold=self.s2d_up_fold_first,
                name="conv_0",
            )(x)
            scale1, bias1 = InstanceNorm(
                dtype=self.dtype, s2d=True, name="norm_0"
            )(x, return_params=True)
            kernel2, _bias2 = ConvOp(
                features=self.features, kernel_size=self.kernel_size,
                dtype=self.dtype, s2d=True, name="conv_1",
            )(x, return_params=True)
            scale2, bias2 = InstanceNorm(
                dtype=self.dtype, s2d=True, name="norm_1"
            )(x, return_params=True)
            if self.kernel_size == 3 and region_applicable(x.shape, x.dtype):
                return fused_s2d_tail(
                    x, scale1, bias1, kernel2.astype(self.dtype),
                    scale2, bias2, negative_slope=self.negative_slope,
                )
            # Shape not kernel-eligible: fall through to the module path —
            # params already exist with identical names, so re-entering the
            # loop below reuses them.
            from unet_implementations_tpu.kernels.s2d_region import jnp_tail

            return jnp_tail(
                x, scale1, bias1, kernel2.astype(self.dtype), scale2, bias2,
                neg=self.negative_slope,
            )
        for i in range(self.n_convs):
            stride = self.stride if i == 0 else 1
            x = ConvOp(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=stride,
                dtype=self.dtype,
                s2d=self.s2d,
                s2d_input=self.s2d_input_first and i == 0,
                s2d_segments=self.s2d_segments_first if i == 0 else None,
                s2d_up_fold=self.s2d_up_fold_first and i == 0,
                dense_up_fold=self.dense_up_fold_first and i == 0,
                name=f"conv_{i}",
            )(x)
            x = InstanceNorm(
                dtype=self.dtype,
                s2d=self.s2d,
                fused_negative_slope=self.negative_slope if self.fuse_norm_act else None,
                name=f"norm_{i}",
            )(x)
            if not self.fuse_norm_act:
                x = nn.leaky_relu(x, negative_slope=self.negative_slope)
            if self.dropout_rate > 0:
                if self.s2d:
                    # q-major: sub-pixel axis is the 4th — whole ORIGINAL
                    # channels drop (mask broadcast over space + sub-pixels).
                    b, hp, wp, cf = x.shape
                    xr = x.reshape(b, hp, wp, 4, cf // 4)
                    xr = nn.Dropout(
                        rate=self.dropout_rate,
                        broadcast_dims=(1, 2, 3),
                        name=f"dropout_{i}",
                    )(xr, deterministic=deterministic)
                    x = xr.reshape(b, hp, wp, cf)
                else:
                    x = nn.Dropout(
                        rate=self.dropout_rate,
                        broadcast_dims=(1, 2),
                        name=f"dropout_{i}",
                    )(x, deterministic=deterministic)
        return x


class UpBlock(nn.Module):
    """Bilinear upsample to the skip's spatial size, concat, ConvBlock.

    Reference: ``Our_UNet/models/unet.py:143-231`` (align_corners=False).

    ``s2d=True``: ``skip`` is an s2d tensor at the SAME array shape scale
    (spatially half, 4x channels); the 2x upsample is emitted directly into
    s2d layout and the conv block runs in s2d space — exact numerics.
    """

    features: int
    kernel_size: int = 3
    n_convs: int = 2
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        from unet_implementations_tpu.ops.resize import resize_bilinear

        segments = None
        up_fold = False
        dense_fold = False
        if self.s2d:
            from unet_implementations_tpu.models.s2d import up_fold_enabled

            assert skip.shape[1:3] == x.shape[1:3], "s2d skip must match spatially"
            # q-major layout: the logical channel-concat of the upsampled
            # tensor and the skip is passed UNMERGED (a tuple) — the first
            # conv splits over the segments, so the model's largest tensor
            # (the decoder concat) is never materialized.
            segments = (x.shape[-1], skip.shape[-1] // 4)
            # conv_up_fold's border-strip recompute needs >= 3 coarse
            # rows/cols (same guard as the dense branch below).
            up_fold = up_fold_enabled() and x.shape[1] >= 3 and x.shape[2] >= 3
            if up_fold:
                # The 2x upsample folds into the conv kernel entirely
                # (models/s2d.py::conv_up_fold) — pass x pre-upsample.
                x = (x.astype(self.dtype), skip.astype(self.dtype))
            else:
                from unet_implementations_tpu.kernels.upsample import (
                    upsample2x_into_s2d_fast,
                )

                x = (upsample2x_into_s2d_fast(x.astype(self.dtype)),
                     skip.astype(self.dtype))
        else:
            if x.shape[1:3] != skip.shape[1:3]:
                if (skip.shape[1], skip.shape[2]) == (2 * x.shape[1], 2 * x.shape[2]):
                    from unet_implementations_tpu.models.s2d import (
                        dense_up_fold_enabled,
                    )

                    # Fold the upsample into conv_0 (models/s2d.py::
                    # conv_dense_up_fold) — no lerp machinery, MAC-neutral.
                    # Per-mode: inference-only by default (the fold's d2s
                    # transpose-gradient regresses the train step, see
                    # dense_up_fold_enabled). Trace-time resolution: train
                    # and eval are separate jits, each sees its own policy.
                    # The border-strip recompute needs ≥ 3 coarse rows/cols.
                    dense_fold = (
                        dense_up_fold_enabled(deterministic)
                        and self.kernel_size == 3
                        and x.shape[1] >= 3
                        and x.shape[2] >= 3
                    )
                    if not dense_fold:
                        # One-pass Pallas kernel on TPU (kernels/upsample.py),
                        # identical values; jnp fused path elsewhere.
                        from unet_implementations_tpu.kernels.upsample import (
                            upsample2x_nhwc_fast,
                        )

                        x = upsample2x_nhwc_fast(x)
                else:
                    x = resize_bilinear(x, skip.shape[1:3], spatial_axes=(1, 2))
            # Logical concat passed unmerged — the first conv splits over the
            # two operands instead of materializing the concatenated tensor.
            x = (x.astype(self.dtype), skip.astype(self.dtype))
        return ConvBlock(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=1,
            n_convs=self.n_convs,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            s2d=self.s2d,
            s2d_segments_first=segments,
            s2d_up_fold_first=up_fold,
            dense_up_fold_first=dense_fold,
            name="conv_block",
        )(x, deterministic=deterministic)
