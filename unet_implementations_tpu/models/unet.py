"""One parametric Flax UNet covering all four reference model variants.

The reference copy-pastes four nearly identical UNets
(``Our_UNet/models/unet.py:233-432``, ``CLIP_UNet/models/unet.py:234-492``,
``AE_pretrained/reconstruction/models/autoencoder.py:236-466``,
``AE_pretrained/transfer_learning/models/unet.py``). Here a single module
parameterizes the differences:

- ``head='segmentation'`` → final 1×1 conv to ``num_classes`` logits.
- ``head='reconstruction'`` → final 3×3 conv to 3 channels + sigmoid (the
  autoencoder head, ``autoencoder.py:376-387``) — note the AE keeps the skip
  connections, so it really is the same topology.
- ``clip_fusion=True`` → at the bottleneck, broadcast a global (B, clip_dim)
  CLIP embedding over the spatial grid, concat, and fuse with a statically
  sized 1×1 conv + InstanceNorm + LeakyReLU. The reference "interpolates" a
  (B, 512, 1, 1) map bilinearly to 16² — that is exactly a broadcast
  (``CLIP_UNet/models/unet.py:599-613``) — and lazily rebuilds the fusion conv
  on channel mismatch (``:459-474``), a quirk designed away here.
- The transfer variant is this module with the encoder params grafted from an
  AE checkpoint and frozen via an optax mask (see ``training/transfer.py``),
  not a separate class.

Encoder stages are named ``encoder_{i}`` and decoders ``decoder_{i}`` so the
AE→UNet encoder sub-tree transfer (reference
``transfer_learning/models/unet.py:409-453``) is a plain PyTree sub-tree copy.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_implementations_tpu.models.blocks import ConvBlock, InstanceNorm, UpBlock

# Default 6-stage configuration actually trained by the reference
# (Our_UNet/src/train.py:776-795; the 8-stage create_model is dead code).
DEFAULT_FEATURES: Tuple[int, ...] = (32, 64, 128, 256, 512, 512)
DEFAULT_STRIDES: Tuple[int, ...] = (1, 2, 2, 2, 2, 2)
DEFAULT_ENC_DROPOUT: Tuple[float, ...] = (0.0, 0.0, 0.1, 0.2, 0.3, 0.3)
DEFAULT_DEC_DROPOUT: Tuple[float, ...] = (0.3, 0.2, 0.2, 0.1, 0.0)
# The AE trainer lowers the dropout schedule (reconstruction/src/train.py:367-368).
AE_ENC_DROPOUT: Tuple[float, ...] = (0.0, 0.0, 0.05, 0.1, 0.15, 0.15)
AE_DEC_DROPOUT: Tuple[float, ...] = (0.15, 0.1, 0.1, 0.05, 0.0)


class UNet(nn.Module):
    num_classes: int = 3
    features_per_stage: Sequence[int] = DEFAULT_FEATURES
    strides: Sequence[int] = DEFAULT_STRIDES
    kernel_size: int = 3
    n_conv_per_stage: int = 2
    n_conv_per_stage_decoder: int = 2
    encoder_dropout_rates: Sequence[float] = DEFAULT_ENC_DROPOUT
    decoder_dropout_rates: Sequence[float] = DEFAULT_DEC_DROPOUT
    head: str = "segmentation"  # or "reconstruction"
    clip_fusion: bool = False
    clip_dim: int = 512
    dtype: Any = jnp.float32
    # Execute the full-resolution level (encoder_0, decoder_{n-2}, head) in
    # space-to-depth layout — numerically exact, ~4x better MXU utilization
    # for the low-channel 512² convs (models/s2d.py). Auto-disabled for odd
    # spatial sizes or a strided first stage.
    s2d_level0: bool = True
    # Run sub-128-channel DENSE decoder levels in s2d space too (s2d skip →
    # s2d block → depth-to-space out): MAC-neutral there (the dense level's
    # lane padding already wastes the same 4x), the upsample folds into the
    # first conv (models/s2d.py::conv_up_fold), and the dense lerp+interleave
    # HBM machinery disappears. For the 6-stage net this is decoder_3 (64ch).
    s2d_low_channel_decoders: bool = True
    # Rematerialize (jax.checkpoint) each Conv/Up block under grad: only
    # block outputs are saved for the backward pass, in-block intermediates
    # (norm/activation tensors) recompute. Numerically exact. Halves the
    # activation footprint so larger per-chip train batches fit (b32 is the
    # single-chip ceiling without it at 512²).
    remat: bool = False

    @property
    def n_stages(self) -> int:
        return len(self.features_per_stage)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        clip_features: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_bottleneck: bool = False,
    ):
        """Forward pass. ``x`` is NHWC; returns NHWC logits (or [0,1] recon).

        ``clip_features`` is a (B, clip_dim) global embedding; fusion is
        skipped when it is None, matching the reference default-None path
        (the published CLIP eval ran without features —
        ``CLIP_UNet/src/evaluate.py`` calls ``model(images)``).
        """
        n = self.n_stages
        x = x.astype(self.dtype)

        ConvBlockM = (
            nn.remat(ConvBlock, prevent_cse=False, static_argnums=(2,))
            if self.remat else ConvBlock
        )
        UpBlockM = (
            nn.remat(UpBlock, prevent_cse=False, static_argnums=(3,))
            if self.remat else UpBlock
        )

        use_s2d = (
            self.s2d_level0
            and self.strides[0] == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )

        skips = []
        for i in range(n - 1):
            s2d_stage = use_s2d and i == 0
            # encoder_1 can consume the s2d skip directly via a transformed
            # stride-2 conv — avoids a depth-to-space pass (measured 7ms/b32).
            s2d_feed = (
                use_s2d and i == 1 and self.strides[1] == 2 and self.kernel_size == 3
            )
            if s2d_stage:
                from unet_implementations_tpu.models.s2d import (
                    depth_to_space,
                    space_to_depth,
                )

                x = space_to_depth(x)
            x = ConvBlockM(
                features=self.features_per_stage[i],
                kernel_size=self.kernel_size,
                stride=self.strides[i],
                n_convs=self.n_conv_per_stage,
                dropout_rate=self.encoder_dropout_rates[i],
                dtype=self.dtype,
                s2d=s2d_stage,
                s2d_input_first=s2d_feed,
                name=f"encoder_{i}",
            )(x, deterministic)
            skips.append(x)  # skip 0 stays in s2d layout for decoder_{n-2}
            if s2d_stage and not (
                n > 2 and self.strides[1] == 2 and self.kernel_size == 3
            ):
                x = depth_to_space(x)  # dense for a non-transformable stage 1

        # Bottleneck stage (no skip).
        x = ConvBlockM(
            features=self.features_per_stage[n - 1],
            kernel_size=self.kernel_size,
            stride=self.strides[n - 1],
            n_convs=self.n_conv_per_stage,
            dropout_rate=self.encoder_dropout_rates[n - 1],
            dtype=self.dtype,
            name=f"encoder_{n - 1}",
        )(x, deterministic)

        if self.clip_fusion and clip_features is not None:
            cf = clip_features.astype(self.dtype)[:, None, None, :]
            cf = jnp.broadcast_to(
                cf, (x.shape[0], x.shape[1], x.shape[2], self.clip_dim)
            )
            x = jnp.concatenate([x, cf], axis=-1)
            x = nn.Conv(
                self.features_per_stage[n - 1],
                (1, 1),
                use_bias=True,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="clip_fusion_conv",
            )(x)
            x = InstanceNorm(dtype=self.dtype, name="clip_fusion_norm")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)

        bottleneck = x

        # Decoder: stage d consumes skip n-2-d (reverse order).
        for d in range(n - 1):
            skip_idx = n - 2 - d
            s2d_stage = use_s2d and skip_idx == 0
            skip = skips[skip_idx]
            feats = self.features_per_stage[skip_idx]
            # Low-channel dense levels run in s2d space (see field doc).
            # Param names/shapes are unchanged (canonical kernels), so the
            # mode is checkpoint-independent like s2d_level0.
            s2d_wrap = (
                self.s2d_low_channel_decoders
                and not s2d_stage
                and feats < 128
                and (4 * feats) % 128 == 0
                and self.kernel_size == 3
                and skip.shape[1] == 2 * x.shape[1]
                and skip.shape[2] == 2 * x.shape[2]
                and skip.shape[1] % 2 == 0
                and skip.shape[2] % 2 == 0
            )
            if s2d_wrap:
                from unet_implementations_tpu.models.s2d import (
                    depth_to_space,
                    space_to_depth,
                )

                skip = space_to_depth(skip)
            x = UpBlockM(
                features=feats,
                kernel_size=self.kernel_size,
                n_convs=self.n_conv_per_stage_decoder,
                dropout_rate=self.decoder_dropout_rates[d],
                dtype=self.dtype,
                s2d=s2d_stage or s2d_wrap,
                name=f"decoder_{d}",
            )(x, skip, deterministic)
            if s2d_wrap:
                x = depth_to_space(x)

        from unet_implementations_tpu.models.blocks import ConvOp

        head_k = 3 if self.head == "reconstruction" else 1
        head_f = 3 if self.head == "reconstruction" else self.num_classes
        x = ConvOp(
            features=head_f,
            kernel_size=head_k,
            stride=1,
            dtype=self.dtype,
            s2d=use_s2d,
            name="head",
        )(x)
        if use_s2d:
            from unet_implementations_tpu.models.s2d import depth_to_space

            x = depth_to_space(x)
        if self.head == "reconstruction":
            out = nn.sigmoid(x.astype(jnp.float32))
        else:
            out = x.astype(jnp.float32)

        if return_bottleneck:
            return out, bottleneck.reshape(bottleneck.shape[0], -1)
        return out


def unet_6stage(dtype: Any = jnp.float32, clip_fusion: bool = False) -> UNet:
    """The 6-stage segmentation UNet the reference actually trains."""
    return UNet(dtype=dtype, clip_fusion=clip_fusion)


def autoencoder_6stage(dtype: Any = jnp.float32) -> UNet:
    """The reconstruction autoencoder: same topology, sigmoid head, low dropout."""
    return UNet(
        head="reconstruction",
        encoder_dropout_rates=AE_ENC_DROPOUT,
        decoder_dropout_rates=AE_DEC_DROPOUT,
        dtype=dtype,
    )


def encoder_param_names(n_stages: int = 6) -> Tuple[str, ...]:
    """Top-level param-tree keys forming the transferable encoder sub-tree."""
    return tuple(f"encoder_{i}" for i in range(n_stages))
