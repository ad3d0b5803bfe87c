"""Space-to-depth execution of the 512² resolution level — exact numerics.

Measured on TPU v5e (batch 32, bf16): the low-channel full-resolution convs
run far below MXU efficiency because output channels pad to the 128-wide
lane dimension —

    conv 512² 32→32   : 21.1 ms  (7 TF/s)     s2d: 256² 128→128 : 10.8 ms
    conv 512² 96→32   : 29.6 ms  (16 TF/s)    s2d: 256² 384→128 : 24.7 ms

A stride-1 k×k convolution commutes exactly with space-to-depth: rearrange
(B, 2i+dy, 2j+dx, c) → (B, i, j, c*4 + dy*2 + dx) and the conv becomes a
k×k conv over the rearranged tensor whose (4Cin, 4Cout) kernel is the
original kernel scattered into a fixed zero pattern (25% density). We spend
4× the MACs but at ~4-8× better MXU utilization — and the numerics are
IDENTICAL (the extra MACs multiply structural zeros).

Channel layout is c-major (ch = c*4 + q, q = dy*2+dx) so that concatenating
two s2d tensors equals s2d of the concatenation — which is what the decoder
skip-concat needs.

Used by ``models.blocks.ConvBlock(s2d=True)`` for the UNet's stage-0 /
decoder-4 / head level (see ``models/unet.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, factor: int = 2) -> jax.Array:
    """(B, H, W, C) → (B, H/f, W/f, C*f²), c-major channel layout."""
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H', W', C, fy, fx)
    return x.reshape(b, h // f, w // f, c * f * f)


def depth_to_space(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of ``space_to_depth`` (c-major layout)."""
    b, hp, wp, cf = x.shape
    f = factor
    c = cf // (f * f)
    x = x.reshape(b, hp, wp, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H', fy, W', fx, C)
    return x.reshape(b, hp * f, wp * f, c)


def _s2d_kernel_pattern(k: int) -> np.ndarray:
    """Static scatter pattern: entries (by, bx, ry, rx, oy, ox, ky, kx).

    For output sub-pixel (oy, ox) and original tap (ky, kx), the source row
    is n = oy + ky - (k//2); decomposed as n = 2*by + ry the tap lands at
    block offset by ∈ {-1, 0, 1} and input sub-pixel ry.
    """
    pad = k // 2
    entries = []
    for oy in range(2):
        for ox in range(2):
            for ky in range(k):
                for kx in range(k):
                    ny, nx = oy + ky - pad, ox + kx - pad
                    by, ry = ny // 2, ny % 2
                    bx, rx = nx // 2, nx % 2
                    entries.append((by, bx, ry, rx, oy, ox, ky, kx))
    return np.asarray(entries, np.int32)


def transform_kernel(kernel: jax.Array) -> jax.Array:
    """(k, k, Cin, Cout) → (K', K', 4Cin, 4Cout) s2d-equivalent kernel.

    K' = number of distinct block offsets (3 for k=3, 1 for k=1). The scatter
    runs at trace time over ≤ 4k² static entries — negligible per step.
    """
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    entries = _s2d_kernel_pattern(k)
    b_lo = int(entries[:, :2].min())
    b_hi = int(entries[:, :2].max())
    kp = b_hi - b_lo + 1
    out = jnp.zeros((kp, kp, 4 * cin, 4 * cout), kernel.dtype)
    for by, bx, ry, rx, oy, ox, ky, kx in entries:
        qin = ry * 2 + rx
        qout = oy * 2 + ox
        # c-major layout: channel = c*4 + q
        out = out.at[
            by - b_lo, bx - b_lo, qin::4, qout::4
        ].set(kernel[ky, kx])
    return out


def transform_kernel_stride2(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) stride-2 kernel → (2, 2, 4Cin, Cout) dense-output.

    A stride-2 3×3 conv consumed from an s2d tensor: output pixel (i, j)
    needs rows n = ky - 1 ∈ {-1, 0, 1} = 2*by + ry with by ∈ {-1, 0} —
    a 2×2 conv over blocks with padding (1, 0). Output is DENSE at the
    half resolution (exactly the downsampled stage's grid). Measured: 9.7ms
    vs 16.7ms for depth-to-space + dense stride-2 conv (B=32, 512²→256²).
    """
    assert kernel.shape[0] == 3 and kernel.shape[1] == 3
    cin, cout = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((2, 2, 4 * cin, cout), kernel.dtype)
    for ky in range(3):
        for kx in range(3):
            ny, nx = ky - 1, kx - 1
            by, ry = ny // 2, ny % 2
            bx, rx = nx // 2, nx % 2
            qin = ry * 2 + rx
            out = out.at[by + 1, bx + 1, qin::4, :].set(kernel[ky, kx])
    return out


def conv_s2d_to_dense_stride2(
    x: jax.Array, kernel: jax.Array, bias: jax.Array
) -> jax.Array:
    """Stride-2 3×3 conv taking an s2d input, emitting a DENSE half-res map."""
    kt = transform_kernel_stride2(kernel)
    y = jax.lax.conv_general_dilated(
        x, kt, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def s2d_bias(bias: jax.Array) -> jax.Array:
    """(Cout,) → (4Cout,) in c-major layout."""
    return jnp.repeat(bias, 4)


def conv_s2d(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Stride-1 same-padded conv over an s2d tensor, exact vs. the dense conv.

    ``kernel`` is the CANONICAL (k, k, Cin, Cout) kernel; transformed here.
    """
    kt = transform_kernel(kernel)
    pad = kt.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, kt, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + s2d_bias(bias).astype(y.dtype)


def instance_norm_s2d(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5,
    out_dtype=None,
) -> jax.Array:
    """InstanceNorm over an s2d tensor with per-ORIGINAL-channel statistics.

    Channel c's statistics pool over all 4 sub-pixels — identical to dense
    InstanceNorm over the full-resolution tensor. f32 single-pass stats.
    """
    b, hp, wp, cf = x.shape
    c = cf // 4
    xf = x.astype(jnp.float32).reshape(b, hp, wp, c, 4)
    n = hp * wp * 4
    s1 = jnp.sum(xf, axis=(1, 2, 4), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 2, 4), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale[None, None, None, :, None] + bias[None, None, None, :, None]
    out_dtype = out_dtype or x.dtype
    return y.reshape(b, hp, wp, cf).astype(out_dtype)


def upsample2x_into_s2d(x: jax.Array) -> jax.Array:
    """Exact 2x bilinear upsample emitted directly in s2d layout.

    Input (B, H, W, C) dense → output (B, H, W, 4C) = s2d(upsample2x(x)).
    Each sub-pixel is a fixed 2-tap lerp of edge-padded shifts (same math as
    ``ops.resize.upsample2x_nhwc``), with no interleave materialization.
    """
    def taps(arr, axis):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (1, 1)
        p = jnp.pad(arr, pad, mode="edge")
        n = arr.shape[axis]

        def sl(s):
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(s, s + n)
            return p[tuple(idx)]

        c25 = jnp.asarray(0.25, arr.dtype)
        c75 = jnp.asarray(0.75, arr.dtype)
        r0 = c25 * sl(0) + c75 * sl(1)   # sub-pixel 0
        r1 = c75 * sl(1) + c25 * sl(2)   # sub-pixel 1
        return r0, r1

    row0, row1 = taps(x, 1)
    out = []
    for ry, rows in ((0, row0), (1, row1)):
        col0, col1 = taps(rows, 2)
        out.append((ry, 0, col0))
        out.append((ry, 1, col1))
    # stack in c-major order: channel = c*4 + ry*2 + rx
    b, h, w, c = x.shape
    stacked = jnp.stack([t for _, _, t in sorted(out, key=lambda e: (e[0], e[1]))],
                        axis=-1)  # (B,H,W,C,4) with q order (0,0),(0,1),(1,0),(1,1)
    return stacked.reshape(b, h, w, c * 4)
