"""Space-to-depth execution of the 512² resolution level — exact numerics.

Measured on TPU v5e (batch 32, bf16): the low-channel full-resolution convs
run far below MXU efficiency because output channels pad to the 128-wide
lane dimension —

    conv 512² 32→32   : 21.1 ms  (7 TF/s)     s2d: 256² 128→128 : 10.8 ms
    conv 512² 96→32   : 29.6 ms  (16 TF/s)    s2d: 256² 384→128 : 24.7 ms

A stride-1 k×k convolution commutes exactly with space-to-depth: rearrange
(B, 2i+dy, 2j+dx, c) → (B, i, j, q-major channel) and the conv becomes a
k×k conv over the rearranged tensor whose (4Cin, 4Cout) kernel is the
original kernel scattered into a fixed zero pattern (25% density). We spend
4× the MACs but at ~4-8× better MXU utilization — and the numerics are
IDENTICAL (the extra MACs multiply structural zeros).

Channel layout is **q-major** (ch = q*C + c, q = dy*2 + dx): each sub-pixel's
channels are one contiguous block. Chosen because the decoder's
2x-upsample-into-s2d is then a plain channel ``concatenate`` of the four
sub-pixel lerps — XLA lowers that to pure addressing. (The c-major
alternative interleaves via a 5-D stack+reshape, which XLA lowers to
pad+maximum fusions materializing multi-GB temporaries — measured 8 GB of
HLO temps for decoder_4 alone at batch 192.) The price of q-major is that
concatenating two s2d tensors is no longer s2d of the concatenation; the
kernel transform instead takes the dense-channel ``in_segments`` so a conv
can consume a channel-concat of independently-rearranged tensors directly.

Used by ``models.blocks.ConvBlock(s2d=True)`` for the UNet's stage-0 /
decoder-4 / head level (see ``models/unet.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.ops.quant import qconv


def space_to_depth(x: jax.Array, factor: int = 2) -> jax.Array:
    """(B, H, W, C) → (B, H/f, W/f, f²*C), q-major channel layout."""
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H', W', fy, fx, C)
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of ``space_to_depth`` (q-major layout)."""
    b, hp, wp, cf = x.shape
    f = factor
    c = cf // (f * f)
    x = x.reshape(b, hp, wp, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H', fy, W', fx, C)
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


def transform_kernel(
    kernel: jax.Array, in_segments: Optional[Sequence[int]] = None
) -> jax.Array:
    """(k, k, Cin, Cout) → (K', K', 4Cin, 4Cout) s2d-equivalent kernel.

    K' = number of distinct block offsets (3 for k=3, 1 for k=1). The scatter
    runs at trace time over ≤ 4k² static entries — negligible per step.

    ``in_segments`` (dense channel counts summing to Cin) describes an input
    that is a channel-concat of independently s2d-rearranged tensors: the
    s2d channel index of (segment s, sub-pixel q, local channel c) is
    ``4*sum(segments[:s]) + q*segments[s] + c``. Default: one segment.
    """
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    segments = tuple(in_segments) if in_segments is not None else (cin,)
    assert sum(segments) == cin, (segments, cin)
    entries = _s2d_kernel_pattern(k)
    b_lo = int(entries[:, :2].min())
    b_hi = int(entries[:, :2].max())
    kp = b_hi - b_lo + 1
    out = jnp.zeros((kp, kp, 4 * cin, 4 * cout), kernel.dtype)
    for by, bx, ry, rx, oy, ox, ky, kx in entries:
        qin = ry * 2 + rx
        qout = oy * 2 + ox
        base = 0
        for cs in segments:
            out = out.at[
                by - b_lo, bx - b_lo,
                4 * base + qin * cs: 4 * base + (qin + 1) * cs,
                qout * cout: (qout + 1) * cout,
            ].set(kernel[ky, kx, base:base + cs, :])
            base += cs
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
            out = out.at[by + 1, bx + 1, qin * cin:(qin + 1) * cin, :].set(
                kernel[ky, kx]
            )
    return out


def conv_s2d_to_dense_stride2(
    x: jax.Array, kernel: jax.Array, bias: jax.Array
) -> jax.Array:
    """Stride-2 3×3 conv taking an s2d input, emitting a DENSE half-res map."""
    kt = transform_kernel_stride2(kernel)
    y = qconv(
        x, kt, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def s2d_bias(bias: jax.Array) -> jax.Array:
    """(Cout,) → (4Cout,) in q-major layout."""
    return jnp.tile(bias, 4)


def conv_s2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    in_segments: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Stride-1 same-padded conv over an s2d tensor, exact vs. the dense conv.

    ``kernel`` is the CANONICAL (k, k, Cin, Cout) kernel; transformed here.
    ``in_segments`` — see ``transform_kernel``.
    """
    kt = transform_kernel(kernel, in_segments)
    pad = kt.shape[0] // 2
    y = qconv(
        x, kt, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + s2d_bias(bias).astype(y.dtype)


def conv_s2d_multi(
    xs: Sequence[jax.Array],
    kernel: jax.Array,
    bias: jax.Array,
    segments: Sequence[int],
) -> jax.Array:
    """Stride-1 s2d conv over a channel-concat of s2d tensors WITHOUT
    materializing the concat: ``conv(concat(xs), K) == Σ conv(x_i, K_i)``
    with ``K_i`` the kernel's dense-channel slice for segment i.

    The concatenated decoder input is the largest tensor in the model
    (measured: a 6 GB HLO temp for decoder_4 at batch 128 — the HBM
    high-water mark); the split-conv form replaces it with an add epilogue.
    """
    assert len(xs) == len(segments)
    y = None
    base = 0
    for x, cs in zip(xs, segments):
        kt = transform_kernel(kernel[:, :, base:base + cs, :])
        pad = kt.shape[0] // 2
        yi = qconv(
            x, kt, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = yi if y is None else y + yi
        base += cs
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
    xf = x.astype(jnp.float32).reshape(b, hp, wp, 4, c)
    n = hp * wp * 4
    s1 = jnp.sum(xf, axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 2, 3), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale[None, None, None, None, :] + bias[None, None, None, None, :]
    out_dtype = out_dtype or x.dtype
    return y.reshape(b, hp, wp, cf).astype(out_dtype)


# --- upsample-conv folding -------------------------------------------------
#
# Composite-tap table for folding the exact-2x bilinear upsample INTO the
# following 3x3 s2d conv. For output sub-pixel parity o and original kernel
# tap k, the conv reads the upsampled row n = o + k - 1, which is the 2-tap
# lerp of x rows; _FOLD_TAPS[o, k, dy+1] is the resulting weight of x row
# offset dy ∈ {-1, 0, 1}:
#     n = 2*by + ry;  ry=0 → {x[by-1]: 0.25, x[by]: 0.75}
#                     ry=1 → {x[by]: 0.75, x[by+1]: 0.25}
_FOLD_TAPS = np.zeros((2, 3, 3), np.float32)
for _o in range(2):
    for _k in range(3):
        _n = _o + _k - 1
        _by, _ry = _n // 2, _n % 2
        if _ry == 0:
            _FOLD_TAPS[_o, _k, _by - 1 + 1] += 0.25
            _FOLD_TAPS[_o, _k, _by + 1] += 0.75
        else:
            _FOLD_TAPS[_o, _k, _by + 1] += 0.75
            _FOLD_TAPS[_o, _k, _by + 1 + 1] += 0.25
del _o, _k, _n, _by, _ry


def fold_up_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) → (3, 3, Cin, 4Cout) q-major composite kernel.

    ``conv_s2d(upsample2x_into_s2d(x), K)`` collapses to a plain 3x3 conv on
    the PRE-upsample dense tensor: the four q channel groups of the upsample
    are redundant lerps of the same Cin channels, so the lerp weights fold
    into the kernel (exact in the interior up to one bf16 rounding — the
    live path rounds the lerps to the activation dtype before the conv, the
    folded path rounds the combined kernel instead). Removes both the lerp
    HBM machinery (~13 GB/step at b128, docs/PERFORMANCE.md) and 3/4 of the
    up-segment MACs (4Cin → Cin contraction).
    """
    assert kernel.shape[0] == 3 and kernel.shape[1] == 3
    taps = jnp.asarray(_FOLD_TAPS, kernel.dtype)
    # kf[dy, dx, c, oy, ox, o] = Σ_{ky,kx} taps[oy,ky,dy]·taps[ox,kx,dx]·K
    kf = jnp.einsum("ykd,xwe,kwco->decyxo", taps, taps, kernel)
    c, cout = kernel.shape[2], kernel.shape[3]
    return kf.reshape(3, 3, c, 4 * cout)


def _up_contrib_strip(x3: jax.Array, kernel: jax.Array, axis: int,
                      take: int) -> jax.Array:
    """Reference-path up-segment contribution for ONE s2d output row/col.

    ``x3``: a 3-row (axis=1) or 3-col (axis=2) slice of the pre-upsample
    tensor whose upsample covers the conv's receptive field for the border
    line being recomputed. ``take``: output line to keep (0 for the leading
    edge, 2 for the trailing edge). The slice's far-edge lerp clamp is wrong
    relative to the full tensor, but the taken output line never reads those
    entries.

    Padding is SYMMETRIC (1, 1) on both axes — the taken line's value is
    identical to an asymmetric pad that trims the discarded line, but XLA's
    SPMD partitioner MISCOMPILES asymmetric conv padding on a sharded
    spatial dim (measured: 1.7 max-abs error under a (data, space) 2-D
    mesh; exact under 1-D or no sharding) — see tests/test_spatial.py.
    """
    up = upsample2x_into_s2d(x3)
    kt = transform_kernel(kernel)
    y = qconv(
        up, kt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.lax.dynamic_slice_in_dim(y, take, 1, axis=axis)


def conv_up_fold(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Up-segment of an s2d decoder conv, computed WITHOUT upsampling.

    ``x``: the pre-upsample dense tensor (B, H, W, Cin) — same spatial grid
    as the s2d level. Returns the (B, H, W, 4Cout) s2d contribution of
    ``conv_s2d(upsample2x_into_s2d(x), K)`` (no bias).

    Interior: one folded 3x3 conv (``fold_up_kernel``). Borders: the fold's
    zero padding differs from the composite's semantics (the upsample
    edge-clamps its lerps, then the s2d conv zero-pads a whole BLOCK row),
    so the 1-block border frame is recomputed via the reference path on
    3-row/3-col strips and written back — exact.
    """
    b, h, w, cin = x.shape
    if h < 3 or w < 3:
        raise ValueError(
            f"conv_up_fold needs a >=3x3 coarse grid for its border-strip "
            f"recompute (got {h}x{w}); callers must fall back to the "
            f"reference upsample path below that."
        )
    kf = fold_up_kernel(kernel)
    y = qconv(
        x, kf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Border frame, reference path. Row strips use the full W context (and
    # W zero-padding), so they are exact including corners; col strips
    # likewise use full H context. Assembly choice MEASURED (round 4): the
    # post-fold HLO profile ranked these four in-place writes as the #1
    # residual HBM group (~34 GB analytic at b128, each update nominally
    # rewriting the full tensor), so a concat-frame variant was built and
    # benched — 639.0/167.7 vs 642.7/169.2 img/s, i.e. NO win: XLA already
    # elides the in-place updates (the analytic roofline overstates them).
    # dynamic_update_slice kept as the measured-best lowering;
    # scratch/measure_r4.log has both legs.
    top = _up_contrib_strip(x[:, 0:3], kernel, 1, 0)
    bot = _up_contrib_strip(x[:, h - 3:], kernel, 1, 2)
    left = _up_contrib_strip(x[:, :, 0:3], kernel, 2, 0)
    right = _up_contrib_strip(x[:, :, w - 3:], kernel, 2, 2)
    y = jax.lax.dynamic_update_slice_in_dim(y, top.astype(y.dtype), 0, axis=1)
    y = jax.lax.dynamic_update_slice_in_dim(
        y, bot.astype(y.dtype), h - 1, axis=1)
    y = jax.lax.dynamic_update_slice_in_dim(
        y, left.astype(y.dtype), 0, axis=2)
    y = jax.lax.dynamic_update_slice_in_dim(
        y, right.astype(y.dtype), w - 1, axis=2)
    return y


def up_fold_enabled() -> bool:
    """Default policy for folding the decoder upsample into the s2d conv:
    ON on TPU backends (measured win, docs/PERFORMANCE.md), OFF elsewhere —
    CPU tests exercise the reference path, whose numerics the fold matches
    only up to one activation-dtype rounding. Override with
    ``UNET_TPU_S2D_UP_FOLD=0|1``."""
    import os

    v = os.environ.get("UNET_TPU_S2D_UP_FOLD")
    if v is not None:
        return v not in ("0", "false", "")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def conv_s2d_multi_up_fold(
    x_pre_up: jax.Array,
    rest: Sequence[jax.Array],
    kernel: jax.Array,
    bias: jax.Array,
    segments: Sequence[int],
) -> jax.Array:
    """``conv_s2d_multi([upsample2x_into_s2d(x_pre_up), *rest], ...)`` with
    the upsample folded into segment 0's kernel (``conv_up_fold``)."""
    assert len(rest) == len(segments) - 1
    c0 = segments[0]
    y = conv_up_fold(x_pre_up, kernel[:, :, :c0, :])
    base = c0
    for xi, cs in zip(rest, segments[1:]):
        kt = transform_kernel(kernel[:, :, base:base + cs, :])
        pad = kt.shape[0] // 2
        yi = qconv(
            xi, kt, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + yi
        base += cs
    return y + s2d_bias(bias).astype(y.dtype)


def dense_up_fold_enabled(deterministic: bool = True) -> bool:
    """Policy for the DENSE-level upsample fold (``conv_dense_up_fold``).

    PER-MODE: default ON only for inference/eval jits (``deterministic=True``)
    on TPU backends, OFF for training jits. Same-day isolation on TPU v5e
    (scratch/measure_r3.log, 2026-08-19): the fold helps inference +4.5%
    (641.9 vs 614.5 img/s/chip at b128) but regresses the train step −6%
    (159.1 vs 169.3 img/s at b32) — the extra depth_to_space of conv_0's
    output is free in the forward-only program but its transpose-gradient
    (a space_to_depth of the incoming cotangent on the fine grid) stacks
    onto the backward pass's HBM high-water path. ``UNET_TPU_DENSE_UP_FOLD=
    0|1`` still forces BOTH modes (hardware ablations); unset → per-mode.
    The s2d-level fold (``up_fold_enabled``) stays mode-agnostic: it
    measured a win for both (632/164 vs 516/129.6, round 2)."""
    import os

    v = os.environ.get("UNET_TPU_DENSE_UP_FOLD")
    if v is not None:
        return v not in ("0", "false", "")
    return deterministic and up_fold_enabled()


def conv_dense_up_fold(
    x_pre_up: jax.Array,
    rest: Sequence[jax.Array],
    kernel: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """DENSE-level decoder conv with the 2x upsample folded away.

    Computes ``conv(concat([upsample2x_nhwc(x_pre_up), *rest]), kernel)`` on
    the fine grid without materializing the upsampled tensor: segment 0 is
    evaluated in s2d layout on the COARSE grid via ``conv_up_fold`` (exact
    incl. borders, MAC-neutral: coarse·9·Cin·4Cout == fine·9·Cin·Cout) and
    depth-to-space'd once; the remaining segments (the skip, already at fine
    resolution) use plain dense convs. Replaces the per-axis lerp+interleave
    HBM machinery of the dense decoder levels with one d2s transpose of the
    conv OUTPUT (≤ the upsampled tensor it replaces, since Cout ≤ Cin at
    every decoder level). Rounding: combined-kernel instead of per-lerp, the
    same ~1e-6 f32 delta as ``conv_s2d_multi_up_fold``.
    """
    c0 = x_pre_up.shape[-1]
    y = depth_to_space(conv_up_fold(x_pre_up, kernel[:, :, :c0, :]))
    base = c0
    pad = kernel.shape[0] // 2
    for xi in rest:
        cs = xi.shape[-1]
        yi = qconv(
            xi, kernel[:, :, base:base + cs, :], (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + yi
        base += cs
    return y + bias.astype(y.dtype)


def upsample2x_into_s2d(x: jax.Array) -> jax.Array:
    """Exact 2x bilinear upsample emitted directly in s2d layout.

    Input (B, H, W, C) dense → output (B, H, W, 4C) = s2d(upsample2x(x)).
    Each sub-pixel is the 2-tap lerp shared with the dense fast path
    (``ops.resize.lerp2_taps`` — one definition, f32 accumulation). In
    q-major layout the combine is a plain channel concatenate — no
    interleave materialization.
    """
    from unet_implementations_tpu.ops.resize import lerp2_taps

    row0, row1 = lerp2_taps(x, 1)
    c00, c01 = lerp2_taps(row0, 2)
    c10, c11 = lerp2_taps(row1, 2)
    # q-major: channel blocks in q order (0,0), (0,1), (1,0), (1,1)
    return jnp.concatenate([c00, c01, c10, c11], axis=-1)
