"""Pallas one-pass exact-2x bilinear upsample (decoder hot path).

Why: the HLO cost table (utils/profiling.py, docs/PERFORMANCE.md) shows the
XLA lowering of the jnp upsample (``ops/resize.py``) materializes ~49 GB of
HBM traffic per b128 inference step across the four dense decoder levels and
the s2d level — per-axis lerp temporaries, pad+maximum interleave fusions,
relayout copies, and f32 convert round-trips — versus ~8 GB for a one-pass
streaming formulation. This kernel reads each input row block once (plus two
1-row halos) and writes the upsampled block once; all f32 lerp intermediates
live in VMEM.

Numerics are IDENTICAL to ``ops.resize.upsample2x_nhwc`` / ``models.s2d.
upsample2x_into_s2d``: the same two-tap torch-half-pixel lerps, f32
accumulation, and the same per-axis rounding back to the input dtype
(H-axis lerp → round → W-axis lerp → round). Tests assert bitwise equality.

Halo handling: the ±1 edge-clamped row access is expressed through clamped
BlockSpec index maps (``max(i*bh-1, 0)`` / ``min(i*bh+bh, H-1)``) on two
extra 1-row views of the same input — the clamp IS the edge padding, so the
kernel body has no boundary conditionals.

Interleave handling (dense variant): the output is shaped (B, H, 2, W, 2, C)
so each sub-pixel phase is a unit-dim static store; the final reshape to
(B, 2H, 2W, C) merges adjacent row-major dims — a free bitcast, verified in
the optimized HLO.

Backward: the upsample is linear, so ``jax.custom_vjp`` transposes the
reference jnp implementation (``jax.linear_transpose``) — the training
backward is exactly what XLA produced before this kernel existed.

Reference behavior: decoder ``F.interpolate(scale_factor=2, bilinear,
align_corners=False)`` at ``Our_UNet/models/unet.py:143-231``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Rows per block sized so all live buffers (input block, 4-phase output
# block, f32 lerp temporaries, double buffering) stay well under the 16MB
# VMEM budget: ~34 bytes/element of input block → 128k elements ≈ 4.4 MB.
_BLOCK_ELEMS = 128 * 1024


def _rows_per_block(h: int, w: int, c: int) -> int:
    hb = max(2, min(h, _BLOCK_ELEMS // max(w * c, 1)))
    while h % hb:
        hb -= 1
    return hb


def _lerp_rows(xm1, x, xp1, dtype):
    """Two-tap lerps along the leading axis, exactly ``lerp2_taps``:
    f32 accumulation, same op order, rounded back to ``dtype``."""
    xm1 = xm1.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xp1 = xp1.astype(jnp.float32)
    even = (0.25 * xm1 + 0.75 * xf).astype(dtype)
    odd = (0.75 * xf + 0.25 * xp1).astype(dtype)
    return even, odd


def _phases(x, top, bot):
    """The four sub-pixel phases of one row block.

    x: (bh, W, C); top/bot: (W, C) halo rows (already edge-clamped by the
    index maps). Returns ee, eo, oe, oo, each (bh, W, C) in x.dtype.
    """
    dtype = x.dtype
    xm1 = jnp.concatenate([top[None], x[:-1]], axis=0)
    xp1 = jnp.concatenate([x[1:], bot[None]], axis=0)
    even_h, odd_h = _lerp_rows(xm1, x, xp1, dtype)

    def wlerp(t):
        # The lerp itself is elementwise; the ±1 shifts along W are the
        # edge-clamped concats.
        tm1 = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
        tp1 = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        return _lerp_rows(tm1, t, tp1, dtype)

    ee, eo = wlerp(even_h)
    oe, oo = wlerp(odd_h)
    return ee, eo, oe, oo


def _dense_kernel(mid_ref, top_ref, bot_ref, out_ref):
    ee, eo, oe, oo = _phases(mid_ref[0], top_ref[0, 0], bot_ref[0, 0])
    out_ref[0, :, 0, :, 0, :] = ee
    out_ref[0, :, 0, :, 1, :] = eo
    out_ref[0, :, 1, :, 0, :] = oe
    out_ref[0, :, 1, :, 1, :] = oo


def _s2d_kernel(mid_ref, top_ref, bot_ref, out_ref):
    c = mid_ref.shape[-1]
    ee, eo, oe, oo = _phases(mid_ref[0], top_ref[0, 0], bot_ref[0, 0])
    # q-major channel layout: blocks in q order (0,0), (0,1), (1,0), (1,1)
    out_ref[0, :, :, 0 * c:1 * c] = ee
    out_ref[0, :, :, 1 * c:2 * c] = eo
    out_ref[0, :, :, 2 * c:3 * c] = oe
    out_ref[0, :, :, 3 * c:4 * c] = oo


def _in_specs(bh: int, w: int, c: int, h: int):
    return [
        pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec(
            (1, 1, w, c),
            lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
        pl.BlockSpec(
            (1, 1, w, c),
            lambda b, i: (b, jnp.minimum(i * bh + bh, h - 1), 0, 0)),
    ]


def _upsample2x_dense_pallas(x: jax.Array, interpret: bool = False):
    b, h, w, c = x.shape
    bh = _rows_per_block(h, w, c)
    out = pl.pallas_call(
        _dense_kernel,
        grid=(b, h // bh),
        in_specs=_in_specs(bh, w, c, h),
        out_specs=pl.BlockSpec(
            (1, bh, 2, w, 2, c), lambda b, i: (b, i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, w, 2, c), x.dtype),
        interpret=interpret,
    )(x, x, x)
    # Row-major merge of adjacent dims — a bitcast, not a copy.
    return out.reshape(b, 2 * h, 2 * w, c)


def _upsample2x_s2d_pallas(x: jax.Array, interpret: bool = False):
    b, h, w, c = x.shape
    bh = _rows_per_block(h, w, c)
    return pl.pallas_call(
        _s2d_kernel,
        grid=(b, h // bh),
        in_specs=_in_specs(bh, w, c, h),
        out_specs=pl.BlockSpec(
            (1, bh, w, 4 * c), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 4 * c), x.dtype),
        interpret=interpret,
    )(x, x, x)


def _enabled(variant: str) -> bool:
    import os

    # "all" | "s2d" | "dense" | "off" (UNET_TPU_DISABLE_PALLAS_UPSAMPLE is
    # an alias for "off"). Default: see the measured table in
    # docs/PERFORMANCE.md — the variants are adopted only where they win.
    mode = os.environ.get("UNET_TPU_PALLAS_UPSAMPLE", _DEFAULT_MODE)
    if os.environ.get("UNET_TPU_DISABLE_PALLAS_UPSAMPLE"):
        mode = "off"
    if mode not in (variant, "all"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# OFF by default — measured end-to-end NEGATIVE result (docs/PERFORMANCE.md):
# standalone the kernels beat the jnp lowering slightly (dec3 21.3 vs
# 24.3 ms, s2d 38.7 vs 46.2 ms at b128), but inside the model the custom
# call forces default layouts while XLA holds conv activations batch-minor
# ({0,3,2,1}), inserting GB-scale relayout copies on both sides of every
# call (b128 inference 248 → 312 ms dense, → 324 ms s2d-only). The winning
# answer for the s2d level is folding the upsample into the conv instead
# (models/s2d.py::conv_up_fold). Kept as the documented counter-example and
# for shapes where the relayout doesn't bind.
_DEFAULT_MODE = "off"


def _supported(x: jax.Array, c_mult: int) -> bool:
    if x.ndim != 4:
        return False
    _, h, w, c = x.shape
    # Sublane/lane-friendly shapes only; everything else takes the jnp
    # path (identical numerics, just slower). The s2d variant only needs
    # the OUTPUT channel dim (4C) lane-aligned, so c_mult=32 there.
    return h >= 4 and h % 2 == 0 and w % 8 == 0 and c % c_mult == 0


def _reference_dense(x):
    from unet_implementations_tpu.ops.resize import upsample2x_nhwc

    return upsample2x_nhwc(x)


def _reference_s2d(x):
    from unet_implementations_tpu.models.s2d import upsample2x_into_s2d

    return upsample2x_into_s2d(x)


def _make(reference_fn, pallas_fn, in_shape_fn, c_mult=128, variant="dense"):
    @jax.custom_vjp
    def fn(x):
        if _enabled(variant) and _supported(x, c_mult):
            return pallas_fn(x)
        return reference_fn(x)

    def fwd(x):
        # Linear op — no residuals; the input aval is recovered from the
        # cotangent's shape in bwd.
        return fn(x), None

    def bwd(_, ct):
        x_aval = jax.ShapeDtypeStruct(in_shape_fn(ct.shape), ct.dtype)
        # The cotangent map is the transpose of the reference
        # implementation — the exact backward XLA built before this kernel.
        (gx,) = jax.linear_transpose(reference_fn, x_aval)(ct)
        return (gx,)

    fn.defvjp(fwd, bwd)
    return fn


upsample2x_nhwc_fast = _make(
    _reference_dense, _upsample2x_dense_pallas,
    lambda s: (s[0], s[1] // 2, s[2] // 2, s[3]), variant="dense")
upsample2x_into_s2d_fast = _make(
    _reference_s2d, _upsample2x_s2d_pallas,
    lambda s: (s[0], s[1], s[2], s[3] // 4), c_mult=32, variant="s2d")
