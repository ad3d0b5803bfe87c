"""Whole-region Pallas kernel for the s2d level's ConvBlock tail.

Every s2d-level ConvBlock (``models/blocks.py::ConvBlock(s2d=True)``) ends in
the chain ``InstanceNorm -> LeakyReLU -> conv_1 (s2d 3x3) -> InstanceNorm ->
LeakyReLU`` (reference ``Our_UNet/models/unet.py:101-127`` per conv). In XLA
that chain is four HBM round trips of the (B, H', W', 4C) activation around
the conv: stats read, normalized write, conv read(+write), stats read,
normalized write — and the record's round-2 lesson (docs/PERFORMANCE.md
"Negative results") was that single-op Pallas kernels lose to XLA because
every custom-call boundary with XLA-scheduled convs pays a layout toll, so
"only a kernel that replaces a whole layout-stable region can win". This is
that kernel: the whole tail runs inside ONE ``pallas_call`` with one image
resident in VMEM — HBM traffic collapses to one read of conv_0's raw output
and one write of the block output.

Per grid step (one image):

1. IN1 statistics from the input block (f32 accumulation over the bf16
   activation, per-ORIGINAL-channel pooling of the 4 q-major sub-pixels —
   identical semantics to ``models/s2d.py::instance_norm_s2d``).
2. One VPU pass writes the normalized+LeakyReLU activation into an
   H-padded VMEM scratch (zero block-rows above/below = the s2d conv's
   zero padding).
3. The 3x3 s2d conv as 3 K-stacked MXU dots per row-chunk: an im2col-lite
   scratch holds the three W-shifted copies concatenated on lanes, so each
   dy contributes one ``(chunk*W, 3*4C) @ (3*4C, 4C)`` dot — K=384 at C=32,
   a far better MXU shape than 9 separate K=128 dots. W-edge zero padding
   is two zeroed columns in the scratch. The conv BIAS is skipped: a
   per-channel constant shifts the following InstanceNorm's mean by exactly
   itself and cancels (documented divergence, ~1 bf16 ulp vs the reference
   rounding order).
4. IN2 partial sums accumulate per chunk (f32, from the bf16-cast conv
   output — the same read-bf16/accumulate-f32 contract as the XLA path);
   a second in-VMEM pass over the output block applies the final
   normalize+LeakyReLU. The output block flushes to HBM once.

Forward-only by design: the train step keeps the XLA path (this mirrors the
per-mode dense-fold policy, ``models/s2d.py::dense_up_fold_enabled``) —
dispatch is trace-time on ``deterministic`` in ``ConvBlock``. Non-TPU
backends use the jnp reference composition below.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def s2d_region_enabled() -> bool:
    """Gate for the fused s2d tail region. Default: OFF (opt-in) until the
    end-to-end TPU measurement lands — see docs/PERFORMANCE.md round-5
    section for the verdict. Override with ``UNET_TPU_S2D_REGION=0|1``."""
    v = os.environ.get("UNET_TPU_S2D_REGION")
    if v is not None:
        return v not in ("0", "false", "")
    return False


def _pool_q(v: jax.Array, c: int) -> jax.Array:
    """(1, 4C) -> (1, C): sum the four q-major sub-pixel blocks."""
    return v[:, 0:c] + v[:, c:2 * c] + v[:, 2 * c:3 * c] + v[:, 3 * c:4 * c]


def _tile_q(v: jax.Array) -> jax.Array:
    """(1, C) -> (1, 4C): broadcast per-original-channel values to q-major."""
    return jnp.concatenate([v, v, v, v], axis=1)


def _region_kernel(x_ref, w2_ref, s1_ref, b1_ref, s2_ref, b2_ref, out_ref,
                   xpad_ref, b3_ref, *, eps, neg, ch):
    _, h, w, c4 = x_ref.shape
    c = c4 // 4
    nc = h // ch
    n = h * w * 4  # statistics population per ORIGINAL channel

    # --- IN1 statistics + normalize into the H-padded scratch ---
    # Chunked passes: whole-image f32 temporaries (33.6 MB each at 256²x128)
    # blow the 128 MB VMEM budget as register-allocator spill — every pass
    # touches at most a (ch, w, c4) f32 value.
    zero = jnp.zeros((1, c4), jnp.float32)

    def stats1_body(ci, carry):
        t1, t2 = carry
        xf = x_ref[0, pl.ds(ci * ch, ch)].astype(jnp.float32)  # (ch, w, c4)
        t1 = t1 + jnp.sum(xf, axis=(0, 1), keepdims=True)[0]
        t2 = t2 + jnp.sum(xf * xf, axis=(0, 1), keepdims=True)[0]
        return t1, t2

    t1, t2 = jax.lax.fori_loop(0, nc, stats1_body, (zero, zero))
    p1 = _pool_q(t1, c)
    p2 = _pool_q(t2, c)
    mean = p1 / n
    var = jnp.maximum(p2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a1 = _tile_q(rstd * s1_ref[...])                       # (1, c4)
    b1 = _tile_q(b1_ref[...] - mean * rstd * s1_ref[...])

    def norm1_body(ci, _):
        h0 = ci * ch
        y = x_ref[0, pl.ds(h0, ch)].astype(jnp.float32)
        y = y * a1[None] + b1[None]
        y = jnp.where(y >= 0, y, y * neg)
        xpad_ref[pl.ds(h0 + 1, ch)] = y.astype(xpad_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nc, norm1_body, 0)
    zrow = jnp.zeros((1, w, c4), xpad_ref.dtype)
    xpad_ref[0:1] = zrow
    xpad_ref[h + 1:h + 2] = zrow

    # --- conv_1 as 3 K-stacked dots per row-chunk + IN2 partial sums ---
    def chunk_body(ci, carry):
        u1, u2 = carry
        h0 = ci * ch
        src = xpad_ref[pl.ds(h0, ch + 2)]                  # (ch+2, w, c4)
        zcol = jnp.zeros((ch + 2, 1, c4), src.dtype)
        # Slot t holds source column w + t - 1 (the dx tap), zero at edges.
        b3_ref[:, :, 0:c4] = jnp.concatenate([zcol, src[:, 0:w - 1, :]], axis=1)
        b3_ref[:, :, c4:2 * c4] = src
        b3_ref[:, :, 2 * c4:3 * c4] = jnp.concatenate(
            [src[:, 1:w, :], zcol], axis=1)
        acc = jnp.zeros((ch * w, c4), jnp.float32)
        for dy in range(3):
            a = b3_ref[dy:dy + ch].reshape(ch * w, 3 * c4)
            acc = acc + jnp.dot(a, w2_ref[dy],
                                preferred_element_type=jnp.float32)
        y16 = acc.astype(out_ref.dtype)
        yf = y16.astype(jnp.float32)
        u1 = u1 + jnp.sum(yf, axis=0, keepdims=True)
        u2 = u2 + jnp.sum(yf * yf, axis=0, keepdims=True)
        out_ref[0, pl.ds(h0, ch)] = y16.reshape(ch, w, c4)
        return u1, u2

    u1, u2 = jax.lax.fori_loop(0, nc, chunk_body, (zero, zero))

    # --- IN2 finalize + second in-VMEM pass over the output block ---
    q1 = _pool_q(u1, c)
    q2 = _pool_q(u2, c)
    mean2 = q1 / n
    var2 = jnp.maximum(q2 / n - mean2 * mean2, 0.0)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    a2 = _tile_q(rstd2 * s2_ref[...])
    b2 = _tile_q(b2_ref[...] - mean2 * rstd2 * s2_ref[...])

    def norm_body(ci, _):
        h0 = ci * ch
        z = out_ref[0, pl.ds(h0, ch)].astype(jnp.float32)
        z = z * a2[None] + b2[None]
        z = jnp.where(z >= 0, z, z * neg)
        out_ref[0, pl.ds(h0, ch)] = z.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nc, norm_body, 0)


def _stack_w2(kernel2: jax.Array, dtype) -> jax.Array:
    """Canonical (3, 3, C, C) conv_1 kernel -> (3, 3*4C, 4C) dy-major stack.

    ``kt[dy, dx]`` is the s2d-transformed (4C, 4C) tap
    (``models/s2d.py::transform_kernel``); slot t=dx of the im2col scratch
    holds source column w+dx-1, so W2[dy] concatenates the three dx taps on
    the contraction axis.
    """
    from unet_implementations_tpu.models.s2d import transform_kernel

    kt = transform_kernel(kernel2)  # (3, 3, 4C, 4C)
    return jnp.stack(
        [jnp.concatenate([kt[dy, 0], kt[dy, 1], kt[dy, 2]], axis=0)
         for dy in range(3)]
    ).astype(dtype)


def _chunk_rows(h: int) -> int:
    # 32 rows keeps every in-kernel f32 temporary at (32, W, 4C) — 4.2 MB at
    # the 256²x128 level — so the whole program (in/out windows 64 MB
    # double-buffered + xpad 16 MB + im2col 6.4 MB + temps) stays under the
    # 128 MB VMEM ceiling (the 64-row variant OOM'd at 152 MB, round-5 log).
    for ch in (32, 16, 8):
        if h % ch == 0:
            return ch
    return h


def region_applicable(shape, dtype) -> bool:
    """Static shape gate: (B, H, W, 4C) with MXU/VPU-friendly dims."""
    if len(shape) != 4:
        return False
    _, h, w, c4 = shape
    return (
        c4 % 128 == 0
        and c4 <= 512
        and w % 128 == 0
        and h % 8 == 0
        and h >= 16
        and dtype in (jnp.bfloat16, jnp.float32)
    )


def _pallas_tail(x, scale1, bias1, kernel2, scale2, bias2, eps, neg,
                 interpret=False):
    b, h, w, c4 = x.shape
    ch = _chunk_rows(h)
    w2 = _stack_w2(kernel2, x.dtype)
    f32 = jnp.float32
    kern = functools.partial(_region_kernel, eps=eps, neg=neg, ch=ch)
    vec = pl.BlockSpec((1, c4 // 4), lambda i: (0, 0))
    itemsize = jnp.dtype(x.dtype).itemsize
    vmem_bytes = (
        2 * h * w * c4 * itemsize * 2          # in/out blocks, double-buffered
        + (h + 2) * w * c4 * itemsize          # xpad scratch
        + (ch + 2) * w * 3 * c4 * itemsize     # im2col-lite scratch
        + ch * w * c4 * 4 * 3                  # dot accumulator + temps
        + 8 * 1024 * 1024
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c4), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3 * c4, c4), lambda i: (0, 0, 0)),
            vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, h, w, c4), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w, c4), x.dtype),
            pltpu.VMEM((ch + 2, w, 3 * c4), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes), 126 * 1024 * 1024),
        ),
        interpret=interpret,
    )(x, w2, scale1.astype(f32)[None], bias1.astype(f32)[None],
      scale2.astype(f32)[None], bias2.astype(f32)[None])


def jnp_tail(x, scale1, bias1, kernel2, scale2, bias2, eps=1e-5, neg=0.01):
    """Reference composition of the tail region (conv bias omitted — it
    cancels in IN2). Used on non-TPU backends and by the parity tests."""
    from unet_implementations_tpu.models.s2d import conv_s2d, instance_norm_s2d

    c = x.shape[-1] // 4
    y = instance_norm_s2d(x, scale1, bias1, eps, out_dtype=x.dtype)
    y = jnp.where(y >= 0, y, y * jnp.asarray(neg, y.dtype))
    y = conv_s2d(y, kernel2.astype(y.dtype), jnp.zeros((c,), y.dtype))
    y = instance_norm_s2d(y, scale2, bias2, eps, out_dtype=x.dtype)
    return jnp.where(y >= 0, y, y * jnp.asarray(neg, y.dtype))


def fused_s2d_tail(x, scale1, bias1, kernel2, scale2, bias2,
                   eps: float = 1e-5, negative_slope: float = 0.01,
                   interpret: bool = False):
    """``lrelu(IN2(conv_s2d(lrelu(IN1(x)), K2)))`` as one whole-region
    Pallas program on TPU (jnp composition elsewhere).

    ``x``: (B, H', W', 4C) q-major s2d activation (conv_0's raw output).
    ``scale*/bias*``: per-ORIGINAL-channel (C,) InstanceNorm affine params.
    ``kernel2``: canonical (3, 3, C, C) conv_1 kernel. conv_1's bias is
    intentionally not taken: it cancels exactly in IN2.
    """
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (on_tpu or interpret) and region_applicable(x.shape, x.dtype):
        return _pallas_tail(x, scale1, bias1, kernel2, scale2, bias2,
                            eps, negative_slope, interpret=interpret)
    return jnp_tail(x, scale1, bias1, kernel2, scale2, bias2,
                    eps, negative_slope)
