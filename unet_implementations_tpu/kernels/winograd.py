"""Winograd F(2x2, 3x3) convolution as a fused Pallas TPU kernel,
operating on space-to-depth (q-major) tensors.

The reference hot path is 3x3/stride-1 convs (``Our_UNet/models/unet.py:
399-432``); round-1 measurements put every UNet level at the chip's ~100 TF/s
direct-conv ceiling, so further inference gains require executing FEWER MACs.
Winograd F(2,3) computes each 2x2 output tile from a 4x4 input window with 16
MACs per (cin, cout) pair instead of 36 - a 2.25x cut:

    Y = A^T [ (G w G^T) . (B^T d B) ] A        (per tile, per channel pair)

The transform-domain products are batched matmuls ``[tiles, Cin] x [Cin,
Cout]`` - MXU-shaped when the DENSE channel counts are multiples of 128
(UNet levels 2-5: 128/256/512 channels).

Why s2d layout? The F(2,3) tile grid IS the 2x2-block grid of space-to-depth:
in a q-major s2d tensor ``[N, S/2, S/2, 4C]`` every B^T d B term is a
LANE-ALIGNED channel-block select plus a UNIT shift in the block grid -

    dense row 2i-1 = sub-row 1 of block i-1   (channel slice + row shift)

so the input transform costs ~3 VPU adds per tile position with NO sublane
deinterleaves, and the output tile (2x2 x Cout) is exactly one s2d output
pixel (a lane concat). A first implementation on DENSE tensors spent 7x the
direct conv's time in Mosaic relayouts for the parity splits/interleaves -
layout is the whole game here.

Kernel structure (one ``pallas_call``):

- grid = (N, Cout-blocks, row-blocks); each cell computes a full-width
  stripe of TH block rows for one image and one Cout block.
- input stays in HBM (``memory_space=ANY``); the kernel DMAs the TH+2-row
  halo stripe into VMEM (3 static-size copies; borders zero = SAME pad).
- 16 matmuls (bf16 x bf16 -> f32 accumulate) against pre-transformed weights
  ``U = G w G^T`` (computed outside, tiny); the A^T/A output transform is
  accumulated on the fly, so the 16-position M tensor never materializes.
- one write of the output stripe, viewed [N, S/2, S/2, 4, Cout] so Cout can
  be blocked while the 4 sub-pixel blocks stay contiguous.

HBM traffic: one read of x per Cout sweep + one write of y - the same as
XLA's direct conv - while MXU work drops 2.25x.

Numerics: algebraically exact, not bitwise vs. direct convolution (tile
sums reassociate); bf16 activations see the usual bf16-conv error scale -
see tests/test_winograd.py for f32 tolerances.

Differentiable via ``jax.custom_vjp``: dL/dx of a SAME stride-1 3x3 conv is
itself one (flipped, io-transposed kernel) and reuses this kernel in s2d
layout; dL/dW delegates to XLA's native conv weight-grad.

On non-TPU backends falls back to depth_to_space -> lax.conv ->
space_to_depth (identical math); ``interpret=True`` runs the Pallas path on
CPU for tests.

MEASURED OUTCOME (v5e, b32, bf16): the kernel is correct but does NOT beat
XLA's direct conv at any eligible UNet level — best 0.86/1.00/0.86x at
128/256/512 ch (12 MB tiles); the folded-A variant 0.35-0.73x; 64 MB tiles
0.46-0.95x. A matmul-only ablation (transforms deleted) runs in the SAME
time as the full kernel at only 29-36 TF/s: Mosaic's [rows, C] x [C, C]
matmul throughput at C<=512 is the ceiling, less than half of what XLA's
conv emitter sustains (58-86 TF/s of direct-conv MACs) — so the 2.25x MAC
cut cannot win on this toolchain. OFF by default; kept as the documented
negative result + reference implementation (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2,3) weight transform (correlation convention, like lax.conv).
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)


def transform_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (16, Cin, Cout): U[4a+b] = (G w G^T)[a, b]."""
    g = jnp.asarray(_G)
    u = jnp.einsum("ak,bl,klio->abio", g, g, kernel.astype(jnp.float32))
    return u.reshape(16, kernel.shape[2], kernel.shape[3])


def transform_weights_folded(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (8, 3*Cin, Cout) with the A^T row combine folded
    into the matmul K dimension: z[2b+r] = concat_a(v_ab) @ UF[2b+r].

    A^T row 0 selects a∈{0,1,2} with signs (+,+,+); row 1 selects a∈{1,2,3}
    with signs (+,-,-). Executes 24/36 of the direct conv's MACs (vs 16/36
    unfolded) but removes the 16-term f32 accumulation entirely - each z is
    ONE MXU matmul with K=3*Cin.
    """
    u = transform_weights(kernel).reshape(4, 4, kernel.shape[2], kernel.shape[3])
    rows = []
    for b in range(4):
        rows.append(jnp.concatenate([u[0, b], u[1, b], u[2, b]], axis=0))
        rows.append(jnp.concatenate([u[1, b], -u[2, b], -u[3, b]], axis=0))
    return jnp.stack(rows)  # [2b + r]


def eligible(dense_shape, kernel_shape, stride: int) -> bool:
    """Winograd preconditions for a SAME conv on the DENSE geometry."""
    if stride != 1 or kernel_shape[0] != 3 or kernel_shape[1] != 3:
        return False
    _, h, w, _ = dense_shape
    cin, cout = kernel_shape[2], kernel_shape[3]
    return (
        h % 2 == 0
        and w % 2 == 0
        and h >= 8
        and w >= 8
        and cin % 128 == 0
        and cout % 128 == 0
    )


def _vmem_estimate(th: int, g: int, c: int, cob: int) -> int:
    """Rough per-cell VMEM bytes: patch + B^T temporaries (bf16), f32
    accumulators z/m_ab, double-buffered U and output blocks."""
    t_rows = th * g
    patch = (th + 2) * g * 4 * c * 2
    # te/to (8) + v_ab (16) + live concats, bf16 (covers folded variant)
    bt_tmp = 22 * t_rows * c * 2
    accum = (8 + 1) * t_rows * cob * 4    # z[8] (+ m_ab unfolded), f32
    u_dbl = 2 * 48 * c * cob * 2          # folded U is [8, 3C, COB]
    out_dbl = 2 * t_rows * 4 * cob * 2
    return patch + bt_tmp + accum + u_dbl + out_dbl


# Per-kernel VMEM ceiling (CompilerParams.vmem_limit_bytes). Measured: the
# small-tile (12 MB budget) configuration is the best of every variant tried;
# 64 MB tiles ran SLOWER (0.46-0.95x vs 0.86-1.00x of direct conv at
# 128/256/512 ch) — bigger stripes did not amortize the transform cost.
_VMEM_LIMIT = 32 << 20
_VMEM_BUDGET = 12 << 20
_MAX_ROWS = 2048


def _pick_tile_rows(gh: int, gw: int, c: int, cob: int,
                    budget: int = _VMEM_BUDGET) -> int:
    """Largest divisor of gh whose TH*GW-row working set fits the
    VMEM budget (capped at ``_MAX_ROWS`` matmul rows)."""
    for th in (d for d in range(gh, 0, -1) if gh % d == 0):
        if _vmem_estimate(th, gw, c, cob) <= budget and th * gw <= _MAX_ROWS:
            return th
    return 1


def _shift_up(x):
    """x[t] <- x[t+1], zero at the end (dense column S = SAME pad)."""
    zero = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([x[:, 1:], zero], axis=1)


def _shift_down(x):
    """x[t] <- x[t-1], zero at the start (dense column -1 = SAME pad)."""
    zero = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([zero, x[:, :-1]], axis=1)


def _wino_s2d_kernel(x_hbm, u_ref, b_ref, out_ref, patch, sem, *, th, g, c):
    """One (image, cout-block, row-stripe) cell.

    ``patch``: [TH+2, G, 4C] s2d halo stripe (q-major: channel block
    q = 2*qy + qx holds dense sub-pixel (qy, qx)).
    """
    n = pl.program_id(0)
    hb = pl.program_id(2)
    nh = pl.num_programs(2)
    r0 = hb * th
    t_rows = th * g

    body = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(r0, th), :, :], patch.at[pl.ds(1, th), :, :], sem.at[0]
    )
    body.start()

    @pl.when(hb == 0)
    def _():
        patch[0:1] = jnp.zeros((1, g, 4 * c), patch.dtype)

    @pl.when(hb == nh - 1)
    def _():
        patch[th + 1 : th + 2] = jnp.zeros((1, g, 4 * c), patch.dtype)

    @pl.when(hb > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(r0 - 1, 1), :, :], patch.at[pl.ds(0, 1), :, :],
            sem.at[1],
        )
        top.start()
        top.wait()

    @pl.when(hb < nh - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(r0 + th, 1), :, :],
            patch.at[pl.ds(th + 1, 1), :, :],
            sem.at[2],
        )
        bot.start()
        bot.wait()

    body.wait()

    p = patch[...]  # [TH+2, G, 4C]
    # q-major channel blocks: q = 2*qy + qx.
    q00, q01, q10, q11 = (p[:, :, i * c : (i + 1) * c] for i in range(4))

    # Row direction (B^T): for tile t, dense rows (2i-1, 2i, 2i+1, 2i+2) are
    # q1x[t], q0x[t+1], q1x[t+1], q0x[t+2] in patch coordinates. Produce the
    # four B^T combinations for each column parity qx. [TH, G, C] each.
    def row_t(q0x, q1x):
        d0, d1, d2, d3 = q1x[:th], q0x[1 : th + 1], q1x[1 : th + 1], q0x[2:]
        return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)

    te = row_t(q00, q10)  # column parity 0 (dense even columns)
    to = row_t(q01, q11)  # column parity 1 (dense odd columns)

    # Output transform accumulators z[2b + r] (A^T folded in as each m_ab is
    # produced; the 16-position M tensor never materializes).
    z = [None] * 8

    def acc(idx, val):
        z[idx] = val if z[idx] is None else z[idx] + val

    for a in range(4):
        # Column direction (B^T): dense cols (2j-1, 2j, 2j+1, 2j+2) are
        # odd[j-1], even[j], odd[j], even[j+1] -> unit sublane shifts.
        c0, c1, c2, c3 = _shift_down(to[a]), te[a], to[a], _shift_up(te[a])
        vs = (c0 - c2, c1 + c2, c2 - c1, c1 - c3)
        for b in range(4):
            v = vs[b].reshape(t_rows, c)
            m_ab = jnp.dot(v, u_ref[4 * a + b], preferred_element_type=jnp.float32)
            if a in (0, 1, 2):  # A^T row 0 = [1, 1, 1, 0]
                acc(2 * b + 0, m_ab)
            if a == 1:  # A^T row 1 = [0, 1, -1, -1]
                acc(2 * b + 1, m_ab)
            elif a in (2, 3):
                acc(2 * b + 1, -m_ab)

    bias = b_ref[0]  # [COB] f32
    cob = bias.shape[-1]
    # A column combine -> output sub-pixels y(r, s); q-major output block
    # q = 2r + s is just a stack on the sub-pixel axis.
    y = (
        z[0] + z[2] + z[4],  # (r=0, s=0)
        z[2] - z[4] - z[6],  # (r=0, s=1)
        z[1] + z[3] + z[5],  # (r=1, s=0)
        z[3] - z[5] - z[7],  # (r=1, s=1)
    )
    out = jnp.concatenate(
        [(q + bias).astype(out_ref.dtype).reshape(th, g, 1, cob) for q in y],
        axis=2,
    )
    out_ref[0] = out


def _wino_s2d_kernel_folded(x_hbm, u_ref, b_ref, out_ref, patch, sem, *, th, g, c):
    """Folded-A^T variant: 8 matmuls with K=3C, no f32 accumulation chain.

    Same stripe/halo structure as ``_wino_s2d_kernel``; ``u_ref`` is the
    [8, 3C, COB] folded weight block (``transform_weights_folded``).
    """
    n = pl.program_id(0)
    hb = pl.program_id(2)
    nh = pl.num_programs(2)
    r0 = hb * th
    t_rows = th * g

    body = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(r0, th), :, :], patch.at[pl.ds(1, th), :, :], sem.at[0]
    )
    body.start()

    @pl.when(hb == 0)
    def _():
        patch[0:1] = jnp.zeros((1, g, 4 * c), patch.dtype)

    @pl.when(hb == nh - 1)
    def _():
        patch[th + 1 : th + 2] = jnp.zeros((1, g, 4 * c), patch.dtype)

    @pl.when(hb > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(r0 - 1, 1), :, :], patch.at[pl.ds(0, 1), :, :],
            sem.at[1],
        )
        top.start()
        top.wait()

    @pl.when(hb < nh - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(r0 + th, 1), :, :],
            patch.at[pl.ds(th + 1, 1), :, :],
            sem.at[2],
        )
        bot.start()
        bot.wait()

    body.wait()

    p = patch[...]  # [TH+2, G, 4C]
    q00, q01, q10, q11 = (p[:, :, i * c : (i + 1) * c] for i in range(4))

    def row_t(q0x, q1x):
        d0, d1, d2, d3 = q1x[:th], q0x[1 : th + 1], q1x[1 : th + 1], q0x[2:]
        return (d0 - d2, d1 + d2, d2 - d1, d1 - d3)

    te = row_t(q00, q10)
    to = row_t(q01, q11)

    # v[a][b]: B^T column combine per row-combination a. [TH, G, C] each.
    v = []
    for a in range(4):
        c0, c1, c2, c3 = _shift_down(to[a]), te[a], to[a], _shift_up(te[a])
        v.append((c0 - c2, c1 + c2, c2 - c1, c1 - c3))

    bias = b_ref[0]  # [COB] f32
    cob = bias.shape[-1]
    # z[2b+r] = concat_a(v_ab) @ UF[2b+r] - ONE matmul each, K = 3C.
    z = []
    for b in range(4):
        for r, trio in (((0), (0, 1, 2)), ((1), (1, 2, 3))):
            vcat = jnp.concatenate(
                [v[a][b] for a in trio], axis=-1
            ).reshape(t_rows, 3 * c)
            z.append(
                jnp.dot(vcat, u_ref[2 * b + r], preferred_element_type=jnp.float32)
            )
    # A column combine (over b) -> output sub-pixels y(r, s).
    y = (
        z[0] + z[2] + z[4],  # (r=0, s=0): b 0+1+2, r=0
        z[2] - z[4] - z[6],  # (r=0, s=1)
        z[1] + z[3] + z[5],  # (r=1, s=0)
        z[3] - z[5] - z[7],  # (r=1, s=1)
    )
    out = jnp.concatenate(
        [(q + bias).astype(out_ref.dtype).reshape(th, g, 1, cob) for q in y],
        axis=2,
    )
    out_ref[0] = out


def _pick_cout_block(cin: int, cout: int) -> int:
    # U double-buffers at [16, Cin, COB] bf16; keep it under ~2.5MB a slot.
    cob = min(cout, 256 if cin <= 256 else 128)
    while cout % cob:
        cob //= 2
    return cob


_FOLDED = False  # fold A^T rows into the matmul K dim (8 matmuls, K=3C)


def _wino_s2d_pallas(x, u, bias, *, out_dtype, interpret=False):
    n, gh, gw, c4 = x.shape
    c = c4 // 4
    cout = u.shape[-1]
    cob = _pick_cout_block(c, cout)
    th = _pick_tile_rows(gh, gw, c, cob)
    grid = (n, cout // cob, gh // th)

    folded = u.shape[0] == 8
    kern_fn = _wino_s2d_kernel_folded if folded else _wino_s2d_kernel
    kernel = functools.partial(kern_fn, th=th, g=gw, c=c)
    macs_per_px = 24 if folded else 16
    flops = 2 * n * gh * gw * macs_per_px * c * cout
    out5 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (u.shape[0], u.shape[1], cob), lambda ni, cb, hb: (0, 0, cb)
            ),
            pl.BlockSpec((1, cob), lambda ni, cb, hb: (0, cb)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, gw, 4, cob), lambda ni, cb, hb: (ni, hb, 0, 0, cb)
        ),
        out_shape=jax.ShapeDtypeStruct((n, gh, gw, 4, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, gw, c4), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * gh * gw * 4 * cout * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, u, bias)
    return out5.reshape(n, gh, gw, 4 * cout)


def _space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x):
    b, hp, wp, cf = x.shape
    c = cf // 4
    x = x.reshape(b, hp, wp, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp * 2, wp * 2, c)


def _direct_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


def _fallback_s2d(x_s2d, kernel, bias):
    """Identical math via XLA on any backend: d2s -> conv -> s2d."""
    return _space_to_depth(_direct_conv(_depth_to_space(x_s2d), kernel, bias))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or all(
        d.platform == "tpu" for d in jax.devices()
    )


def _forward_s2d(x_s2d, kernel, bias, interpret=False):
    if not (interpret or _on_tpu()):
        return _fallback_s2d(x_s2d, kernel, bias)
    tw = transform_weights_folded if _FOLDED else transform_weights
    u = tw(kernel).astype(x_s2d.dtype)
    bias_f = bias.astype(jnp.float32).reshape(1, -1)
    return _wino_s2d_pallas(
        x_s2d, u, bias_f, out_dtype=x_s2d.dtype, interpret=interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def winograd_conv_s2d(
    x_s2d: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """SAME stride-1 3x3 DENSE conv evaluated on a q-major s2d tensor.

    ``x_s2d``: (N, S/2, S/2, 4*Cin) q-major space-to-depth of the dense
    (N, S, S, Cin) input; returns the s2d of the dense conv's output.
    ``kernel``: the CANONICAL dense (3, 3, Cin, Cout), Cin/Cout multiples of
    128; ``bias``: (Cout,). Executes 4/9 of the direct conv's MACs.
    """
    return _forward_s2d(x_s2d, kernel, bias, interpret)


def _wino_fwd(x_s2d, kernel, bias, interpret):
    return _forward_s2d(x_s2d, kernel, bias, interpret), (x_s2d, kernel)


def _wino_bwd(interpret, residuals, g):
    x_s2d, kernel = residuals
    # dL/dx: SAME stride-1 conv of g with the flipped, io-transposed kernel -
    # again Winograd, again in s2d layout.
    k_flip = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    zero_bias = jnp.zeros((k_flip.shape[-1],), g.dtype)
    dx = _forward_s2d(g, k_flip, zero_bias, interpret)
    # dL/dW: XLA's native conv weight-grad on the dense view.
    x_dense = _depth_to_space(x_s2d)
    g_dense = _depth_to_space(g)
    _, vjp = jax.vjp(
        lambda w: _direct_conv(x_dense, w, jnp.zeros((w.shape[-1],), g.dtype)),
        kernel,
    )
    (dw,) = vjp(g_dense)
    db = jnp.sum(g_dense.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


winograd_conv_s2d.defvjp(_wino_fwd, _wino_bwd)


def winograd_conv(x, kernel, bias, interpret: bool = False) -> jax.Array:
    """Dense-tensor convenience wrapper: s2d -> kernel -> d2s.

    For production use feed s2d tensors directly (``winograd_conv_s2d``) -
    the layout conversions here cost a full extra read+write of x and y.
    """
    return _depth_to_space(winograd_conv_s2d(_space_to_depth(x), kernel, bias, interpret))
