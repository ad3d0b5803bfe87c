"""Opt-in fp8 convolution execution — MEASURED NEGATIVE end-to-end;
ships off-by-default as the documented counter-example + re-check hook.

The round-4 direct-conv probe (`scratch/fp8_conv_probe.py`) measured
fp8_e5m2 direct convolutions at **+23% over bf16 on the model's dominant
FLOPs bucket** (the s2d level-0 shape, 384→128 @256²: 102.3 vs 82.9 TF/s),
which justified this mode: every model conv routes through :func:`qconv`,
which — when the policy is active — casts both operands to an fp8 dtype,
accumulates in f32 (``preferred_element_type``), and casts the result back
to the activation dtype. Parameters, InstanceNorm, and everything outside
the conv MACs stay bf16/f32; checkpoints are unaffected.

END-TO-END RESULT (`scratch/fp8_e2e_probe.py`, docs/PERFORMANCE.md "fp8
END-TO-END" section): every variant LOSES — 513-586 img/s vs the 642
bf16 baseline, and 0.63-0.75 argmax agreement. XLA does not fuse the
bf16→fp8 converts into conv operands on TPU, so each quantized conv pays
an extra HBM round-trip that exceeds its MXU saving; and weight-rounding
noise injected at the (big-grid) encoder convs compounds through the
stack. Keep the mode for one-command re-measurement when libtpu moves:
``UNET_TPU_CONV_FP8=all python bench.py``.

Policy (resolved at TRACE time, like the fold gates in ``models/s2d.py``):

- ``UNET_TPU_CONV_FP8`` — unset/empty/``off`` (default): pure bf16.
  An integer ``N``: fp8 only for convs whose INPUT spatial grid is
  ≥ N×N — the input edge tracks the work size, see the check in
  :func:`qconv` (selectivity follows the probe: big grids win, 32²
  grids are par-to-worse). ``all``/``0``: every conv.
- ``UNET_TPU_CONV_FP8_DTYPE`` — ``e5m2`` (default; fastest at the dominant
  shape, 2 mantissa bits) or ``e4m3`` (3 mantissa bits, ~half the rounding
  error, measured equal at the dominant shape).

OFF by default everywhere: this is a serving-mode knob. Gradients do not
flow through the fp8 path in supported configurations (training jits are
built with the policy off unless the user forces it; fp8 conv transposes
are not validated). Accuracy: see ``tests/test_fp8_mode.py`` (output drift
+ argmax agreement vs the bf16 program) and the measured Dice drift in
``docs/PERFORMANCE.md``.

Reference parity note: the reference has no quantized path (its AMP is
torch fp16 autocast, ``Our_UNet/src/train.py:638-652``); this is TPU
headroom engineering on top of parity.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["fp8_conv_min_grid", "fp8_conv_dtype", "qconv"]


def fp8_conv_min_grid() -> Optional[int]:
    """Minimum output-grid edge for fp8 conv execution, or None (off).

    ``UNET_TPU_CONV_FP8``: unset/empty/"off"/"false" → None; "all" → 0;
    integer N → N. Resolved at trace time.
    """
    v = os.environ.get("UNET_TPU_CONV_FP8", "").strip().lower()
    if v in ("", "off", "false", "none"):
        return None
    if v == "all":
        return 0
    try:
        return int(v)
    except ValueError:
        return None


def fp8_conv_dtype() -> Any:
    """The fp8 storage dtype for conv operands (``UNET_TPU_CONV_FP8_DTYPE``)."""
    v = os.environ.get("UNET_TPU_CONV_FP8_DTYPE", "e5m2").strip().lower()
    if v in ("e4m3", "fp8_e4m3", "float8_e4m3fn"):
        return jnp.float8_e4m3fn
    return jnp.float8_e5m2


def qconv(
    lhs: jax.Array,
    rhs: jax.Array,
    window_strides: Sequence[int],
    padding: Any,
    *,
    dimension_numbers: Tuple[str, str, str] = ("NHWC", "HWIO", "NHWC"),
    **kw: Any,
) -> jax.Array:
    """``lax.conv_general_dilated`` with the trace-time fp8 policy applied.

    When active (and the operands are a floating dtype), both operands are
    cast to the fp8 dtype and the conv accumulates in f32; the result is
    cast back to ``lhs.dtype``. NOTE the casts are real HBM traffic — XLA
    does not fuse elementwise producers into conv operands on TPU — which
    is why the mode measured slower end-to-end (module docstring).
    """
    min_grid = fp8_conv_min_grid()
    if (
        min_grid is not None
        and jnp.issubdtype(lhs.dtype, jnp.floating)
        and lhs.dtype.itemsize <= 2
        # NHWC throughout the model; grid check on the INPUT spatial edge
        # (output edge equals it for stride 1, halves for stride 2 — the
        # probe's win/loss boundary tracks the work size, i.e. the input).
        and min(lhs.shape[1], lhs.shape[2]) >= min_grid
    ):
        dt = fp8_conv_dtype()
        y = jax.lax.conv_general_dilated(
            lhs.astype(dt),
            rhs.astype(dt),
            window_strides,
            padding,
            dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
            **kw,
        )
        return y.astype(lhs.dtype)
    return jax.lax.conv_general_dilated(
        lhs, rhs, window_strides, padding,
        dimension_numbers=dimension_numbers, **kw,
    )
