"""One-command Winograd re-check (docs/PERFORMANCE.md negative-results
section points here).

The round-2 verdict on Winograd F(2,3) in Pallas was NEGATIVE with the
root cause isolated to Mosaic's small-matmul throughput (~35 TF/s at
K=N<=512, under half of XLA's direct-conv emitter). That record is only
as good as its currency: libtpu drift already moved the big-matmul
ceiling +17% between rounds 1 and 4 (122 -> 143 TF/s). Run this whenever
libtpu updates; if the winograd/direct ratio crosses 1.0 anywhere, reopen
the kernel.

Run on TPU:  python scratch/wino_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unet_implementations_tpu.kernels.winograd import (
    winograd_conv_s2d,
    transform_weights,  # noqa: F401 — imported to fail fast on API drift
)
from unet_implementations_tpu.models.s2d import conv_s2d


def time_chained(fn, x, iters=10):
    y = fn(x)
    y.block_until_ready()
    y = x
    start = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    float(jnp.mean(y[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - start) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    b = 32
    # (name, s2d grid, dense cin, dense cout) — the shapes of the r2 table
    shapes = [
        ("128ch@128^2", 64, 128, 128),
        ("256ch@64^2", 32, 256, 256),
        ("512ch@32^2", 16, 512, 512),
    ]
    for name, hw, cin, cout in shapes:
        x = jax.random.normal(
            jax.random.key(0), (b, hw, hw, 4 * cin), jnp.bfloat16)
        k = jax.random.normal(
            jax.random.key(1), (3, 3, cin, cout), jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        kb = k.astype(jnp.bfloat16)
        bb = bias.astype(jnp.bfloat16)

        def direct(x, kb=kb, bb=bb, cin=cin):
            y = conv_s2d(x, kb, bb)
            return y[..., : 4 * cin] if y.shape[-1] >= 4 * cin else jnp.tile(
                y, (1, 1, 1, (4 * cin) // y.shape[-1] + 1))[..., : 4 * cin]

        def wino(x, kb=kb, bb=bb, cin=cin):
            y = winograd_conv_s2d(x, kb, bb)
            return y[..., : 4 * cin] if y.shape[-1] >= 4 * cin else jnp.tile(
                y, (1, 1, 1, (4 * cin) // y.shape[-1] + 1))[..., : 4 * cin]

        td = time_chained(jax.jit(direct), x) * 1e3
        try:
            tw = time_chained(jax.jit(wino), x) * 1e3
            ratio = td / tw
            verdict = "REOPEN" if ratio > 1.0 else "still closed"
            print(f"{name:14s}: direct {td:7.2f} ms   wino {tw:7.2f} ms   "
                  f"direct/wino {ratio:4.2f}x -> {verdict}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s}: direct {td:7.2f} ms   wino FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
