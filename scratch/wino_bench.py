"""One-command Winograd re-check (docs/PERFORMANCE.md negative-results
section points here).

The round-2 verdict on Winograd F(2,3) in Pallas was NEGATIVE with the
root cause isolated to Mosaic's small-matmul throughput (~35 TF/s at
K=N<=512, under half of XLA's direct-conv emitter). That record is only
as good as its currency: libtpu drift already moved the big-matmul
ceiling +17% between rounds 1 and 4 (122 -> 143 TF/s). Run this whenever
libtpu updates; if the winograd/direct ratio crosses 1.0 anywhere, reopen
the kernel.

Timing harness: identical to scratch/fp8_conv_probe.py — each step feeds
its (sliced/tiled-back) output into the next input and blocks once at the
end. On this runtime shorter chains with per-step host fetches measure
dispatch, not compute (observed 203 ms for a 2.5 ms conv).

Run on TPU:  python scratch/wino_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unet_implementations_tpu.kernels.winograd import winograd_conv_s2d
from unet_implementations_tpu.models.s2d import conv_s2d


def time_conv(conv_fn, b, hw_s2d, cin, cout, iters=20):
    """Chained timing of an s2d conv: (b, hw, hw, 4cin) -> same shape."""
    x = jax.random.normal(
        jax.random.key(0), (b, hw_s2d, hw_s2d, 4 * cin), jnp.float32
    ).astype(jnp.bfloat16)
    k = jax.random.normal(
        jax.random.key(1), (3, 3, cin, cout), jnp.float32
    ).astype(jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def step(x):
        y = conv_fn(x, k, bias)
        if cout >= cin:
            nxt = y[..., : 4 * cin]
        else:
            reps = (4 * cin + y.shape[-1] - 1) // y.shape[-1]
            nxt = jnp.tile(y, (1, 1, 1, reps))[..., : 4 * cin]
        return (nxt * 1e-2).astype(jnp.bfloat16)

    try:
        y = step(x)
        y.block_until_ready()
    except Exception as e:  # noqa: BLE001 — a failed lowering is a result
        return None, f"{type(e).__name__}: {str(e)[:110]}"
    y = x
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    return (time.perf_counter() - start) / iters * 1e3, None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    b = 32
    # (name, s2d grid = dense/2, dense cin, dense cout) — the r2 table shapes
    shapes = [
        ("128ch@128^2", 64, 128, 128),
        ("256ch@64^2", 32, 256, 256),
        ("512ch@32^2", 16, 512, 512),
    ]
    for name, hw, cin, cout in shapes:
        td, err_d = time_conv(conv_s2d, b, hw, cin, cout)
        tw, err_w = time_conv(winograd_conv_s2d, b, hw, cin, cout)
        if err_d or err_w:
            print(f"{name:14s}: direct {err_d or f'{td:7.2f} ms'}   "
                  f"wino {err_w or f'{tw:7.2f} ms'}", flush=True)
            continue
        ratio = td / tw
        verdict = "REOPEN" if ratio > 1.0 else "still closed"
        print(f"{name:14s}: direct {td:7.2f} ms   wino {tw:7.2f} ms   "
              f"direct/wino {ratio:4.2f}x -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
