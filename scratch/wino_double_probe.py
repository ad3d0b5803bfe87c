"""Winograd over the s2d-TRANSFORMED level-0 convs — the reopened lever.

The fixed round-4 re-check (scratch/wino_bench.py v2) showed Mosaic's
small-matmul throughput improved since round 2: the Pallas Winograd kernel
now beats the direct S2D conv 1.33-1.48x at 128ch/256ch shapes (it still
loses to XLA's DENSE direct conv at the mid levels, which is what the
model runs there — so mid levels stay closed).

The model-relevant question: level 0 (the dominant cost bucket, ~56% of
the b128 step) runs its convs AS s2d convs — 3x3 convs on the 256² s2d
grid with 128/384-channel kernels (multiples of 128!). Winograd can
execute THAT conv: treat the s2d conv as the "dense" conv, feed the
s2d-of-s2d tensor. MACs = 4/9 of the s2d conv's = 16/9 of the original
dense conv's — the minimum-MAC full-lane formulation round 2's "packed"
variant tried and XLA lowered badly; here Mosaic does the lowering.

Legs (b32 and b128, chained):
  enc0 conv1:  conv_s2d grid 256² ch 32->32   vs wino(s2d²) grid 128² ch 128->128
  dec4 conv0:  conv_s2d grid 256² ch 96->32   vs wino(s2d²) grid 128² ch 384->128
  enc0 conv0 is 3->32 (s2d 12->128, not 128-aligned) — ineligible, skip.

Run on TPU:  python scratch/wino_double_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unet_implementations_tpu.kernels.winograd import winograd_conv_s2d
from unet_implementations_tpu.models.s2d import conv_s2d


def chain(step, x, iters=20):
    try:
        y = step(x)
        y.block_until_ready()
    except Exception as e:  # noqa: BLE001
        return None, f"{type(e).__name__}: {str(e)[:110]}"
    y = x
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    return (time.perf_counter() - start) / iters * 1e3, None


def leg(name, b, cin_dense, cout_dense, grid_s2d=256):
    """Current path vs wino-double for one level-0 conv."""
    # current: conv_s2d on (b, 256, 256, 4*cin_dense)
    x1 = jax.random.normal(
        jax.random.key(0), (b, grid_s2d, grid_s2d, 4 * cin_dense),
        jnp.float32).astype(jnp.bfloat16)
    k1 = jax.random.normal(
        jax.random.key(1), (3, 3, cin_dense, cout_dense),
        jnp.float32).astype(jnp.bfloat16)
    b1 = jnp.zeros((cout_dense,), jnp.bfloat16)

    @jax.jit
    def direct(x):
        y = conv_s2d(x, k1, b1)  # (b, 256, 256, 4*cout)
        reps = (4 * cin_dense + y.shape[-1] - 1) // y.shape[-1]
        nxt = jnp.tile(y, (1, 1, 1, reps))[..., : 4 * cin_dense]
        return (nxt * 1e-2).astype(jnp.bfloat16)

    # wino-double: the s2d conv is a 3x3 conv at grid 256² with channels
    # (4cin -> 4cout); winograd executes it from the s2d² tensor
    # (b, 128, 128, 16*cin) with the s2d kernel (3, 3, 4cin, 4cout).
    cin_s, cout_s = 4 * cin_dense, 4 * cout_dense
    x2 = jax.random.normal(
        jax.random.key(0), (b, grid_s2d // 2, grid_s2d // 2, 4 * cin_s),
        jnp.float32).astype(jnp.bfloat16)
    k2 = jax.random.normal(
        jax.random.key(1), (3, 3, cin_s, cout_s), jnp.float32
    ).astype(jnp.bfloat16)
    b2 = jnp.zeros((cout_s,), jnp.bfloat16)

    @jax.jit
    def wino(x):
        y = winograd_conv_s2d(x, k2, b2)  # (b, 128, 128, 4*cout_s)
        reps = (4 * cin_s + y.shape[-1] - 1) // y.shape[-1]
        nxt = jnp.tile(y, (1, 1, 1, reps))[..., : 4 * cin_s]
        return (nxt * 1e-2).astype(jnp.bfloat16)

    td, ed = chain(direct, x1)
    tw, ew = chain(wino, x2)
    d = ed or f"{td:7.2f} ms"
    w = ew or f"{tw:7.2f} ms"
    r = f"   direct/wino {td / tw:4.2f}x" if (td and tw) else ""
    print(f"{name:28s} b{b:<4d}: direct {d}   wino {w}{r}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for b in (32, 128):
        leg("enc0 conv1 (32->32@512²)", b, 32, 32)
        leg("dec4 conv0 (96->32@512²)", b, 96, 32)


if __name__ == "__main__":
    main()
