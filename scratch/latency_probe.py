"""Serving LATENCY at small batch (b1..b32), per-mode folds (inference ON).

Complements bench.py's throughput headline (b128): a latency-sensitive
server wants the ms-per-request curve, and the batch-1 point is the number
the spatial-sharding path (parallel/spatial.py) exists to improve on a
multi-chip slice. Chained timing per docs/PERFORMANCE.md methodology.

Run: python scratch/latency_probe.py  (TPU; ~2 min incl. compiles)
"""

import time

import jax
import jax.numpy as jnp

from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import unet_6stage
from unet_implementations_tpu.ops.tuning import inference_jit


def time_chained(fn, x, iters=20):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    # data-dependent scalar fetch defeats the tunnel's lying timers
    float(jnp.sum(y[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    model = unet_6stage(dtype=jnp.bfloat16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    )["params"]

    @inference_jit
    def step(img):
        out = model.apply({"params": params}, img, deterministic=True)
        return out.astype(jnp.bfloat16) * 0.01

    for b in (1, 2, 4, 8, 16, 32):
        x = jnp.asarray(
            synthetic_batch(b, b, size=512)["image"], jnp.bfloat16)
        dt = time_chained(step, x)
        print(f"b{b:<3d}: {dt * 1e3:8.2f} ms/batch   "
              f"{dt * 1e3 / b:7.2f} ms/img   {b / dt:8.1f} img/s")


if __name__ == "__main__":
    main()
