"""AOT serving artifact vs live jit: throughput parity check (b128, 512²).

Two questions the serving story hasn't measured:
1. Does the exported StableHLO artifact replay at live-jit speed?
2. The live path compiles with the 64M scoped-VMEM option
   (ops/tuning.py::inference_jit, +1.4% measured); ServingModel replays
   under plain jax.jit — does the artifact lose that tuning, and does
   passing the option at load time recover it?

Chained timing per docs/PERFORMANCE.md methodology.
Run: PYTHONPATH=/root/repo python scratch/serving_artifact_probe.py
"""

import tempfile
import time

import jax
import jax.numpy as jnp

from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import unet_6stage
from unet_implementations_tpu.ops.tuning import (
    INFERENCE_COMPILER_OPTIONS,
    inference_jit,
)
from unet_implementations_tpu.serving.export import load_exported, save_exported

B, SIZE = 128, 512


def time_chained(fn, x, iters=10):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    float(jnp.sum(y[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices())
    model = unet_6stage(dtype=jnp.bfloat16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    )["params"]
    x = jnp.asarray(synthetic_batch(1, B, size=SIZE)["image"], jnp.bfloat16)

    @inference_jit
    def live(img):
        out = model.apply({"params": params}, img, deterministic=True)
        return out.astype(jnp.bfloat16) * 0.01

    dt = time_chained(live, x)
    print(f"live jit (64M vmem)     : {dt * 1e3:7.2f} ms/b{B} = "
          f"{B / dt:7.1f} img/s")

    with tempfile.TemporaryDirectory() as tmp:
        save_exported(tmp, model, params, batch_size=B, img_size=SIZE,
                      platforms=("tpu",))
        sm = load_exported(tmp)

        def chainable(call):
            def fn(img):
                return call(sm.params, img).astype(jnp.bfloat16) * 0.01
            return fn

        art_plain = jax.jit(chainable(sm.exported.call))
        dt = time_chained(art_plain, x)
        print(f"artifact, plain jit     : {dt * 1e3:7.2f} ms/b{B} = "
              f"{B / dt:7.1f} img/s")

        art_tuned = jax.jit(chainable(sm.exported.call),
                            compiler_options=INFERENCE_COMPILER_OPTIONS)
        dt = time_chained(art_tuned, x)
        print(f"artifact, 64M vmem jit  : {dt * 1e3:7.2f} ms/b{B} = "
              f"{B / dt:7.1f} img/s")


if __name__ == "__main__":
    main()
