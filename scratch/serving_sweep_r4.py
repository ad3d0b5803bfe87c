"""Post-fold serving-batch + scoped-VMEM re-sweep (round 4).

The b128 serving batch and the 64 MB scoped-VMEM default were chosen
BEFORE the upsample folds removed tens of GB of HBM traffic (round-1
sweep: b128 best, b192 cliff "diagnosed-to-the-limit"; VMEM 64M +0.8%).
Traffic changed -> re-derive both choices from current measurements.

Run on TPU:  python scratch/serving_sweep_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import unet_6stage


def chain(step, x, iters=10):
    y = step(x)
    y.block_until_ready()
    y = x
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    return (time.perf_counter() - start) / iters * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    size = 512
    model = unet_6stage(dtype=jnp.bfloat16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16)
    )["params"]

    def build(vmem_kib):
        opts = {}
        if vmem_kib:
            opts["xla_tpu_scoped_vmem_limit_kib"] = vmem_kib

        @jax.jit
        def step(img):
            out = model.apply({"params": params}, img, deterministic=True)
            return out.astype(jnp.bfloat16) * 0.01

        if vmem_kib:
            step = jax.jit(
                lambda img: (model.apply(
                    {"params": params}, img, deterministic=True
                ).astype(jnp.bfloat16) * 0.01),
                compiler_options=opts,
            )
        return step

    # batch sweep at the current default VMEM (64M, ops/tuning.py)
    for b in (96, 128, 160, 192, 256):
        img = jnp.asarray(
            synthetic_batch(1, b, size=size)["image"], jnp.bfloat16)
        try:
            ms = chain(build(65536), img)
            print(f"b{b:<4d} vmem64M : {ms:7.2f} ms = "
                  f"{b / ms * 1e3:6.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b{b:<4d} vmem64M : FAILED {type(e).__name__}", flush=True)
        del img

    # VMEM sweep at the winning batch region
    for vk, label in ((0, "default"), (32768, "32M"), (65536, "64M"),
                      (98304, "96M"), (131072, "128M")):
        img = jnp.asarray(
            synthetic_batch(1, 128, size=size)["image"], jnp.bfloat16)
        try:
            ms = chain(build(vk), img)
            print(f"b128 vmem{label:8s}: {ms:7.2f} ms = "
                  f"{128 / ms * 1e3:6.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b128 vmem{label:8s}: FAILED {type(e).__name__}", flush=True)
        del img


if __name__ == "__main__":
    main()
