import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Train batch re-sweep post-fold: b32..b96 x remat, + grad-accum legs.

VERDICT round-2 #8: the b32 HBM ceiling and the remat-neutral result
(docs/PERFORMANCE.md) were measured BEFORE the upsample folds removed tens
of GB of activation traffic; b48/b64 (+ remat) may now fit and scale.
Chained timing, real optimizer update (SGD+Nesterov), donated state.

Run on TPU:  python scratch/batch_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def run_leg(batch, remat, accum=1, iters=8):
    from unet_implementations_tpu.data.synthetic import synthetic_batch
    from unet_implementations_tpu.models.unet import UNet
    from unet_implementations_tpu.training import (
        create_train_state,
        make_segmentation_train_step,
        sgd_nesterov,
    )
    from unet_implementations_tpu.training.steps import (
        make_accum_train_step,
        make_segmentation_loss_fn,
    )

    model = UNet(dtype=jnp.bfloat16, remat=remat)
    host = synthetic_batch(0, batch, size=512)
    data = {
        "image": jnp.asarray(host["image"], jnp.bfloat16),
        "mask": jnp.asarray(host["mask"]),
    }
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
        sgd_nesterov(),
    )
    if accum > 1:
        step = make_accum_train_step(
            make_segmentation_loss_fn(), accum, donate=True)
    else:
        step = make_segmentation_train_step(donate=True)
    rng = jax.random.key(1)
    tag = f"b{batch} remat={int(remat)} accum={accum}"
    try:
        state, loss = step(state, data, rng)
        float(loss)
    except Exception as e:  # noqa: BLE001 — OOM legs are the point
        print(f"{tag:28s}: FAILED {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return None
    start = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, data, rng)
    float(loss)
    dt = (time.perf_counter() - start) / iters
    ips = batch / dt
    print(f"{tag:28s}: {dt * 1e3:8.1f} ms/step  {ips:7.1f} img/s/chip",
          flush=True)
    return ips


def main():
    print(f"devices: {jax.devices()}", flush=True)
    legs = [
        (32, False, 1),
        (32, True, 1),
        (48, False, 1),
        (48, True, 1),
        (64, False, 1),
        (64, True, 1),
        (96, True, 1),
        (64, False, 2),   # grad accum: b32 footprint, b64 optimizer batch
        (128, False, 4),
    ]
    for batch, remat, accum in legs:
        run_leg(batch, remat, accum)


if __name__ == "__main__":
    main()
