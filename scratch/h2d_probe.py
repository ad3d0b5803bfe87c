"""Measure host→device transfer bandwidth for the soak's per-batch payload.

The real train loop device_puts one (32, 512, 512, 3) uint8 batch (25.2 MB)
per step; the chained bench (bench.py) reuses a device-resident batch and so
never pays this. If the tunnel's H2D bandwidth is ~30-40 MB/s, the observed
steady-state soak step rate (~0.7-0.9 s/step vs the 0.19 s device compute)
is transfer-bound — a property of this sandbox's tunneled chip, not of the
loader (a real TPU-VM host feeds PCIe at GB/s).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

batch = np.zeros((32, 512, 512, 3), np.uint8)
mask = np.zeros((32, 512, 512), np.uint8)
print("devices:", jax.devices(), flush=True)

# warm up the path
x = jax.device_put(batch); jax.block_until_ready(x)

for name, payload in (("image 25.2MB", batch), ("mask 8.4MB", mask)):
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        x = jax.device_put(payload)
        jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n
    mb = payload.nbytes / 1e6
    print(f"H2D {name}: {dt*1e3:.1f} ms -> {mb/dt:.1f} MB/s", flush=True)

# and the float32 equivalent the pre-uint8 loader would have sent
f32 = np.zeros((32, 512, 512, 3), np.float32)
t0 = time.perf_counter()
for i in range(3):
    x = jax.device_put(f32)
    jax.block_until_ready(x)
dt = (time.perf_counter() - t0) / 3
print(f"H2D float32 100.7MB: {dt*1e3:.1f} ms -> {f32.nbytes/1e6/dt:.1f} MB/s",
      flush=True)
