"""Round-5 VERDICT #2: the whole-region Pallas kernel, measured standalone.

Compares the fused s2d ConvBlock tail (kernels/s2d_region.py) against the
XLA composition (jnp_tail == the live module path minus the cancelling conv
bias) at the enc0/dec4 shape (256², 4C=128), chained through data
dependencies. Also checks numeric agreement on-device.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.kernels.s2d_region import (
    fused_s2d_tail,
    jnp_tail,
)


def chained(fn, x0, iters=10):
    y = fn(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        y = fn(x)
        # chain: next input depends on previous output (scalar feedback)
        x = x0 + y[0, 0, 0, 0].astype(x0.dtype) * 1e-6
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    c = 32
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    scale1 = jax.random.uniform(ks[1], (c,), jnp.float32, 0.5, 1.5)
    bias1 = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[3], (3, 3, c, c), jnp.float32) * 0.2
    scale2 = jax.random.uniform(ks[4], (c,), jnp.float32, 0.5, 1.5)
    bias2 = jax.random.normal(ks[5], (c,), jnp.float32) * 0.1

    for b in (32, 128):
        x = jax.random.normal(ks[0], (b, 256, 256, 4 * c), jnp.bfloat16)

        xla = jax.jit(lambda a: jnp_tail(a, scale1, bias1,
                                         k2.astype(jnp.bfloat16),
                                         scale2, bias2))
        pal = jax.jit(lambda a: fused_s2d_tail(a, scale1, bias1,
                                               k2.astype(jnp.bfloat16),
                                               scale2, bias2))

        ref = np.asarray(xla(x), np.float32)
        got = np.asarray(pal(x), np.float32)
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
        t_x = chained(xla, x)
        t_p = chained(pal, x)
        print(
            f"b{b}: xla {t_x*1e3:7.2f} ms  pallas {t_p*1e3:7.2f} ms  "
            f"speedup {t_x/t_p:4.2f}x  rel-err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
