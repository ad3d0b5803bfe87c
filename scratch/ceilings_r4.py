"""Re-baseline the chip ceilings (VERDICT round-3 #4).

The round-3 fp8 probe measured the 8192^3 bf16 matmul at 154.9 TF/s vs the
122 TF/s pinned in docs/PERFORMANCE.md (round 1) — +27% drift (tunnel
conditions or libtpu). Every speed-of-light argument rests on those
constants, so this script re-measures the full ceiling set in one run:

  - 8192^3 matmul: bf16, int8 (raw dot ceiling)
  - best-case 3x3 convs: 512ch@64^2, 512ch@32^2, 384->128@256^2 (the s2d
    level-0 shape), 128ch@128^2
  - HBM streams: pure elementwise (x*a+b) and an IN-style reduce+normalize

Chained timing throughout (the tunnel memoizes repeated identical
dispatches — docs/PERFORMANCE.md methodology note).

Run:  python scratch/ceilings_r4.py
"""

import time

import jax
import jax.numpy as jnp

DOTN = (((1,), (0,)), ((), ()))


def chain(step, x0, iters=20):
    y = step(x0)
    y.block_until_ready()
    y = x0
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    return (time.perf_counter() - start) / iters


def time_matmul(n, in_dtype, acc_dtype, iters=20):
    a = jax.random.normal(jax.random.key(0), (n, n), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.float32)
    if in_dtype == jnp.int8:
        a, b = (a * 10).astype(jnp.int8), (b * 10).astype(jnp.int8)
    else:
        a, b = a.astype(in_dtype), b.astype(in_dtype)

    @jax.jit
    def step(a):
        out = jax.lax.dot_general(a, b, DOTN, preferred_element_type=acc_dtype)
        if in_dtype == jnp.int8:
            return (out % 21 - 10).astype(jnp.int8)
        return (out * 1e-3).astype(in_dtype)

    dt = chain(step, a, iters)
    return 2 * n**3 / dt / 1e12


def time_conv(b, hw, cin, cout, iters=20, dtype=jnp.bfloat16):
    x = jax.random.normal(jax.random.key(0), (b, hw, hw, cin), dtype)
    k = jax.random.normal(jax.random.key(1), (3, 3, cin, cout), dtype)

    @jax.jit
    def step(x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # map back to the input shape for chaining
        if cout >= cin:
            nxt = y[..., :cin]
        else:
            nxt = jnp.tile(y, (1, 1, 1, (cin + cout - 1) // cout))[..., :cin]
        return (nxt * 1e-2).astype(dtype)

    dt = chain(step, x, iters)
    flops = 2 * b * hw * hw * 9 * cin * cout
    return dt * 1e3, flops / dt / 1e12


def time_stream(nbytes_each=2 << 30, iters=20):
    """Elementwise stream: read + write of a big f32 array."""
    n = nbytes_each // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def step(x):
        return x * 1.000001 + 1e-7

    dt = chain(step, x, iters)
    return 2 * nbytes_each / dt / 1e9  # GB/s (1 read + 1 write)


def time_in_style(iters=20):
    """IN-style stats+normalize on a (32,128,128,128) f32 tensor."""
    x = jnp.ones((32, 128, 128, 128), jnp.float32)

    @jax.jit
    def step(x):
        s1 = jnp.sum(x, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(x * x, axis=(1, 2), keepdims=True)
        n = x.shape[1] * x.shape[2]
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)

    dt = chain(step, x, iters)
    nbytes = x.size * 4
    return 2 * nbytes / dt / 1e9  # effective GB/s (1 read + 1 write min)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print("--- matmul ceilings ---", flush=True)
    for name, dt_in, dt_acc in [("bf16", jnp.bfloat16, jnp.float32),
                                ("int8", jnp.int8, jnp.int32),
                                ("fp8_e5m2", jnp.float8_e5m2, jnp.float32)]:
        try:
            tf = time_matmul(8192, dt_in, dt_acc)
            print(f"8192^3 {name:9s}: {tf:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"8192^3 {name:9s}: {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
    print("--- conv ceilings (bf16, 3x3, b32) ---", flush=True)
    for name, hw, cin, cout in [
        ("512ch@64^2 512->512", 64, 512, 512),
        ("512ch@32^2 512->512", 32, 512, 512),
        ("s2d L0   384->128@256^2", 256, 384, 128),
        ("128ch@128^2 128->128", 128, 128, 128),
        ("256ch@64^2 256->256", 64, 256, 256),
    ]:
        ms, tf = time_conv(32, hw, cin, cout)
        print(f"{name:26s}: {ms:7.2f} ms  {tf:6.1f} TF/s", flush=True)
    print("--- HBM streams ---", flush=True)
    print(f"elementwise 2GB stream : {time_stream():6.0f} GB/s", flush=True)
    print(f"IN-style stats+norm    : {time_in_style():6.0f} GB/s eff",
          flush=True)


if __name__ == "__main__":
    main()
