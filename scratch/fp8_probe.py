"""fp8 / int8 matmul throughput probe at the UNet's contraction shapes.

The LAST unmeasured reduced-precision lever (VERDICT round-2 #2): is there
ANY sub-bf16 compute speedup on this chip? The s2d formulation already turns
the hot convs into lane-aligned contractions, so the honest proxy is
``dot_general`` at the im2col shapes of the mid decoder levels plus a big
square matmul for the chip's raw dot ceiling.

Shapes probed (im2col of a 3x3 conv at batch 32, 512^2 model):
  decoder_0: x@16^2,  512 -> 512  =>  (32*16*16,  9*512) @ (9*512,  512)
  decoder_1: x@32^2,  512 -> 256  =>  (32*32*32,  9*512) @ (9*512,  256)
  mid conv : 512ch@32^2 (the 88 TF/s bf16 measured ceiling shape)
  big      : 8192^3 (raw chip ceiling; bf16 measured 122 TF/s round 1)

Each shape is timed in bf16, fp8(e4m3 x e4m3 -> f32), and int8 x int8 -> i32.
Chained timing (output feeds next input through a cheap cast) so the runtime
cannot memoize or return early.

Run:  python scratch/fp8_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

DOTN = (((1,), (0,)), ((), ()))


def time_dot(m, k, n, in_dtype, acc_dtype, iters=20):
    key = jax.random.key(0)
    a = jax.random.normal(key, (m, k), jnp.float32)
    b = jax.random.normal(jax.random.key(1), (k, n), jnp.float32)
    if in_dtype == jnp.int8:
        a = (a * 10).astype(jnp.int8)
        b = (b * 10).astype(jnp.int8)
    else:
        a = a.astype(in_dtype)
        b = b.astype(in_dtype)

    @jax.jit
    def step(a):
        out = jax.lax.dot_general(
            a, b, DOTN, preferred_element_type=acc_dtype
        )
        # Feed a slice of the output back as the next input (cast through
        # f32 scaling to keep int8 in range) — forces sequential execution.
        nxt = out[:, :k] if n >= k else jnp.tile(out, (1, (k + n - 1) // n))[:, :k]
        if in_dtype == jnp.int8:
            return (nxt % 21 - 10).astype(jnp.int8)
        return (nxt * 1e-3).astype(in_dtype)

    try:
        y = step(a)
        y.block_until_ready()
    except Exception as e:  # noqa: BLE001 — unsupported dtype on this backend
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    y = a
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    dt = (time.perf_counter() - start) / iters
    tflops = 2 * m * k * n / dt / 1e12
    return tflops, None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [
        ("dec0 16^2 512->512", 32 * 16 * 16, 9 * 512, 512),
        ("dec1 32^2 512->256", 32 * 32 * 32, 9 * 512, 256),
        ("mid 32^2 512->512", 32 * 32 * 32, 9 * 512, 512),
        ("enc 64^2 256->256", 32 * 64 * 64, 9 * 256, 256),
        ("big 8192^3", 8192, 8192, 8192),
    ]
    dtypes = [
        ("bf16", jnp.bfloat16, jnp.float32),
        ("fp8_e4m3", jnp.float8_e4m3fn, jnp.float32),
        ("fp8_e5m2", jnp.float8_e5m2, jnp.float32),
        ("int8", jnp.int8, jnp.int32),
    ]
    rows = []
    for name, m, k, n in shapes:
        row = {"shape": name}
        for dname, din, dacc in dtypes:
            tf, err = time_dot(m, k, n, din, dacc)
            row[dname] = round(tf, 1) if tf else err
            print(f"{name:22s} {dname:9s}: "
                  f"{tf and f'{tf:.1f} TF/s' or err}", flush=True)
        rows.append(row)
    print("\nsummary table (TF/s):")
    hdr = ["shape"] + [d[0] for d in dtypes]
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r.get(h, "")) for h in hdr))


if __name__ == "__main__":
    main()
