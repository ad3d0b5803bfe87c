"""Direct fp8 convolutions at the model's mid-level shapes (VERDICT r3 #1).

The round-3 probe showed fp8_e5m2 dots beat bf16 dots by 15-35% at the
model's im2col contraction shapes — but those dots run at 20-46 TF/s,
BELOW the 58-88 TF/s XLA's direct conv emitter sustains on the same math,
so "fp8 dot beats bf16 dot" says nothing about the model yet. The decisive
experiment: `lax.conv_general_dilated` with fp8 inputs (f32 accumulation)
vs the bf16 direct conv at the three mid-level shapes, chained timing.

If direct fp8 convs win meaningfully -> prototype one mid level in the
model; if they lose or don't lower -> closure paragraph in PERFORMANCE.md
and the reduced-precision story is measured-complete.

Run:  python scratch/fp8_conv_probe.py
"""

import time

import jax
import jax.numpy as jnp


def time_conv(b, hw, cin, cout, in_dtype, iters=20):
    x = jax.random.normal(jax.random.key(0), (b, hw, hw, cin), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (3, 3, cin, cout), jnp.float32)
    if in_dtype == jnp.int8:
        x, k = (x * 10).astype(jnp.int8), (k * 10).astype(jnp.int8)
        acc = jnp.int32
    else:
        x, k = x.astype(in_dtype), k.astype(in_dtype)
        acc = jnp.float32

    @jax.jit
    def step(x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)
        if cout >= cin:
            nxt = y[..., :cin]
        else:
            nxt = jnp.tile(y, (1, 1, 1, (cin + cout - 1) // cout))[..., :cin]
        if in_dtype == jnp.int8:
            return (nxt % 21 - 10).astype(jnp.int8)
        return (nxt * 1e-2).astype(in_dtype)

    try:
        y = step(x)
        y.block_until_ready()
    except Exception as e:  # noqa: BLE001 — unsupported lowering is a result
        return None, None, f"{type(e).__name__}: {str(e)[:110]}"
    y = x
    start = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    y.block_until_ready()
    dt = (time.perf_counter() - start) / iters
    flops = 2 * b * hw * hw * 9 * cin * cout
    return dt * 1e3, flops / dt / 1e12, None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [
        ("mid2 128ch@128^2", 128, 128, 128),
        ("mid3 256ch@64^2", 64, 256, 256),
        ("mid4 512ch@32^2", 32, 512, 512),
        ("dec1 512->256@32^2", 32, 512, 256),
        ("s2dL0 384->128@256^2", 256, 384, 128),
    ]
    dtypes = [("bf16", jnp.bfloat16), ("fp8_e4m3", jnp.float8_e4m3fn),
              ("fp8_e5m2", jnp.float8_e5m2), ("int8", jnp.int8)]
    rows = []
    for name, hw, cin, cout in shapes:
        row = {"shape": name}
        for dname, dt in dtypes:
            ms, tf, err = time_conv(32, hw, cin, cout, dt)
            row[dname] = f"{tf:.1f}" if tf else "ERR"
            msg = f"{ms:7.2f} ms  {tf:6.1f} TF/s" if tf else err
            print(f"{name:22s} {dname:9s}: {msg}", flush=True)
        rows.append(row)
    print("\nsummary (TF/s):")
    hdr = ["shape"] + [d[0] for d in dtypes]
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r.get(h, "")) for h in hdr))


if __name__ == "__main__":
    main()
