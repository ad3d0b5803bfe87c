"""End-to-end fp8 inference probe (VERDICT r4, continues r3 #1).

The direct-conv probe showed fp8_e5m2 +23% at the dominant s2dL0 shape.
This measures the REAL model: b128 inference throughput for each fp8
policy vs the bf16 baseline, plus output drift (argmax agreement + prob
delta) on a shared batch. Policies are trace-time env vars, so each
variant is a fresh process-level setting — we re-jit per variant.

Run: python scratch/fp8_e2e_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import time_chained
from unet_implementations_tpu.data.synthetic import synthetic_batch
from unet_implementations_tpu.models.unet import unet_6stage
from unet_implementations_tpu.ops.tuning import inference_jit


def build_infer(model, params):
    @inference_jit
    def step(img):
        out = model.apply({"params": params}, img, deterministic=True)
        return out.astype(jnp.bfloat16) * 0.01

    return step


def main():
    print(f"devices: {jax.devices()}", flush=True)
    size, b = 512, 128
    model = unet_6stage(dtype=jnp.bfloat16)
    img = jnp.asarray(synthetic_batch(1, b, size=size)["image"], jnp.bfloat16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16)
    )["params"]

    # Reference logits for drift measurement (small batch, real init).
    small = img[:8]
    ref_logits = None

    variants = [
        ("bf16 baseline", None, None),
        ("fp8_e5m2 all", "all", "e5m2"),
        ("fp8_e5m2 grid>=128", "128", "e5m2"),
        ("fp8_e5m2 grid>=192 (s2dL0 only)", "192", "e5m2"),
        ("fp8_e4m3 all", "all", "e4m3"),
        ("fp8_e4m3 grid>=128", "128", "e4m3"),
    ]
    for name, policy, dt in variants:
        if policy is None:
            os.environ.pop("UNET_TPU_CONV_FP8", None)
        else:
            os.environ["UNET_TPU_CONV_FP8"] = policy
            os.environ["UNET_TPU_CONV_FP8_DTYPE"] = dt
        step = build_infer(model, params)
        try:
            ms = time_chained(step, img, iters=10) * 1e3
        except Exception as e:  # noqa: BLE001 — a failed lowering is a result
            print(f"{name:32s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        logits = jax.jit(
            lambda p, x: model.apply({"params": p}, x, deterministic=True)
        )(params, small).astype(jnp.float32)
        if ref_logits is None:
            ref_logits = logits
            drift = ""
        else:
            agree = float(
                (jnp.argmax(logits, -1) == jnp.argmax(ref_logits, -1)).mean())
            mad = float(jnp.abs(logits - ref_logits).mean())
            mx = float(jnp.abs(logits - ref_logits).max())
            drift = f"  argmax agree {agree:.5f}  |dlogit| mean {mad:.4f} max {mx:.3f}"
        print(f"{name:32s}: {ms:7.2f} ms/b{b} = {b / ms * 1e3:6.1f} img/s{drift}",
              flush=True)


if __name__ == "__main__":
    main()
