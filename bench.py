"""Benchmark: 512×512 images/sec/chip on the flagship 6-stage UNet.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Primary metric is inference throughput at 512² in bf16 (north-star target:
>=2000 images/sec/chip on v5e — BASELINE.md). ``vs_baseline`` is the ratio
against that 2000 img/s/chip target. The train-step rate (reference GPU
baseline ~54 img/s, BASELINE.md) is reported on stderr as a secondary metric.

Modes:
  python bench.py                      # single JSON line (driver contract)
  python bench.py --assert-baseline    # + regression guard vs BENCH_baseline.json
                                       #   (tolerance read from that file)
  python bench.py --multichip          # 1-chip vs N-chip scaling efficiency,
                                       #   writes MULTICHIP_BENCH.json
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def init_devices_or_bail(timeout_s: float = 300.0):
    """Initialize the JAX backend with a watchdog.

    Over the TPU tunnel, backend init HANGS (not errors) during an outage —
    observed 2026-08-17 — which would hang the whole driver bench run. Probe
    ``jax.devices()`` on a daemon thread; on timeout or error, print an
    honest zero-valued JSON line naming the outage (the last committed
    on-hardware measurement lives in BENCH_baseline.json) and exit.
    """
    import threading

    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", timeout_s))
    result = {}

    def probe():
        try:
            result["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report any backend failure
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        return result["devices"]
    why = result.get(
        "error", f"backend init timed out after {timeout_s:.0f}s (tunnel outage)"
    )
    log(f"TPU backend unavailable: {why}")
    last = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_baseline.json")) as f:
            base = json.load(f)
        last = {
            "last_measured_inference": base.get("value"),
            "last_measured_train":
                base.get("secondary", {}).get(
                    "train_step_images_per_sec_per_chip"),
        }
    except Exception:
        pass
    print(json.dumps({
        "metric": "unet6_512px_bf16_inference_throughput",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "error": f"not measured — {why}; last committed on-hardware "
                 "measurement is in BENCH_baseline.json",
        **last,
    }), flush=True)
    os._exit(1)  # daemon thread may be stuck in C — skip interpreter teardown


def time_chained(step_fn, x0, iters=10):
    """Time a jitted ``x -> x``-shaped step by chaining each iteration's
    input on the previous output and fetching a scalar at the end.

    This is the only honest method on this runtime: blocking on large
    outputs returns prematurely, and repeated identical calls can be
    memoized — a data-dependent chain forces real sequential execution.
    """
    y = step_fn(x0)
    float(jnp.mean(y))  # compile + warmup, host-fetch barrier
    y = x0
    start = time.perf_counter()
    for _ in range(iters):
        y = step_fn(y)
    float(jnp.mean(y))
    return (time.perf_counter() - start) / iters


def measure(devices):
    """Chained inference + train-step throughput over exactly ``devices``.

    Returns per-chip rates; with >1 device the batch shards on a 1-D data
    mesh built over that device list (so ``--multichip`` can compare a
    1-chip mesh against the full mesh on the same hardware).
    """
    from unet_implementations_tpu.data.synthetic import synthetic_batch
    from unet_implementations_tpu.models.unet import unet_6stage
    from unet_implementations_tpu.training import (
        create_train_state,
        make_segmentation_train_step,
        sgd_nesterov,
    )

    n_chips = len(devices)

    # Per-chip batch sizes; with n chips the global batch scales and shards
    # over a 1-D data mesh (parallel/mesh.py) — XLA rides ICI. Env overrides
    # exist so the multi-chip path can be smoke-tested on a virtual CPU mesh
    # (tests/test_bench.py) — benchmark numbers always use the defaults.
    size = int(os.environ.get("BENCH_IMG_SIZE", "512"))
    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", "32")) * n_chips
    # Throughput-optimal serving batch (measured sweep, docs/PERFORMANCE.md:
    # 422 img/s at b32 → 504 img/s at b128; b192/b256 are no better).
    infer_batch = int(os.environ.get("BENCH_INFER_BATCH", "128")) * n_chips
    model = unet_6stage(dtype=jnp.bfloat16)
    host = synthetic_batch(0, batch_size, size=size)
    image = jnp.asarray(host["image"], jnp.bfloat16)
    mask = jnp.asarray(host["mask"])
    infer_image = jnp.asarray(
        synthetic_batch(1, infer_batch, size=size)["image"], jnp.bfloat16
    )

    params = model.init(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16)
    )["params"]

    mesh = None
    if n_chips > 1:
        from jax.sharding import Mesh

        from unet_implementations_tpu.parallel import replicate, shard_batch

        mesh = Mesh(np.asarray(devices), ("data",))
        image = shard_batch(image, mesh)
        mask = shard_batch(mask, mesh)
        infer_image = shard_batch(infer_image, mesh)
        params = replicate(params, mesh)
    elif len(jax.devices()) > 1:
        # Single-chip leg of --multichip on a multi-device backend: pin
        # arrays to devices[0] so the comparison is 1 chip vs N chips.
        image, mask, infer_image, params = jax.device_put(
            (image, mask, infer_image, params), devices[0])

    from unet_implementations_tpu.ops.tuning import inference_jit

    @inference_jit
    def infer_step(img):
        # logits are (B, H, W, 3) like the input image — feed back to chain
        out = model.apply({"params": params}, img, deterministic=True)
        return out.astype(jnp.bfloat16) * 0.01

    log(f"compiling inference ({n_chips} chip{'s' if n_chips > 1 else ''})...")
    try:
        dt = time_chained(infer_step, infer_image, iters=10)
    except Exception as e:  # e.g. HBM pressure on a busy chip — don't lose the round
        log(f"inference at b{infer_batch} failed ({type(e).__name__}); "
            f"falling back to b{batch_size}")
        infer_batch = batch_size
        infer_image = image
        dt = time_chained(infer_step, infer_image, iters=10)
    infer_ips = infer_batch / dt / n_chips
    log(f"inference: {dt * 1e3:.2f} ms/batch{infer_batch} -> "
        f"{infer_ips:.1f} images/sec/chip")

    # Secondary: full train step (fwd+loss+bwd+sgd update). Chained state
    # serializes iterations; final scalar fetch is the barrier.
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.bfloat16),
        sgd_nesterov(),
    )
    if mesh is not None:
        from unet_implementations_tpu.parallel import replicate

        state = replicate(state, mesh)
    elif len(jax.devices()) > 1:
        state = jax.device_put(state, devices[0])
    train_step = make_segmentation_train_step(donate=False)
    batch = {"image": image, "mask": mask}
    rng = jax.random.key(1)
    log("compiling train step...")
    state, loss = train_step(state, batch, rng)  # compile + warmup
    float(loss)
    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, batch, rng)
    float(loss)
    dt_train = (time.perf_counter() - start) / iters
    train_ips = batch_size / dt_train / n_chips
    log(f"train step: {dt_train * 1e3:.2f} ms/batch{batch_size} -> "
        f"{train_ips:.1f} images/sec/chip (reference GPU baseline ~54)")

    return {
        "inference": float(infer_ips),
        "train": float(train_ips),
        "inference_batch": infer_batch,
        "train_batch": batch_size,
        "n_chips": n_chips,
    }


def main():
    devices = init_devices_or_bail()
    log(f"devices: {devices}")
    m = measure(devices)

    print(json.dumps({
        "metric": "unet6_512px_bf16_inference_throughput",
        "value": round(m["inference"], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(m["inference"] / 2000.0, 4),
        "secondary": {
            "train_step_images_per_sec_per_chip": round(m["train"], 2),
            "train_vs_reference_gpu_54": round(m["train"] / 54.0, 2),
            "inference_batch_size": m["inference_batch"],
            "train_batch_size": m["train_batch"],
            "n_chips": m["n_chips"],
        },
    }))
    return {"inference": m["inference"], "train": m["train"]}


def run_multichip(out_path=None):
    """One-command multi-chip scaling measurement (VERDICT r4 #4).

    Runs the sharded chained benches on a 1-chip mesh and on the full
    N-chip mesh, then writes ``MULTICHIP_BENCH.json`` with per-chip
    throughput and scaling efficiency (per-chip N-chip rate ÷ per-chip
    1-chip rate; 1.0 = perfect linear scaling over ICI). On a virtual CPU
    mesh the numbers are meaningless but the harness and artifact schema
    are exercised (tests/test_bench.py).
    """
    devices = init_devices_or_bail()
    n = len(devices)
    log(f"multichip bench over {n} device(s): {devices}")
    single = measure(devices[:1])
    result = {
        "metric": "unet6_512px_bf16_multichip_scaling",
        "n_chips": n,
        "single_chip": {k: round(v, 2) for k, v in single.items()},
        "platform": devices[0].platform,
    }
    if n > 1:
        full = measure(devices)
        result["full_mesh"] = {k: round(v, 2) for k, v in full.items()}
        result["scaling_efficiency"] = {
            "inference": round(full["inference"] / single["inference"], 4),
            "train": round(full["train"] / single["train"], 4),
        }
    else:
        result["full_mesh"] = None
        result["scaling_efficiency"] = None
        result["note"] = "single chip visible — scaling not measurable"
    if out_path is None:
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "MULTICHIP_BENCH.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))
    return result


def assert_baseline(measured, path):
    """Fail (exit 1) if either throughput regressed more than the baseline
    file's ``tolerance`` (fraction; the guard floor is ``value*(1-tol)``) —
    the perf-regression guard for refactors (structural guards live in
    tests/test_perf_guards.py; numbers need real hardware). The margin
    lives IN BENCH_baseline.json so the guard and the committed number stay
    one artifact; update both when a speedup lands."""
    with open(path) as f:
        base = json.load(f)
    tolerance = float(base.get("tolerance", 0.10))
    failures = []
    checks = {
        "inference": base["value"],
        "train": base["secondary"]["train_step_images_per_sec_per_chip"],
    }
    for key, ref in checks.items():
        floor = ref * (1 - tolerance)
        log(f"assert-baseline {key}: measured {measured[key]:.1f} vs "
            f"baseline {ref:.1f} (floor {floor:.1f}, tolerance {tolerance:.0%})")
        if measured[key] < floor:
            failures.append(f"{key}: {measured[key]:.1f} < {floor:.1f}")
    if failures:
        log("BASELINE REGRESSION: " + "; ".join(failures))
        sys.exit(1)
    log("assert-baseline: ok")


if __name__ == "__main__":
    if "--multichip" in sys.argv:
        run_multichip()
        sys.exit(0)
    measured = main()
    if "--assert-baseline" in sys.argv:
        idx = sys.argv.index("--assert-baseline")
        # Default resolves against the script dir (not CWD), matching
        # init_devices_or_bail's resolution of the same file.
        path = (sys.argv[idx + 1] if idx + 1 < len(sys.argv)
                else os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "BENCH_baseline.json"))
        assert_baseline(measured, path)
