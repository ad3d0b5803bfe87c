"""bench.py contract: one JSON line, and the multi-chip sharded path runs.

Uses the 8-device virtual CPU mesh (conftest) with tiny env-override shapes —
this exercises exactly the branch a real v5e-8 would take (1-D data mesh,
sharded batches, replicated params/state).
"""

import json
import os
import subprocess
import sys

import pytest


def test_bench_outage_bail():
    """During a TPU-tunnel outage the watchdog must print ONE honest
    zero-valued JSON line carrying the last committed on-hardware numbers
    (so a driver-recorded outage is distinguishable from a regression),
    and exit non-zero."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_INIT_TIMEOUT_S"] = "0.0001"  # guarantees the watchdog fires
    r = subprocess.run(
        [sys.executable, "bench.py"], cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 1
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0
    assert "not measured" in payload["error"]
    assert payload["last_measured_inference"] > 0
    assert payload["last_measured_train"] > 0


@pytest.mark.slow
def test_bench_multichip_smoke(tmp_path, capsys, monkeypatch):
    import jax

    assert jax.device_count() == 8
    monkeypatch.setenv("BENCH_IMG_SIZE", "64")
    monkeypatch.setenv("BENCH_TRAIN_BATCH", "2")
    monkeypatch.setenv("BENCH_INFER_BATCH", "2")

    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    payload = json.loads(out[0])
    assert payload["unit"] == "images/sec/chip"
    assert payload["value"] > 0
    sec = payload["secondary"]
    assert sec["n_chips"] == 8
    assert sec["inference_batch_size"] == 16  # 2 per chip * 8
    assert sec["train_step_images_per_sec_per_chip"] > 0
