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
def test_bench_multichip_harness(tmp_path, capsys, monkeypatch):
    """--multichip harness: 1-chip vs full-mesh legs both run, the artifact
    lands with per-chip rates and scaling efficiency. CPU-mesh numbers are
    meaningless; the schema and the plumbing are what a real slice needs."""
    import jax

    assert jax.device_count() == 8
    monkeypatch.setenv("BENCH_IMG_SIZE", "64")
    monkeypatch.setenv("BENCH_TRAIN_BATCH", "2")
    monkeypatch.setenv("BENCH_INFER_BATCH", "2")

    import bench

    out_path = tmp_path / "MULTICHIP_BENCH.json"
    result = bench.run_multichip(out_path=str(out_path))
    on_disk = json.loads(out_path.read_text())
    assert on_disk == result
    assert result["n_chips"] == 8
    assert result["single_chip"]["n_chips"] == 1
    assert result["full_mesh"]["n_chips"] == 8
    assert result["full_mesh"]["train_batch"] == 16  # 2 per chip * 8
    eff = result["scaling_efficiency"]
    assert eff["inference"] > 0 and eff["train"] > 0
    # stdout contract: last line is the JSON payload
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == result


def test_assert_baseline_tolerance_from_file(tmp_path, capsys):
    """The guard margin lives IN the baseline artifact (VERDICT r4 #8): a
    measurement above value*(1-tolerance) passes, below it exits 1."""
    import bench

    base = {
        "value": 100.0,
        "secondary": {"train_step_images_per_sec_per_chip": 50.0},
        "tolerance": 0.10,
    }
    path = tmp_path / "BENCH_baseline.json"
    path.write_text(json.dumps(base))
    # within margin: 10% drop is the floor, 9% drop passes
    bench.assert_baseline({"inference": 91.0, "train": 45.5}, str(path))
    # beyond margin on either metric: exit 1
    with pytest.raises(SystemExit) as ei:
        bench.assert_baseline({"inference": 89.0, "train": 50.0}, str(path))
    assert ei.value.code == 1
    with pytest.raises(SystemExit) as ei:
        bench.assert_baseline({"inference": 100.0, "train": 44.0}, str(path))
    assert ei.value.code == 1


def test_committed_baseline_has_tolerance():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_baseline.json")) as f:
        base = json.load(f)
    assert 0 < base["tolerance"] < 0.5


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
