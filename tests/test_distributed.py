"""REAL multi-process (DCN) data parallelism, not a simulation.

Spawns two OS processes, each owning 2 virtual CPU devices;
``parallel/distributed.py::maybe_initialize_distributed`` wires the
coordinator + Gloo collectives (the code path a multi-host TPU pod uses —
SURVEY §2.8/§5.8; the reference has no distributed runtime at all), the
global mesh spans all 4 devices, and one data-parallel train step on a
``jax.make_array_from_process_local_data`` global batch must produce the
SAME loss as the unsharded full-batch program (asserted inside each worker,
``tests/_dist_worker.py``). Complements the loader's host-shard contract
tests (test_data.py): this one runs the actual cross-process collectives.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    # Close-then-rebind race: another process could steal the port before
    # worker 0's coordinator binds it. Acceptable for this suite (serial
    # runner); a collision fails loudly in the worker output, not silently.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_unsharded():
    port = _free_port()
    worker = REPO / "tests" / "_dist_worker.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert "dp-across-processes loss == unsharded loss" in out, out[-2000:]
