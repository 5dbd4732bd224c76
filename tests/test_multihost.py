"""2-process jax.distributed localhost test: distributed BA over a global
mesh spanning processes must match the single-host solution (SURVEY.md §4;
BASELINE.json north star "scaling efficiency at 2 hosts" requires this
execution path to exist and be correct).

Spawns two fresh interpreters (the current process already owns a JAX
backend and cannot re-initialize as a distributed process) running
scripts/multihost_ba_worker.py, then asserts both ranks' parity reports.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"mh_{r}.json" for r in range(2)]
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    for r in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "scripts", "multihost_ba_worker.py"),
                    "--rank", str(r), "--nprocs", "2",
                    "--port", str(port), "--out", str(outs[r]),
                ],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    stderr = {}
    try:
        for r, p in enumerate(procs):
            _, err = p.communicate(timeout=480)
            stderr[r] = err
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")

    for r, p in enumerate(procs):
        assert p.returncode == 0, (
            f"rank {r} exited {p.returncode}\n{stderr[r][-3000:]}"
        )

    for r, out in enumerate(outs):
        rep = json.loads(out.read_text())
        assert rep["n_global_devices"] == 8
        assert rep["n_local_shards"] == 4
        assert rep["ok"], f"rank {r} parity failed: {rep}"
