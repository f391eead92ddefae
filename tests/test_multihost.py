"""2-process ``jax.distributed`` smoke test (CPU, gloo collectives).

The reference's only parallelism is single-process OpenMP
(raytracer/Raytracer.h:442-458).  Our replacement claims multi-HOST scaling
via ``jax.distributed`` + mesh collectives (SURVEY.md section 5, "Distributed
communication backend"); this test actually runs that bootstrap: two OS
processes, one CPU device each, a global (1, 2) mesh whose photon axis spans
the processes, and one full sharded train step (eye all_gather, deposit
psum, gradient all-reduce) through ``scripts/multihost_worker.py``.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process: the axis must span
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; partial output: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        assert "multihost OK" in out, out[-4000:]
