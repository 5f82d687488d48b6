"""Multi-process distributed runtime test (SURVEY.md §4: emulate multi-node
with jax.distributed single-host multi-process CPU).

Spawns 2 OS processes, each with 4 fake CPU devices, connected through a
localhost coordination service; both solve the same sharded IK batch over a
global (data=4, seed=2) mesh spanning the processes and compare their
addressable shards against a single-process reference.  This exercises
``parallel/distributed.py:initialize`` and the cross-process global-array
assembly in ``parallel/mesh.py:ik_sharded`` for real — the in-process
fake-device GSPMD tests (test_sharding.py) cannot.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_ik():
    port = _free_port()
    env = dict(os.environ)
    # The worker sets its own JAX_PLATFORMS/XLA_FLAGS; scrub pytest's.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(i), "2",
                          str(port)], env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "poses checked OK" in out
