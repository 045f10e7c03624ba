"""2-process jax.distributed test of the multi-host training path.

Spawns two REAL processes (tests/multihost_worker.py), each with 4 virtual
CPU devices, that rendezvous through jax.distributed (Gloo), build the
global 8-device mesh, assemble a globally-sharded batch from per-host
shards, run sharded train steps, save an orbax checkpoint cooperatively,
and restore it through Trainer.restore's process_count>1 re-wrap branch.

This is the multi-process analog of SURVEY.md §7 step 7's multi-host
config; everything else in the suite runs the 8-device mesh inside ONE
process, which cannot catch bugs in the host-local <-> global array
bridging or cooperative checkpoint I/O.
"""
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_save_restore(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}\n{out[-4000:]}"
        assert f"WORKER {i} OK" in out, out[-4000:]

    # the replicated loss scalar must be IDENTICAL across processes (same
    # global computation), both before and after the restore round-trip
    def losses(out):
        return [line.split()[1] for line in out.splitlines() if line.startswith("LOSS")]

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert len(l0) == 2 and l0 == l1, (l0, l1)
