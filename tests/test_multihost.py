"""REAL >= 2-process jax.distributed validation (BASELINE config 5):
two OS processes, each with 2 virtual CPU devices, form one global
4-device mesh over the coordinator; a cross-process psum and a
distributed BA must succeed in both.

This is the DCN-topology analogue runnable on one machine — the same
`init_multihost` + `make_global_mesh` + dist_ba code path a TPU pod
uses (collectives ride ICI within a slice, DCN across hosts).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=here)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, f"proc {pid}:\n{out[-3000:]}"
    # both processes solved the same replicated problem
    c0 = outs[0].split("cost=")[1].split()[0]
    c1 = outs[1].split("cost=")[1].split()[0]
    assert abs(float(c0) - float(c1)) < 1e-3
