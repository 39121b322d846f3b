"""True multi-PROCESS distributed test (SURVEY.md §4: validate multi-host
without a pod). Two OS processes x 4 virtual CPU devices form the global
8-device ('pairs',) mesh via the real jax.distributed coordinator; each
feeds its local_batch_slice and verifies its addressable result shards.

This covers what the in-process 8-device tests cannot: the coordinator
handshake, process-local array assembly, and cross-process device
visibility of parallel/distributed.py.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_registration():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert any("proc 0: OK" in o for o in outs)
    assert any("proc 1: OK" in o for o in outs)
