"""2-process jax.distributed smoke test (VERDICT r1 item 9).

Exercises the multi-host recipe documented in docs/SCALING.md on a CPU
"cluster": two OS processes, two virtual devices each, per-host read
shards aligned locally, counts merged with a cross-process collective.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("UNIMPLEMENTED" in out
                                  or "not supported" in out.lower()):
            pytest.skip(f"jax.distributed unsupported here: {out[-400:]}")
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"[multihost:{pid}] ok" in out
