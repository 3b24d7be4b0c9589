"""TRUE two-process jax.distributed exercise (SURVEY §5.8): two OS
processes, a shared coordination service, a 4-device global CPU mesh,
cross-process psum + the sharded vocabulary 2-NN. This is the multi-host
path that single-process degradation tests cannot cover."""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(worker))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), coord],
        cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK p{i}" in out, out[-2000:]
        # the ENGINE itself ran on the global 2-process mesh with the
        # same decisions as single-device (SURVEY §5.8 end state)
        assert f"ENGINE_MULTIHOST_OK p{i}" in out, out[-2000:]
