"""Real multi-process distribution (SURVEY.md §5.8): two CPU processes, one
global mesh, gloo collectives.

The worker script below is launched twice (process_id 0/1, local
coordinator); each process owns 4 virtual CPU devices, builds only ITS HALF
of the scenario batch, and drives the GSPMD and shard_map+psum paths through
parallel/distributed.py + parallel/mesh.py. Each worker independently checks
its shard of the sharded result against a process-local single-device solve
of the full problem, and the psum'd global stats against that reference.
"""

import os
import subprocess
import sys
import socket

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_solve():
    port = _free_port()
    env = dict(os.environ)
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub conftest's
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} OK" in out, f"worker {pid} output:\n{out[-4000:]}"
