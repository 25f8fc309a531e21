"""Real multi-process (multi-controller) test: 2 processes x 4 CPU devices,
collectives over gloo TCP — the DCN story of SURVEY.md §5.8(8). The
reference has "no multi-node testing of any kind" (SURVEY.md §4); this
framework ships one: the same dist ops used on the 8-virtual-device mesh
run here across real process boundaries."""

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


def test_two_process_gloo_dist_ops():
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu in-process
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(__file__),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        # reap and collect whatever the workers printed before the hang
        for p in procs:
            try:
                out, _ = p.communicate(timeout=30)
                outs.append(out or "")
            except Exception:
                outs.append("<no output captured>")
        pytest.fail("multi-process workers timed out:\n" + "\n---\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "MP-OK" in out, f"worker {pid} missing MP-OK:\n{out[-4000:]}"
