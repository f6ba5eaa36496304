"""Cross-host (2-process) rehearsal: tracker hands keyframe deltas to a
mapper process, distributed BA solves SPMD across both processes' devices.

Spawns two fresh Python processes (jax.distributed over localhost grpc,
4 virtual CPU devices each -> an 8-device global mesh) running
examples/cross_host_worker.py.  This is the DCN half of the BASELINE.json
north star that the in-process mesh tests cannot cover.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_tracker_mapper_dist_ba():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "examples", "cross_host_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out}"
        assert f"CROSS_HOST_OK {i}" in out, f"proc {i}:\n{out}"
    assert "problem digest consistent" in outs[1]
    assert "applied delta" in outs[1]
