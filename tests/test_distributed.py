"""DCN seam: two jax.distributed processes on localhost, one global mesh.

The CI stand-in for multi-slice TPU scale-out (SURVEY.md §2.9 DCN row):
spawns two fresh CPU processes, forms an 8-device global mesh spanning them,
and runs the REAL programs across the boundary over Gloo: dense top-k, the
full hybrid serving program (sketch candidates -> exact rescore -> ICI
merges -> device RRF, verified against the single-device fused program),
and one sharded train step (DP+TP+SP) asserting a finite loss.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "dcn_two_process_demo.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_search():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                SCRIPT,
                "--process-id",
                str(pid),
                "--num-processes",
                "2",
                "--coordinator",
                f"localhost:{port}",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-2000:]}"
        assert f"DCN-OK process={pid}/2" in out
        # The real programs crossed the boundary: hybrid serving (rescore +
        # RRF collectives) and one sharded train step with a finite loss.
        assert "hybrid-top10 verified" in out
        assert "train-loss=" in out
