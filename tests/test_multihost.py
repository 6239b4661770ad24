"""Multi-host (jax.distributed) smoke coverage.

Runs tools/multihost_smoke.py: two localhost processes initialize
jax.distributed via tnsh.parallel.mesh.init_distributed, build a
make_mesh_2d (dcn=2, ici=2) mesh over 4 virtual CPU devices, and check an
exact Fr psum across both mesh axes on every process (VERDICT round-1
item 7: the multi-host scaffolding must be exercised, not dead code).
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_field_psum():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_smoke.py"),
         "--port", str(_free_port())],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "multihost smoke: OK" in out.stdout
