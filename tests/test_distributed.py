"""Two-process jax.distributed bring-up (round-2 VERDICT item 5).

Spawns two fresh interpreters (4 virtual CPU devices each) that join one
global runtime through `sharded.init_distributed()` and run the scheduled
MSM over a mesh spanning both processes — the comm-backend layout BASELINE
configs 4-5 (multi-host) require.  Subprocesses because jax.distributed can
only be initialized once per process and must happen before backends load.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_CHECK = pathlib.Path(__file__).parent / "_dist_check.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_scheduled_msm():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            VSTPU_DISTRIBUTED="1",
            VSTPU_COORD=f"127.0.0.1:{port}",
            VSTPU_NPROC="2",
            VSTPU_PROCID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(_CHECK)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"DIST-OK proc={pid} nproc=2" in out, out
