"""Scheduled-bucket MSM: native vs numpy scheduler parity, oracle
correctness, orphan spill, and the madd doubling-corner fallback.

The scheduled MSM runs on the 16-bit pallas limb layout while the test rig
pins 32-bit limbs (conftest), so the checks run in a subprocess with a fresh
interpreter (tests/_msm_sched_check.py).  Covers round-1 VERDICT item 6:
the doubling-corner fallback actually executes.
"""

import pathlib
import subprocess
import sys

import pytest

_CHECK = pathlib.Path(__file__).parent / "_msm_sched_check.py"


def test_msm_sched_suite():
    import os

    env = dict(
        os.environ,
        VSTPU_LIMB_BITS="16",
        VSTPU_PALLAS_INTERPRET="1",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(_CHECK)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "ALL-OK" in proc.stdout
    for label in (
        "native-multi",
        "python-parity",
        "orphan-spill",
        "pallas-tiny",
        "doubling-fallback",
    ):
        assert f"CHECK {label} ok" in proc.stdout
