"""The C embedding client (native/vs_client.c): compile with the system C
compiler and drive the JSON-stdio service from a pure-C process — the
framework's linkable-embedding analog of the reference's wrapper.js +
cli.wasm pair (share/wasm/wrapper.js:8-75) and JNI/ObjC bridges
(android.cpp:75-130, ios.mm:23-100).  No Python runs in the demo binary's
process; the service is its child."""

import pathlib
import shutil
import subprocess
import sys

import pytest

_NATIVE = pathlib.Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    assert cc, "no C compiler on this rig"
    out = tmp_path_factory.mktemp("vs_client") / "demo_client"
    subprocess.run(
        [cc, "-O2", "-o", str(out),
         str(_NATIVE / "demo_client.c"), str(_NATIVE / "vs_client.c")],
        check=True, capture_output=True, text=True,
    )
    return out


def test_c_client_embeds_service(demo_bin):
    proc = subprocess.run(
        [str(demo_bin), sys.executable],
        capture_output=True, text=True, timeout=300,
        cwd=str(_NATIVE.parent),
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DEMO-OK" in proc.stdout
    assert "pk 32 bytes, sk 32 bytes" in proc.stdout
