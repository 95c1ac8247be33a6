"""Mobile embedding shims (native/vs_android.c over native/vs_mobile.c):
compile the JNI bridge against the test-only jni_compat header, then drive
all three mobile entry points — generateVoterKeypair, generateVote,
verifyTally — through a fake JNIEnv, the vs_client pipes, and the JSON
service, exactly the reference's Android surface
(/root/reference/bin/cli/src/android.cpp:75-130).  The produced ballot is
then verified back in the Python SDK.  The ObjC bridge (vs_ios.m /
devote_ios.h, reference ios.mm:23-100) shares vs_mobile, so this exercises
its marshalling core too; the NSData wrappers themselves need an Apple rig.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

_NATIVE = pathlib.Path(__file__).resolve().parent.parent / "native"
_REPO = _NATIVE.parent


@pytest.fixture(scope="module")
def smoke_bin(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc")
    assert cc, "no C compiler on this rig"
    out = tmp_path_factory.mktemp("vs_mobile") / "mobile_smoke"
    subprocess.run(
        [cc, "-O2", "-I", str(_NATIVE / "jni_compat"), "-o", str(out),
         str(_NATIVE / "mobile_smoke.c"), str(_NATIVE / "vs_android.c"),
         str(_NATIVE / "vs_mobile.c"), str(_NATIVE / "vs_client.c")],
        check=True, capture_output=True, text=True,
    )
    return out


def _blob_dir(tmp_path, election) -> tuple[pathlib.Path, dict]:
    """Write the election fixture's blobs (and a freshly computed tally)
    as raw files for the C driver."""
    from vote_saver_tpu.protocol import phases

    cts = [b[2] for b in election["ballots"]]
    dec_proof, voting_res = phases.tally_admin_phase(
        2, cts, election["sk_eid"], election["vk_eid"],
        election["pk_crs"], election["vk_crs"],
    )
    d = tmp_path / "blobs"
    d.mkdir()
    blobs = dict(
        tree=election["tree"], rt=election["rt"], eid=election["eid"],
        sk=election["voters"][0][1], pk_eid=election["pk_eid"],
        pk_crs=election["pk_crs"], vk_crs=election["vk_crs"],
        vk_eid=election["vk_eid"], dec_proof=dec_proof,
        voting_res=voting_res,
    )
    for i, ct in enumerate(cts):
        blobs[f"ct{i}"] = ct
    for name, blob in blobs.items():
        (d / name).write_bytes(blob)
    return d, blobs


def _run_smoke(smoke_bin, tmp_path, election, do_vote: int):
    data_dir, _ = _blob_dir(tmp_path, election)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    ref = election["ballots"][0]  # same wire shapes as the JNI-made ballot
    env = dict(os.environ)
    env.setdefault("VSTPU_COMPILE_CACHE", str(_REPO / ".jax_cache"))
    proc = subprocess.run(
        [str(smoke_bin), sys.executable, str(data_dir), str(out_dir),
         str(len(ref[0])), str(len(ref[1])), str(len(ref[2])),
         str(len(ref[3])), str(len(election["ballots"])), str(do_vote)],
        capture_output=True, text=True, timeout=1800, cwd=str(_REPO), env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "MOBILE-OK" in proc.stdout
    return out_dir


def test_mobile_keypair_and_tally(smoke_bin, tmp_path, election):
    """Fast leg: keypair generation + tally verification through JNI."""
    _run_smoke(smoke_bin, tmp_path, election, do_vote=0)


@pytest.mark.slow
def test_mobile_generate_vote(smoke_bin, tmp_path, election):
    """Full leg: the prover runs in the service child behind the JNI call;
    the resulting ballot must verify in the Python SDK."""
    out_dir = _run_smoke(smoke_bin, tmp_path, election, do_vote=1)
    from vote_saver_tpu import sdk

    keys = sdk.AdminKeys(
        r1cs_proving_key=election["pk_crs"],
        r1cs_verification_key=election["vk_crs"],
        public_key=election["pk_eid"],
        verification_key=election["vk_eid"],
    )
    ballot = sdk.Ballot(
        proof=(out_dir / "proof").read_bytes(),
        primary_input=(out_dir / "pinput").read_bytes(),
        ct=(out_dir / "ct").read_bytes(),
        sn=(out_dir / "sn").read_bytes(),
    )
    assert sdk.verify_vote(keys, ballot), "JNI-produced ballot failed VERGRTH16"
