"""Device ballot-finalization parity (protocol/ballot_dev.py): the batched
device graph for Groth16 blinding + SAVER encrypt + rerandomize must produce
BYTE-IDENTICAL ballots to the host tail under the same seeded rng (the
algebraic fold-in of rerandomization is derived in ballot_dev's docstring).

The MSM stage is pinned to the host oracle on both sides so this test
isolates the tail; the full device-MSM + device-tail composition runs in
tests/test_sharding.py::test_sharded_prover_matches_unsharded (slow) and on
hardware in bench.py (which verifies every ballot)."""

import jax
import numpy as np

from vote_saver_tpu.ops import curve_ops as co
from vote_saver_tpu.ops import limbs as lb
from vote_saver_tpu.params import fr_spec
from vote_saver_tpu.protocol import groth16, phases
from vote_saver_tpu.utils.rng import FrRandom


def _host_msms_as_device_outs(pk, w_mont, mesh=None):
    """prove_msms_device stand-in: host-native MSMs lifted to device coords."""
    h_std, w_std, sat = groth16._abc_h_w_fn(pk)(w_mont)
    h_np, w_np, sat_np = jax.device_get((h_std, w_std, sat))
    assert bool(np.all(sat_np))
    spec = fr_spec()
    w_ints = lb.limbs_to_ints(w_np, spec)
    h_ints = lb.limbs_to_ints(h_np, spec)
    a, b1, b2, l, h = groth16._msms_host_native(pk, list(w_ints), list(h_ints))
    outs = dict(
        a=co.g1_to_device(a),
        b1=co.g1_to_device(b1),
        b2=co.g2_to_device(b2),
        l=co.g1_to_device(l),
        h=co.g1_to_device(h),
    )
    return outs, w_np


import pytest


@pytest.mark.slow
def test_device_tail_matches_host_tail(election, monkeypatch):
    ctx = phases.prepare_vote_context(
        2, 64, election["tree"], election["rt"], election["eid"],
        election["pk_eid"], election["pk_crs"], election["vk_crs"],
    )
    idxs, votes = [0, 1], [4, 9]
    sks = [election["voters"][i][1] for i in idxs]

    host_ballots = phases.vote_with_context(ctx, idxs, votes, sks, FrRandom(0x77))

    monkeypatch.setattr(groth16, "prove_msms_device", _host_msms_as_device_outs)
    monkeypatch.setenv("VSTPU_DEVICE_TAIL", "1")
    dev_ballots = phases.vote_with_context(ctx, idxs, votes, sks, FrRandom(0x77))

    assert host_ballots == dev_ballots
    # and the device-tail ballots verify off-chain (belt and braces)
    for pb, ib, cb, _sb in dev_ballots:
        assert phases.verify_ballot(
            pb, ib, cb, election["vk_eid"], election["vk_crs"]
        )
