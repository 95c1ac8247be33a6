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
def test_host_fallback_arm_matches_device_finalize(monkeypatch):
    """The axon-flake fallback (_finalize_host) must produce the same
    ballots as the device finalize graph for the same drawn scalars."""
    import random

    from vote_saver_tpu.params import R
    from vote_saver_tpu.protocol import ballot_dev, saver
    from vote_saver_tpu.refimpl import curves as rc

    rng = random.Random(5)
    B, n = 2, 25
    g1p = lambda k: [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(k)]
    g2p = lambda k: [rc.g2_mul(rc.g2_gen, rng.randrange(R)) for _ in range(k)]
    pk = groth16.ProvingKey(
        num_primary=2, num_vars=8, domain=8,
        a_pts=[], b1_pts=[], b2_pts=[], h_pts=[], l_pts=[],
        alpha_g1=g1p(1)[0], beta_g1=g1p(1)[0], beta_g2=g2p(1)[0],
        delta_g1=g1p(1)[0], delta_g2=g2p(1)[0], coo={}, num_constraints=5,
    )
    gvk = groth16.VerificationKey(
        alpha_g1=pk.alpha_g1, beta_g2=pk.beta_g2, gamma_g2=g2p(1)[0],
        delta_g2=pk.delta_g2, ic=g1p(n + 3),
    )
    spk = saver.SaverPublicKey(s_pts=g1p(n), x_psi=g1p(1)[0], y_pts=g1p(n))
    outs = dict(
        a=co.g1_to_device(g1p(B)), b1=co.g1_to_device(g1p(B)),
        b2=co.g2_to_device(g2p(B)), l=co.g1_to_device(g1p(B)),
        h=co.g1_to_device(g1p(B)),
    )
    outs = {k: jax.device_put(v) for k, v in outs.items()}
    votes = [3, 17]

    dev = ballot_dev.finalize_ballots_device(pk, spk, gvk, outs, votes, FrRandom(0xD1F))
    monkeypatch.setenv("VSTPU_FINALIZE_HOST", "1")
    host = ballot_dev.finalize_ballots_device(pk, spk, gvk, outs, votes, FrRandom(0xD1F))
    assert len(dev) == len(host) == B
    for (ct_d, p_d), (ct_h, p_h) in zip(dev, host):
        assert ct_d.points == ct_h.points
        assert (p_d.a, p_d.b, p_d.c) == (p_h.a, p_h.b, p_h.c)


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
