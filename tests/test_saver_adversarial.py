"""Adversarial ballot tests — the negative cases docs/SECURITY_NOTES.md
relies on (round-1 VERDICT items 6/7: SAVER mix-and-match, sn tampering,
slot-mass shifting must all reject)."""

import numpy as np

from vote_saver_tpu.protocol import phases, marshal as M, saver
from vote_saver_tpu.refimpl import curves as rc


def _verify(election, proof_blob, pinput_blob, ct_blob) -> bool:
    return phases.verify_ballot(
        proof_blob, pinput_blob, ct_blob, election["vk_eid"], election["vk_crs"]
    )


def test_honest_ballots_verify(election):
    for proof, pinput, ct, _sn in election["ballots"]:
        assert _verify(election, proof, pinput, ct)


def test_mixed_proof_ct_different_votes_rejects(election):
    # voter 0 voted 5, voter 2 voted 17: proof_0 x ct_2 must fail check (1)
    p0, pi0, _ct0, _ = election["ballots"][0]
    _p2, _pi2, ct2, _ = election["ballots"][2]
    assert not _verify(election, p0, pi0, ct2)


def test_mixed_proof_ct_same_vote_verifies(election):
    # voters 0 and 1 both voted 5: the mixed pair verifies — the documented
    # benign case (docs/SECURITY_NOTES.md §3): equivalent to an honest ballot
    # for the same candidate, requires knowing the vote.
    p0, pi0, _ct0, _ = election["ballots"][0]
    _p1, _pi1, ct1, _ = election["ballots"][1]
    assert _verify(election, p0, pi0, ct1)


def test_sn_tamper_rejects(election):
    # flipping any bit of the sn slice inside the primary input breaks the
    # proof statement (sn is a public wire) -> check (1) fails
    proof, pinput, ct, _sn = election["ballots"][0]
    vals = M.de_scalar_vector(pinput)
    vals = list(vals)
    vals[1] = (vals[1] + 1) % (1 << 254)  # sn occupies slots 1..2 after eid
    tampered = M.ser_scalar_vector(vals)
    assert not _verify(election, proof, tampered, ct)


def test_slot_mass_shift_rejects(election):
    # moving one vote-unit from slot i to slot j (keeping the aggregate sum)
    # must fail ciphertext well-formedness (check 2)
    proof, pinput, ct_blob, _sn = election["ballots"][0]
    ct = M.de_ct(ct_blob)
    vk = M.de_groth16_vk(election["vk_crs"])
    p_bases = saver.message_bases(vk, len(ct.points) - 2)
    pts = list(ct.points)
    # c_5 -= P_5 ; c_17 += P_17  (shift the mass from the real vote slot)
    pts[1 + 5] = rc.g1_add(pts[1 + 5], rc.g1_neg(p_bases[5]))
    pts[1 + 17] = rc.g1_add(pts[1 + 17], p_bases[17])
    shifted = M.ser_ct(saver.Ciphertext(pts))
    assert not _verify(election, proof, pinput, shifted)


def test_ct_rerandomized_replay_same_sn_verifies_but_chain_rejects(election):
    # an adversary CAN rerandomize and replay a ballot (check 1/2 preserved);
    # the sn is unchanged, so the chain's sn-uniqueness map rejects it.  The
    # off-chain verifier accepting it is by design (rerandomization is a
    # feature, reference common.hpp:1143-1145).
    from vote_saver_tpu.utils.rng import FrRandom

    proof_blob, pinput, ct_blob, sn = election["ballots"][0]
    spk = M.de_saver_pk(election["pk_eid"])
    pk = M.de_groth16_pk(election["pk_crs"])
    proof = M.de_proof(proof_blob)
    ct = M.de_ct(ct_blob)
    rng = FrRandom(0xAD5E)
    ct2, proof2 = saver.rerandomize(spk, pk.delta_g2, ct, proof, [rng() for _ in range(3)])
    ct2_blob, proof2_blob = M.ser_ct(ct2), M.ser_proof(proof2)
    assert ct2_blob != ct_blob and proof2_blob != proof_blob
    assert _verify(election, proof2_blob, pinput, ct2_blob)
    # same sn -> double-vote rejection on-chain (exercised in test_chain.py)
