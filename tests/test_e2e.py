"""End-to-end election tests mirroring the reference's two automated shapes
(SURVEY.md §4): the JS test.js full election (here at depth 2) and the C++
cli.cpp timed vote phase — plus the checks the reference lacks (ballot
verification, double-vote sn determinism, tamper rejection)."""

import numpy as np
import pytest

from vote_saver_tpu.params import MSG_SIZE
from vote_saver_tpu.protocol import marshal as M
from vote_saver_tpu.protocol import phases
from vote_saver_tpu.utils.rng import FrRandom

DEPTH = 2
EID_BITS = 64


def test_full_election_tally(election):
    e = election
    cts = [b[2] for b in e["ballots"]]
    dec_proof, voting_res = phases.tally_admin_phase(
        DEPTH, cts, e["sk_eid"], e["vk_eid"], e["pk_crs"], e["vk_crs"]
    )
    counts = M.de_scalar_vector(voting_res)
    assert len(counts) == MSG_SIZE
    assert counts[5] == 2 and counts[17] == 1 and sum(counts) == 3
    # voting result blob: 8-byte count + 25 * 32-byte BE counts
    assert len(voting_res) == 8 + MSG_SIZE * 32
    assert phases.tally_voter_phase(
        DEPTH, cts, e["vk_eid"], e["pk_crs"], e["vk_crs"], voting_res, dec_proof
    )
    # forged tally must be rejected
    forged = list(counts)
    forged[5], forged[17] = 1, 2
    assert not phases.tally_voter_phase(
        DEPTH, cts, e["vk_eid"], e["pk_crs"], e["vk_crs"],
        M.ser_scalar_vector(forged), dec_proof,
    )


def test_ballot_verifies_like_vergrth16(election):
    e = election
    proof_blob, pinput_blob, ct_blob, sn_blob = e["ballots"][0]
    assert len(proof_blob) == 192
    assert phases.verify_ballot(proof_blob, pinput_blob, ct_blob, e["vk_eid"], e["vk_crs"])
    # swapping in another ballot's ciphertext must fail
    other_ct = e["ballots"][2][2]
    assert not phases.verify_ballot(proof_blob, pinput_blob, other_ct, e["vk_eid"], e["vk_crs"])


def test_sn_deterministic_per_voter_session(election):
    """The double-vote defence: same (eid, sk) -> same sn regardless of vote
    (what SaverAdmin.check_ballot's sn-uniqueness map relies on)."""
    e = election
    again = phases.vote_phase_batch(
        DEPTH, EID_BITS, [0], [9], e["tree"], e["rt"], e["eid"],
        [e["voters"][0][1]], e["pk_eid"], e["pk_crs"], e["vk_crs"], e["rng"],
    )
    assert again[0][3] == e["ballots"][0][3]
    # different voters' sns differ
    assert e["ballots"][0][3] != e["ballots"][1][3]


def test_ballot_blobs_parse(election):
    e = election
    proof_blob, pinput_blob, ct_blob, sn_blob = e["ballots"][1]
    pinput = M.de_scalar_vector(pinput_blob)
    assert len(pinput) == 5  # eid(1) + sn(2) + rt(2) packed
    sn = M.de_scalar_vector(sn_blob)
    assert sn == pinput[1:3]
    ct = M.de_ct(ct_blob)
    assert len(ct.points) == MSG_SIZE + 2
