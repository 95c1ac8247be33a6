"""Reference-scale shapes (round-1 VERDICT item 6).

The reference's own integration test is depth 5 / 32 voters with one timed
vote phase (/root/reference/bin/cli/test/cli.cpp:39-85).  That test passes
the admin's ElGamal key blobs into the voter-sk slot (cli.cpp:79-81) so it
never exercises a real registered voter's Merkle membership — SURVEY.md §4
flags this as a bug not to replicate: here voter 17 votes with its own
registered secret key and the ballot must verify.
"""

import time

import pytest


@pytest.mark.slow
def test_depth5_32voters_timed_vote_phase(capsys):
    from vote_saver_tpu.protocol import phases
    from vote_saver_tpu.utils.rng import FrRandom

    depth, eid_bits = 5, 64
    rng = FrRandom(0x515)
    voters = [phases.init_voter_phase(i, rng) for i in range(1 << depth)]
    assert len(voters) == 32

    pk_crs, vk_crs, pk_eid, _sk_eid, vk_eid = phases.init_admin_phase_generate_keys(
        depth, eid_bits, rng
    )
    eid_blob, rt_blob, tree_blob = phases.init_admin_phase_generate_data(
        depth, eid_bits, [v[0] for v in voters], rng
    )

    idx, vote = 17, 3
    t0 = time.perf_counter()
    (proof_b, pinput_b, ct_b, sn_b) = phases.vote_phase(
        depth, eid_bits, idx, vote, tree_blob, rt_blob, eid_blob,
        voters[idx][1], pk_eid, pk_crs, vk_crs, rng,
    )
    dt_ms = (time.perf_counter() - t0) * 1e3
    # the reference's instrumented print (main.cpp:456 / cli.cpp:84)
    with capsys.disabled():
        print(f"\nVote Phase Time_execution: {dt_ms:.0f}ms (depth=5, 32 voters)")

    assert len(proof_b) == 192
    assert phases.verify_ballot(proof_b, pinput_b, ct_b, vk_eid, vk_crs)
    # sn is the 2-element packed slice of the primary input (wire parity)
    assert len(sn_b) == 8 + 2 * 32
