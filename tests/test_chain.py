"""On-chain layer parity: the contract state machines + vi ballot blobs.

Mirrors the reference's on-chain acceptance flow (SURVEY.md §3.5): chunked
ballot upload -> commit_ballot -> VERGRTH16 -> admin eid/sn checks ->
callback — including the double-vote rejection the reference only exercises
on a live cluster."""

import pytest

from vote_saver_tpu.chain import ballot_blob as bb
from vote_saver_tpu.chain.contracts import ChainError, SaverAdmin, SaverVoter
from vote_saver_tpu.protocol import marshal as M

CHUNK = 15000  # 30000 hex chars per tonos-cli message (notebook cell 7)


def _make_vi(e, ballot_idx):
    proof_b, pinput_b, ct_b, _ = e["ballots"][ballot_idx]
    pinput = M.de_scalar_vector(pinput_b)
    eid_bits = M.unpack_field_elements_to_bits(pinput[:1], 64)
    sn_bits = M.unpack_field_elements_to_bits(pinput[1:3], 255)
    rt_bits = M.unpack_field_elements_to_bits(pinput[3:5], 255)
    return bb.build_vi(proof_b, e["vk_crs"], e["pk_eid"], ct_b, eid_bits, sn_bits,
                       rt_bits, vk_eid_blob=e["vk_eid"])


@pytest.fixture(scope="module")
def chain(election):
    admin = SaverAdmin(owner="admin_key")
    # CRS chunked upload
    for off in range(0, len(election["pk_crs"]), CHUNK):
        admin.update_crs_pk("admin_key", election["pk_crs"][off : off + CHUNK])
    # (update_crs_pk resets context each call — lifecycle below rebuilds it,
    # matching the reference where CRS upload precedes session setup)
    admin.update_crs_vk("admin_key", election["vk_crs"])
    assert b"".join(admin.get_crs_pk()) == election["pk_crs"]

    vi0, sec0 = _make_vi(election, 0)
    admin.set_eid("admin_key", vi0[sec0.eid_begin : sec0.sn_begin],
                  election["pk_eid"], election["vk_eid"])
    admin.set_rt("admin_key", election["rt"])
    voters = [SaverVoter(f"voter{i}_key", admin, f"voter{i}_addr") for i in range(3)]
    admin.add_voters("admin_key", [v.address for v in voters])
    admin.init_voting_session("admin_key")
    return admin, voters


def test_session_lifecycle_guards(election):
    admin = SaverAdmin(owner="k")
    with pytest.raises(ChainError) as e:
        admin.init_voting_session("k")
    assert e.value.code == 106  # no voters registered
    with pytest.raises(ChainError) as e:
        admin.update_crs_pk("not_owner", b"x")
    assert e.value.code == 103
    admin.set_eid("k", b"eid1", b"", b"")
    with pytest.raises(ChainError) as e:
        admin.set_eid("k", b"eid1", b"", b"")  # eid replay
    assert e.value.code == 107


def test_ballot_commit_and_double_vote_rejection(election, chain):
    admin, voters = chain
    # voter 0: chunked upload + commit -> accepted
    vi, sec = _make_vi(election, 0)
    for off in range(0, len(vi), CHUNK):
        voters[0].update_ballot("voter0_key", vi[off : off + CHUNK])
    voters[0].commit_ballot(
        "voter0_key", sec.proof_end, sec.ct_begin, sec.ct_end,
        sec.eid_begin, sec.sn_begin, sec.rt_begin,
    )
    assert voters[0].is_vote_accepted("voter0_key")
    assert voters[0].get_callback_status("voter0_key") == 0
    assert admin.get_voter_status("admin_key", "voter0_addr")

    # getters slice the right sections
    assert voters[0].get_ct() == election["ballots"][0][2]
    assert voters[0].get_proof() == election["ballots"][0][0]

    # voter 1 replays voter 0's ballot (same sn) -> status 2, rejected
    voters[1].update_ballot("voter1_key", vi)
    voters[1].commit_ballot(
        "voter1_key", sec.proof_end, sec.ct_begin, sec.ct_end,
        sec.eid_begin, sec.sn_begin, sec.rt_begin,
    )
    assert not voters[1].is_vote_accepted("voter1_key")
    assert voters[1].get_callback_status("voter1_key") == 2  # sn already sent

    # voter 1 then submits their own ballot after reset -> accepted
    vi1, sec1 = _make_vi(election, 1)
    voters[1].reset_ballot("voter1_key")
    voters[1].update_ballot("voter1_key", vi1)
    voters[1].commit_ballot(
        "voter1_key", sec1.proof_end, sec1.ct_begin, sec1.ct_end,
        sec1.eid_begin, sec1.sn_begin, sec1.rt_begin,
    )
    assert voters[1].is_vote_accepted("voter1_key")


def test_corrupted_vi_fails_vergrth16(election, chain):
    admin, voters = chain
    vi, sec = _make_vi(election, 2)
    # corrupt one proof byte
    bad = bytearray(vi)
    bad[5] ^= 0xFF
    voters[2].reset_ballot("voter2_key")
    voters[2].update_ballot("voter2_key", bytes(bad))
    with pytest.raises(ChainError) as e:
        voters[2].commit_ballot(
            "voter2_key", sec.proof_end, sec.ct_begin, sec.ct_end,
            sec.eid_begin, sec.sn_begin, sec.rt_begin,
        )
    assert e.value.code == 213  # vergrth16 failure
    # malformed offsets
    with pytest.raises(ChainError) as e:
        voters[2].commit_ballot("voter2_key", 10, 5, 20, 30, 40, 50)
    assert e.value.code == 212


def test_tally_upload_and_commit(election, chain):
    admin, voters = chain
    admin.reset_tally("admin_key")
    admin.update_tally_ct_sum("admin_key", b"ct_sum_chunk")
    admin.update_tally_m_sum("admin_key", b"m_sum")
    admin.update_tally_dec_proof("admin_key", b"dec_proof")
    assert not admin.get_is_tally_committed()
    admin.commit_tally("admin_key")
    assert admin.get_is_tally_committed()


def test_vi_worked_offsets_match_reference_shape(election):
    """README.md:219 worked example: eid spans 2048 B, sn spans 8160 B."""
    vi, sec = _make_vi(election, 0)
    assert sec.proof_end == 193
    assert sec.sn_begin - sec.eid_begin == 64 * 32  # 2048
    assert sec.rt_begin - sec.sn_begin == 255 * 32  # 8160
    assert len(vi) - sec.rt_begin == 255 * 32
