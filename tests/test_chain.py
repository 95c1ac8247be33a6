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


def test_commit_requires_strict_eid_gt_ct_end(election, chain):
    """voting_voter.sol:91 requires eid_begin > ct_end STRICTLY (code 210);
    build_vi provides the pad byte that makes its own blobs acceptable."""
    admin, voters = chain
    vi, sec = _make_vi(election, 2)
    assert sec.eid_begin == sec.ct_end + 1  # the pad byte
    assert vi[sec.ct_end] == 0
    voters[2].reset_ballot("voter2_key")
    voters[2].update_ballot("voter2_key", vi)
    with pytest.raises(ChainError) as e:
        voters[2].commit_ballot("voter2_key", sec.proof_end, sec.ct_begin,
                                sec.ct_end, sec.ct_end, sec.sn_begin,
                                sec.rt_begin)
    assert e.value.code == 210


def test_vi_mode_plain_primary_input(election):
    """Mode byte 0x00: plain primary input VERGRTH16 (README.md:129-135).

    Groth16 rerandomization preserves e(A,B)/e(C,delta), so a ballot's proof
    still verifies PLAIN against the true primary input [m|eid|sn|rt] — the
    mode-0x00 path is the ordinary-verify leg of the TVM builtin."""
    proof_b, pinput_b, _ct_b, _ = election["ballots"][0]
    pinput = M.de_scalar_vector(pinput_b)
    eid_bits = M.unpack_field_elements_to_bits(pinput[:1], 64)
    sn_bits = M.unpack_field_elements_to_bits(pinput[1:3], 255)
    rt_bits = M.unpack_field_elements_to_bits(pinput[3:5], 255)
    m_field = [1 if i == election["votes"][0] else 0 for i in range(25)]
    vi, sec = bb.build_vi_plain(
        proof_b, election["vk_crs"], m_field, eid_bits, sn_bits, rt_bits
    )
    assert vi[0] == 0x00
    assert bb.vergrth16(vi, sec) is True
    # wrong vote slot -> reject
    bad_m = [1 if i == (election["votes"][0] + 1) % 25 else 0 for i in range(25)]
    vi2, sec2 = bb.build_vi_plain(
        proof_b, election["vk_crs"], bad_m, eid_bits, sn_bits, rt_bits
    )
    assert bb.vergrth16(vi2, sec2) is False


def test_voting_result_chain_format():
    """wrapper.js:277-282: 4-byte prefix + 25x32 BE counts = 804 bytes."""
    counts = list(range(25))
    blob = M.ser_scalar_vector_chain(counts)
    assert len(blob) == 804
    assert M.de_scalar_vector_any(blob) == counts
    # 8-byte CLI format still round-trips through the same parser
    blob8 = M.ser_scalar_vector(counts)
    assert len(blob8) == 808
    assert M.de_scalar_vector_any(blob8) == counts


def test_tonos_emitter_command_stream(election):
    """The L5 notebook's tonos-cli stream (protocol_exec.ipynb cells 7-35)."""
    from vote_saver_tpu.chain import tonos

    em = tonos.TonosEmitter("0:adminaddr")
    em.deploy_admin()
    em.upload_crs(election["pk_crs"], election["vk_crs"])
    vi, sec = _make_vi(election, 0)
    em.init_session(vi[sec.eid_begin:sec.sn_begin], election["pk_eid"],
                    election["vk_eid"], election["rt"], ["0:v0"])
    em.upload_ballot("0:v0", "keys/v0.keys.json", vi, sec)
    lines = em.lines()
    # every call respects the 30000-hex-char message cap (notebook cell 7)
    import re

    for ln in lines:
        for m in re.finditer(r'"[0-9a-f]+"', ln):
            assert len(m.group(0)) - 2 <= tonos.HEX_CHUNK_CHARS
    n_vi_chunks = -(-len(vi) // tonos.CHUNK_BYTES)
    assert sum("update_ballot" in ln for ln in lines) == n_vi_chunks
    assert any("commit_ballot" in ln and f'"rt_begin":{sec.rt_begin}' in ln
               for ln in lines)
    assert em.script().startswith("#!/bin/sh")


def test_tonos_abi_artifacts(tmp_path):
    from vote_saver_tpu.chain import tonos

    paths = tonos.write_artifacts(tmp_path)
    import json

    for p in paths:
        doc = json.loads(open(p).read())
        assert doc["ABI version"] == 2
        names = {f["name"] for f in doc["functions"]}
        if "admin" in p:
            assert {"update_crs_pk", "check_ballot", "commit_tally"} <= names
        else:
            assert {"update_ballot", "commit_ballot", "get_vi_len"} <= names
