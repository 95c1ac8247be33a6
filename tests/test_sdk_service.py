"""SDK (wrapper.js analog) and JSON service frontend tests."""

import base64
import json

from vote_saver_tpu import sdk
from vote_saver_tpu.frontends import service
from vote_saver_tpu.utils.rng import FrRandom


def test_sdk_roundtrip_on_existing_election(election):
    e = election
    keys = sdk.AdminKeys(e["pk_crs"], e["vk_crs"], e["pk_eid"], e["sk_eid"], e["vk_eid"])
    ballots = [sdk.Ballot(*b) for b in e["ballots"]]
    assert sdk.verify_vote(keys, ballots[0])
    cts = [b.ct for b in ballots]
    dec_proof, voting_res = sdk.tally_votes(keys, cts)
    counts = sdk.decode_result(voting_res)
    assert counts[5] == 2 and counts[17] == 1
    assert sdk.verify_tally(keys, cts, voting_res, dec_proof)


def test_sdk_keypair():
    kp = sdk.generate_voter_keypair(FrRandom(4))
    assert len(kp.public_key) == 32 and len(kp.secret_key) == 32
    # deterministic under the same seed
    kp2 = sdk.generate_voter_keypair(FrRandom(4))
    assert kp2.public_key == kp.public_key


def test_service_routing(election):
    e = election
    resp = service.handle({"method": "generate_voter_keypair", "params": {"seed": 9}})
    assert set(resp) == {"public_key", "secret_key"}
    pk = base64.b64decode(resp["public_key"]["b64"])
    assert len(pk) == 32

    b64 = lambda b: {"b64": base64.b64encode(b).decode()}
    keys_p = {
        "r1cs_proving_key": b64(e["pk_crs"]),
        "r1cs_verification_key": b64(e["vk_crs"]),
        "public_key": b64(e["pk_eid"]),
        "secret_key": b64(e["sk_eid"]),
        "verification_key": b64(e["vk_eid"]),
    }
    cts = [b64(b[2]) for b in e["ballots"]]
    resp = service.handle({"method": "tally_votes", "params": {"keys": keys_p, "cts": cts}})
    res_blob = base64.b64decode(resp["voting_res"]["b64"])
    resp2 = service.handle({"method": "decode_result", "params": {"voting_res": b64(res_blob)}})
    assert resp2["counts"][5] == 2

    # unknown method -> error surfaced, not crash
    try:
        service.handle({"method": "nope", "params": {}})
        raised = False
    except ValueError:
        raised = True
    assert raised
