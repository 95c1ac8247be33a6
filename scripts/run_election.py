#!/usr/bin/env python
"""Orchestration demo (L5): a full election through the on-chain simulator.

The reference's L5 is a notebook generating tonos-cli command streams that
shuttle phase artifacts into the contracts in 30000-hex-char chunks
(bin/cli/src/protocol_exec.ipynb).  This script is the same orchestration
against the in-memory chain: every artifact flows through the contract
surface (chunked uploads, commit_ballot/VERGRTH16, sn double-vote checks,
tally upload/commit), mirroring SURVEY.md §3.5 step for step.

    python scripts/run_election.py --tree-depth 2 --voters 3
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CHUNK = 15000  # 30000 hex chars per tonos-cli message (notebook cell 7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-depth", type=int, default=2)
    ap.add_argument("--voters", type=int, default=3)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    import os

    # The demo favours the CPU host path: one-off elections are dominated by
    # jit compile time on TPU (set VSTPU_DEMO_TPU=1 to run the device path).
    if os.environ.get("VSTPU_DEMO_TPU") != "1":
        os.environ.setdefault("VSTPU_LIMB_BITS", "32")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vote_saver_tpu import sdk
    from vote_saver_tpu.chain import ballot_blob as bb
    from vote_saver_tpu.chain.contracts import SaverAdmin, SaverVoter
    from vote_saver_tpu.protocol import marshal as M
    from vote_saver_tpu.utils.rng import FrRandom

    rng = FrRandom(args.seed) if args.seed is not None else FrRandom()
    t0 = time.time()

    print(f"== setup: depth {args.tree_depth}, {args.voters} voters ==")
    keypairs = [sdk.generate_voter_keypair(rng) for _ in range(args.voters)]
    keys = sdk.admin_keygen(args.tree_depth, rng=rng)
    election = sdk.init_election([k.public_key for k in keypairs], args.tree_depth, rng=rng)
    print(f"   keys + election ready ({time.time()-t0:.0f}s)")

    print("== chain: deploy + CRS upload (chunked) ==")
    admin = SaverAdmin(owner="admin")
    for off in range(0, len(keys.r1cs_proving_key), CHUNK):
        admin.update_crs_pk("admin", keys.r1cs_proving_key[off : off + CHUNK])
    admin.update_crs_vk("admin", keys.r1cs_verification_key)
    print(f"   CRS uploaded in {len(admin.get_crs_pk())} chunks")

    print("== ballots (batched prove) ==")
    ballots = sdk.generate_votes(
        keys, election, list(range(args.voters)),
        [i % 25 for i in range(args.voters)],
        [k.secret_key for k in keypairs], args.tree_depth, rng=rng,
    )

    pinput0 = M.de_scalar_vector(ballots[0].primary_input)
    eid_bits = M.unpack_field_elements_to_bits(pinput0[:1], 64)
    vi0, sec0 = _vi(ballots[0], keys, eid_bits)
    admin.set_eid("admin", vi0[sec0.eid_begin : sec0.sn_begin], keys.public_key, keys.verification_key)
    admin.set_rt("admin", election.rt)
    voters = [SaverVoter(f"v{i}", admin, f"addr{i}") for i in range(args.voters)]
    admin.add_voters("admin", [v.address for v in voters])
    admin.init_voting_session("admin")

    print("== on-chain acceptance: upload + commit + VERGRTH16 ==")
    for i, (ballot, voter) in enumerate(zip(ballots, voters)):
        vi, sec = _vi(ballot, keys, eid_bits)
        for off in range(0, len(vi), CHUNK):
            voter.update_ballot(f"v{i}", vi[off : off + CHUNK])
        voter.commit_ballot(f"v{i}", sec.proof_end, sec.ct_begin, sec.ct_end,
                            sec.eid_begin, sec.sn_begin, sec.rt_begin)
        status = voter.get_callback_status(f"v{i}")
        print(f"   voter {i}: accepted={voter.is_vote_accepted(f'v{i}')} (status {status})")
        assert status == 0

    print("== tally ==")
    cts = [b.ct for b in ballots]
    dec_proof, voting_res = sdk.tally_votes(keys, cts, args.tree_depth)
    for off in range(0, len(voting_res), CHUNK):
        admin.update_tally_m_sum("admin", voting_res[off : off + CHUNK])
    for off in range(0, len(dec_proof), CHUNK):
        admin.update_tally_dec_proof("admin", dec_proof[off : off + CHUNK])
    admin.commit_tally("admin")
    counts = sdk.decode_result(b"".join(admin.get_m_sum()))
    print("   counts:", {i: c for i, c in enumerate(counts) if c})
    ok = sdk.verify_tally(keys, cts, voting_res, dec_proof, args.tree_depth)
    print(f"   observer verification: {ok}")
    assert ok
    print(f"== done in {time.time()-t0:.0f}s ==")


def _vi(ballot, keys, eid_bits):
    from vote_saver_tpu.chain import ballot_blob as bb
    from vote_saver_tpu.protocol import marshal as M

    pinput = M.de_scalar_vector(ballot.primary_input)
    sn_bits = M.unpack_field_elements_to_bits(pinput[1:3], 255)
    rt_bits = M.unpack_field_elements_to_bits(pinput[3:5], 255)
    return bb.build_vi(ballot.proof, keys.r1cs_verification_key, keys.public_key,
                       ballot.ct, eid_bits, sn_bits, rt_bits,
                       vk_eid_blob=keys.verification_key)


if __name__ == "__main__":
    main()
