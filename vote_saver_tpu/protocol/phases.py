"""The six protocol phase functions — the framework's L1 API.

Blob-in/blob-out signatures mirror the reference's
process_encrypted_input_mode_* functions (common.hpp:824-1293) so a user of
the reference CLI/WASM/JNI surface finds the same API here; additionally the
vote phase is batched over voters (the TPU-native axis the reference lacks,
SURVEY.md §2D).
"""

from __future__ import annotations

import os

import numpy as np

from ..params import (
    R,
    MSG_SIZE,
    SECRET_KEY_BITS,
    PUBLIC_KEY_BITS,
    DIGEST_BITS,
    DEFAULT_EID_BITS,
    DEFAULT_TREE_DEPTH,
)
from ..circuit.voting import build_voting_circuit
from ..ops import merkle
from ..refimpl import pedersen as rpd
from ..utils.rng import FrRandom
from . import groth16, marshal as M, saver


# ---------------------------------------------------------------------------
# Phase 1 — voter key generation (reference common.hpp:824-847)
# ---------------------------------------------------------------------------


def init_voter_phase(voter_idx: int, rng: FrRandom | None = None) -> tuple[bytes, bytes]:
    """Random 255-bit sk; pk = Pedersen(sk).  Returns (pk_blob, sk_blob)."""
    rng = rng or FrRandom()
    sk_bits = rng.bits(SECRET_KEY_BITS)
    pk_bits = rpd.pedersen_hash(sk_bits)
    return M.ser_bitarray(pk_bits), M.ser_bitarray(sk_bits)


# ---------------------------------------------------------------------------
# Phase 2 — admin key generation (reference common.hpp:849-941)
# ---------------------------------------------------------------------------


def init_admin_phase_generate_keys(
    tree_depth: int,
    eid_bits: int = DEFAULT_EID_BITS,
    rng: FrRandom | None = None,
) -> tuple[bytes, bytes, bytes, bytes, bytes]:
    """Builds the R1CS once per tree depth, runs Groth16 setup, generates the
    SAVER keypair from msg_size*3+2 scalars.  Returns
    (pk_crs_blob, vk_crs_blob, pk_eid_blob, sk_eid_blob, vk_eid_blob)."""
    rng = rng or FrRandom()
    circ = build_voting_circuit(tree_depth, eid_bits)
    pk, vk = groth16.setup(circ.cs, rng)
    rnd = [rng() for _ in range(MSG_SIZE * 3 + 2)]
    spk, ssk, svk = saver.keygen(vk, MSG_SIZE, rnd)
    return (
        M.ser_groth16_pk(pk),
        M.ser_groth16_vk(vk),
        M.ser_saver_pk(spk),
        M.ser_saver_sk(ssk),
        M.ser_saver_vk(svk),
    )


# ---------------------------------------------------------------------------
# Phase 3 — admin election data (reference common.hpp:943-983)
# ---------------------------------------------------------------------------


def init_admin_phase_generate_data(
    tree_depth: int,
    eid_bits: int,
    public_keys_blobs: list[bytes],
    rng: FrRandom | None = None,
) -> tuple[bytes, bytes, bytes]:
    """Merkle tree over <= 2^depth voter pks (zero-padded), random eid.
    Returns (eid_blob, rt_blob, merkle_tree_blob)."""
    rng = rng or FrRandom()
    n = 1 << tree_depth
    assert len(public_keys_blobs) <= n
    pks = [M.de_bitarray(b, PUBLIC_KEY_BITS) for b in public_keys_blobs]
    pks += [[0] * PUBLIC_KEY_BITS] * (n - len(pks))
    levels = merkle.build_tree(np.array(pks, np.int32))
    rt_bits = [int(b) for b in merkle.root(levels)]
    rt_field = M.pack_bits_to_field_elements(rt_bits)
    eid = [rng() % 2 for _ in range(eid_bits)]
    eid_field = M.pack_bits_to_field_elements(eid)
    flat = merkle.flatten_tree(levels)
    return (
        M.ser_scalar_vector(eid_field),
        M.ser_scalar_vector(rt_field),
        M.ser_merkle_tree(flat),
    )


# ---------------------------------------------------------------------------
# Phase 4 — vote (the hot path; reference common.hpp:987-1174), batched
# ---------------------------------------------------------------------------


class VoteContext:
    """Parsed, device-resident election state for repeated ballot generation.

    The reference re-deserializes every blob inside each vote-phase call
    (common.hpp:996-1006, dominated by the CRS); production serving keeps the
    CRS resident — `prepare_vote_context` parses once, `vote_with_context`
    is the hot path (what bench.py's proofs/sec/chip measures)."""

    def __init__(self, tree_depth, eid_bits, circ, levels, eid_field, eid, spk, vk, pk):
        self.tree_depth = tree_depth
        self.eid_bits = eid_bits
        self.circ = circ
        self.levels = levels
        self.eid_field = eid_field
        self.eid = eid
        self.spk = spk
        self.vk = vk
        self.pk = pk


def prepare_vote_context(
    tree_depth: int,
    eid_bits: int,
    merkle_tree_blob: bytes,
    rt_blob: bytes,
    eid_blob: bytes,
    pk_eid_blob: bytes,
    proving_key_blob: bytes,
    verification_key_blob: bytes,
) -> VoteContext:
    circ = build_voting_circuit(tree_depth, eid_bits)
    flat = M.de_merkle_tree(merkle_tree_blob, tree_depth)
    levels = merkle.unflatten_tree(flat, tree_depth)
    admin_rt = M.de_scalar_vector(rt_blob)
    rt_bits = [int(b) for b in merkle.root(levels)]
    assert M.pack_bits_to_field_elements(rt_bits) == admin_rt, "merkle root mismatch"
    eid_field = M.de_scalar_vector(eid_blob)
    eid = M.unpack_field_elements_to_bits(eid_field, eid_bits)
    spk = M.de_saver_pk(pk_eid_blob)
    vk = M.de_groth16_vk(verification_key_blob)
    pk = M.de_groth16_pk(proving_key_blob, coo=circ.cs.to_coo())
    return VoteContext(tree_depth, eid_bits, circ, levels, eid_field, eid, spk, vk, pk)


def vote_phase_batch(
    tree_depth: int,
    eid_bits: int,
    voter_indices: list[int],
    votes: list[int],
    merkle_tree_blob: bytes,
    rt_blob: bytes,
    eid_blob: bytes,
    sk_blobs: list[bytes],
    pk_eid_blob: bytes,
    proving_key_blob: bytes,
    verification_key_blob: bytes,
    rng: FrRandom | None = None,
) -> list[tuple[bytes, bytes, bytes, bytes]]:
    """Batched ballot generation.  Per voter returns
    (proof_blob, pinput_blob, ct_blob, sn_blob) exactly as serialize_data
    (common.hpp:462-485,1148-1160): pinput is the primary input from the
    eid offset on, sn is the packed sn slice."""
    ctx = prepare_vote_context(
        tree_depth, eid_bits, merkle_tree_blob, rt_blob, eid_blob,
        pk_eid_blob, proving_key_blob, verification_key_blob,
    )
    return vote_with_context(ctx, voter_indices, votes, sk_blobs, rng)


def _finish_host(spk, vk, pk, proofs, prim, B: int, rng: FrRandom):
    """Host tail: SAVER encrypt + rerandomize over native pointwise muls
    (the pre-round-4 path; the device tail is protocol/ballot_dev.py).
    Returns [(ct, proof)] per ballot."""
    from ..protocol.groth16 import _trace as _tr
    import time as _time

    t0 = _time.time()
    m_fields = [[int(x) for x in prim[i, :MSG_SIZE]] for i in range(B)]
    cts0 = saver.encrypt_many(spk, vk, m_fields, [rng() for _ in range(B)])
    t0 = _tr("saver encrypt", t0)
    rerand = saver.rerandomize_many(
        spk, pk.delta_g2, cts0, proofs, [[rng() for _ in range(3)] for _ in range(B)]
    )
    _tr("saver rerandomize", t0)
    return rerand


def vote_with_context(
    ctx: VoteContext,
    voter_indices: list[int],
    votes: list[int],
    sk_blobs: list[bytes],
    rng: FrRandom | None = None,
    mesh=None,
) -> list[tuple[bytes, bytes, bytes, bytes]]:
    rng = rng or FrRandom()
    B = len(voter_indices)
    assert len(votes) == B and len(sk_blobs) == B
    tree_depth, eid_bits = ctx.tree_depth, ctx.eid_bits
    circ, levels, eid_field, eid = ctx.circ, ctx.levels, ctx.eid_field, ctx.eid
    spk, vk, pk = ctx.spk, ctx.vk, ctx.pk
    sks = [M.de_bitarray(b, SECRET_KEY_BITS) for b in sk_blobs]

    for idx in voter_indices:
        assert idx < (1 << tree_depth), "Voter index should be less than number of participants!"

    sib = np.stack([merkle.copath(levels, i) for i in voter_indices]).astype(object)
    if os.environ.get("VSTPU_HOST_WITNESS"):
        # legacy host object-int walk (kept for parity testing)
        wit = circ.generate_witness(
            np.array(votes),
            np.array(eid, dtype=object),
            np.array(sks, dtype=object),
            np.array(voter_indices),
            sib,
        )
        assert circ.cs.is_satisfied(wit.values), "witness generation failed"
        proofs = groth16.prove(pk, wit.values, rng)
        prim = wit.primary(circ.cs.num_primary)
        rerand = _finish_host(spk, vk, pk, proofs, prim, B, rng)
    else:
        from ..backend import use_device
        from ..circuit import witness_dev as wd
        from ..params import fr_spec
        from ..ops import limbs as lb
        from ..protocol.groth16 import _trace
        import time as _time

        t0 = _time.time()
        w_mont = wd.generate_witness_device(
            circ, np.array(votes), eid, sks, np.array(voter_indices), sib
        )
        t0 = _trace("witness gen", t0)
        if use_device() or mesh is not None or os.environ.get("VSTPU_DEVICE_TAIL"):
            # device tail: MSM outputs stay on device; blinding + SAVER
            # encrypt + rerandomize run as one batched device graph
            from . import ballot_dev

            outs, w_std = groth16.prove_msms_device(pk, w_mont, mesh=mesh)
            t0 = _trace("prove msms (device)", t0)
            prim = lb.limbs_to_ints(
                w_std[:, 1 : 1 + circ.cs.num_primary], fr_spec()
            )
            t0 = _trace("primary limbs->ints", t0)
            rerand = ballot_dev.finalize_ballots_device(
                pk, spk, vk, outs, votes, rng
            )
            t0 = _trace("ballot finalize (device)", t0)
        else:
            proofs, w_std = groth16.prove_device(pk, w_mont, rng, mesh=mesh)
            t0 = _trace("prove_device total", t0)
            prim = lb.limbs_to_ints(
                w_std[:, 1 : 1 + circ.cs.num_primary], fr_spec()
            )
            t0 = _trace("primary limbs->ints", t0)
            rerand = _finish_host(spk, vk, pk, proofs, prim, B, rng)

    import time as _time
    from ..protocol.groth16 import _trace as _tr

    t0 = _time.time()
    out = []
    for i in range(B):
        ct, proof = rerand[i]
        pinput = [int(x) for x in prim[i]]
        eid_off = MSG_SIZE
        sn_off = eid_off + len(eid_field)
        rt_off = sn_off + 2
        out.append(
            (
                M.ser_proof(proof),
                M.ser_scalar_vector(pinput[eid_off:]),
                M.ser_ct(ct),
                M.ser_scalar_vector(pinput[sn_off:rt_off]),
            )
        )
    return out


def vote_with_context_stream(
    ctx: VoteContext,
    batches: list[tuple[list[int], list[int], list[bytes]]],
    rng: FrRandom | None = None,
):
    """Software-pipelined batched voting: yields one ballot list per batch.

    Batch i+1's HOST work (witness dispatch, ABC/H fetch, schedule build,
    MSM launches) overlaps batch i's device MSM execution — the device never
    idles on schedule-building or serialization, so steady-state throughput
    approaches the pure device time per batch.  The serial tail (exc sync,
    ballot finalize, serialization) runs in batch order and all randomness
    is drawn there, so the ballots are byte-identical to sequential
    `vote_with_context` calls under the same seeded rng (launches draw no
    randomness).  Requires the device tail path (the TPU configuration)."""
    from ..circuit import witness_dev as wd
    from ..ops import limbs as lb
    from ..params import fr_spec
    from . import ballot_dev

    rng = rng or FrRandom()
    circ, levels, eid_field, eid = ctx.circ, ctx.levels, ctx.eid_field, ctx.eid
    spk, vk, pk = ctx.spk, ctx.vk, ctx.pk

    def launch(batch):
        voter_indices, votes, sk_blobs = batch
        B = len(voter_indices)
        assert len(votes) == B and len(sk_blobs) == B
        for idx in voter_indices:
            assert idx < (1 << ctx.tree_depth), (
                "Voter index should be less than number of participants!"
            )
        sks = [M.de_bitarray(b, SECRET_KEY_BITS) for b in sk_blobs]
        sib = np.stack(
            [merkle.copath(levels, i) for i in voter_indices]
        ).astype(object)
        w_mont = wd.generate_witness_device(
            circ, np.array(votes), eid, sks, np.array(voter_indices), sib
        )
        finish, w_std = groth16.prove_msms_device(pk, w_mont, defer=True)
        prim = lb.limbs_to_ints(w_std[:, 1 : 1 + circ.cs.num_primary], fr_spec())
        return finish, prim, votes

    def tail(st):
        finish, prim, votes = st
        outs = finish()
        rerand = ballot_dev.finalize_ballots_device(pk, spk, vk, outs, votes, rng)
        out = []
        for i in range(len(votes)):
            ct, proof = rerand[i]
            pinput = [int(x) for x in prim[i]]
            eid_off = MSG_SIZE
            sn_off = eid_off + len(eid_field)
            rt_off = sn_off + 2
            out.append(
                (
                    M.ser_proof(proof),
                    M.ser_scalar_vector(pinput[eid_off:]),
                    M.ser_ct(ct),
                    M.ser_scalar_vector(pinput[sn_off:rt_off]),
                )
            )
        return out

    pending = None
    for batch in batches:
        try:
            st = launch(batch)
        except Exception as e:  # pragma: no cover - jax dispatch flake
            # Dispatching a freshly-(re)compiled program while the previous
            # batch's outputs are still in flight can fail on this jax
            # version (INVALID_ARGUMENT: "supplied N buffers but compiled
            # program expected M").  Drain the pipeline (finish the pending
            # batch) and retry once against an idle queue; a second failure
            # is real.
            if pending is None:
                raise
            print(f"[vote_stream] drain-and-retry after: {e!r}", flush=True)
            drained = tail(pending)
            pending = None
            st = launch(batch)
            yield drained
        if pending is not None:
            yield tail(pending)
        pending = st
    if pending is not None:
        yield tail(pending)


def vote_phase(
    tree_depth: int,
    eid_bits: int,
    voter_idx: int,
    vote: int,
    merkle_tree_blob: bytes,
    rt_blob: bytes,
    eid_blob: bytes,
    sk_blob: bytes,
    pk_eid_blob: bytes,
    proving_key_blob: bytes,
    verification_key_blob: bytes,
    rng: FrRandom | None = None,
) -> tuple[bytes, bytes, bytes, bytes]:
    """Single-voter wrapper with the reference's exact signature shape."""
    return vote_phase_batch(
        tree_depth,
        eid_bits,
        [voter_idx],
        [vote],
        merkle_tree_blob,
        rt_blob,
        eid_blob,
        [sk_blob],
        pk_eid_blob,
        proving_key_blob,
        verification_key_blob,
        rng,
    )[0]


# ---------------------------------------------------------------------------
# Phase 5 — tally (admin): aggregate, decrypt, prove (common.hpp:1176-1237)
# ---------------------------------------------------------------------------


def tally_admin_phase(
    tree_depth: int,
    cts_blobs: list[bytes],
    sk_eid_blob: bytes,
    vk_eid_blob: bytes,
    pk_crs_blob: bytes,
    vk_crs_blob: bytes,
) -> tuple[bytes, bytes]:
    """Returns (dec_proof_blob, voting_res_blob)."""
    assert len(cts_blobs) <= (1 << tree_depth)
    ssk = M.de_saver_sk(sk_eid_blob)
    vk = M.de_groth16_vk(vk_crs_blob)
    cts = [M.de_ct(b) for b in cts_blobs]
    ct_agg = cts[0]
    for ct in cts[1:]:
        ct_agg = ct_agg + ct
    counts, dproof = saver.decrypt(ssk, vk, ct_agg, max_count=len(cts))
    assert len(counts) == MSG_SIZE, "Deciphered lens not equal"
    return M.ser_dec_proof(dproof), M.ser_scalar_vector(counts)


# ---------------------------------------------------------------------------
# Phase 6 — tally (voter/observer): verify decryption (common.hpp:1239-1293)
# ---------------------------------------------------------------------------


def tally_voter_phase(
    tree_depth: int,
    cts_blobs: list[bytes],
    vk_eid_blob: bytes,
    pk_crs_blob: bytes,
    vk_crs_blob: bytes,
    voting_res_blob: bytes,
    dec_proof_blob: bytes,
) -> bool:
    assert len(cts_blobs) <= (1 << tree_depth)
    svk = M.de_saver_vk(vk_eid_blob)
    vk = M.de_groth16_vk(vk_crs_blob)
    counts = M.de_scalar_vector_any(voting_res_blob)
    dproof = M.de_dec_proof(dec_proof_blob)
    cts = [M.de_ct(b) for b in cts_blobs]
    ct_agg = cts[0]
    for ct in cts[1:]:
        ct_agg = ct_agg + ct
    return saver.verify_decryption(vk, svk, ct_agg, counts, dproof)


# ---------------------------------------------------------------------------
# Ballot verification (the reference's DEBUG_VERIFY_BALLOT / on-chain check)
# ---------------------------------------------------------------------------


def verify_ballot(
    proof_blob: bytes,
    pinput_blob: bytes,
    ct_blob: bytes,
    vk_eid_blob: bytes,
    vk_crs_blob: bytes,
) -> bool:
    """Off-chain equivalent of tvm.vergrth16 on an encrypted-input ballot
    (reference voting_voter.sol:94 / common.hpp:1162-1173)."""
    proof = M.de_proof(proof_blob)
    rest = M.de_scalar_vector(pinput_blob)
    ct = M.de_ct(ct_blob)
    vk = M.de_groth16_vk(vk_crs_blob)
    svk = M.de_saver_vk(vk_eid_blob)
    return saver.verify_encryption(vk, svk, ct, proof, rest)


# Reference-parity aliases (the process_encrypted_input_mode_* names of
# common.hpp:824-1293), for drop-in discoverability.
process_encrypted_input_mode_init_voter_phase = init_voter_phase
process_encrypted_input_mode_init_admin_phase_generate_keys = init_admin_phase_generate_keys
process_encrypted_input_mode_init_admin_phase_generate_data = init_admin_phase_generate_data
process_encrypted_input_mode_vote_phase = vote_phase
process_encrypted_input_mode_tally_admin_phase = tally_admin_phase
process_encrypted_input_mode_tally_voter_phase = tally_voter_phase
