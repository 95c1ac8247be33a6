"""Device witness generation parity vs the host object-int path.

The device witness generator (circuit/witness_dev.py) must produce, bit for
bit, the same assignment as VotingCircuit.generate_witness (the host walk
mirroring reference common.hpp:1054-1128) — including satisfiability.
"""

import numpy as np
import pytest

from vote_saver_tpu.circuit.voting import build_voting_circuit
from vote_saver_tpu.circuit import witness_dev as wd
from vote_saver_tpu.ops import merkle
from vote_saver_tpu.utils.rng import FrRandom
from vote_saver_tpu.params import SECRET_KEY_BITS, PUBLIC_KEY_BITS
from vote_saver_tpu.refimpl import pedersen as rpd


@pytest.fixture(scope="module")
def setup_depth2():
    rng = FrRandom(0xD2)
    depth, eid_bits = 2, 64
    circ = build_voting_circuit(depth, eid_bits)
    sks = [rng.bits(SECRET_KEY_BITS) for _ in range(3)]
    pks = [rpd.pedersen_hash(sk) for sk in sks]
    pks += [[0] * PUBLIC_KEY_BITS] * ((1 << depth) - len(pks))
    levels = merkle.build_tree(np.array(pks, np.int32))
    eid = [rng() % 2 for _ in range(eid_bits)]
    return circ, sks, levels, eid


def test_device_witness_matches_host(setup_depth2):
    circ, sks, levels, eid = setup_depth2
    votes = np.array([5, 5, 17])
    vidx = np.array([0, 1, 2])
    sib = np.stack([merkle.copath(levels, i) for i in vidx]).astype(object)

    wit_host = circ.generate_witness(
        votes, np.array(eid, dtype=object), np.array(sks, dtype=object), vidx, sib
    )
    w_dev = wd.generate_witness_device(circ, votes, eid, sks, vidx, sib)
    got = wd.witness_to_host_ints(w_dev)
    assert got.shape == wit_host.values.shape
    mism = np.nonzero(got != wit_host.values)
    assert len(mism[0]) == 0, f"first mismatches at {list(zip(*mism))[:10]}"


def test_device_witness_satisfies(setup_depth2):
    circ, sks, levels, eid = setup_depth2
    votes = np.array([3])
    vidx = np.array([1])
    sib = np.stack([merkle.copath(levels, i) for i in vidx]).astype(object)
    w_dev = wd.generate_witness_device(circ, votes, eid, [sks[1]], vidx, sib)
    got = wd.witness_to_host_ints(w_dev)
    assert circ.cs.is_satisfied(got)
