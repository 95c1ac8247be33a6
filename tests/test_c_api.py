"""Round-trip the six C-ABI exports through real C function pointers.

Covers the reference WASM/Android/iOS buffer ABI analog (reference
bin/cli/src/wasm.cpp:62-201): every call goes address -> CFUNCTYPE cast ->
C calling convention -> callee-allocated out-buffers, exactly what a
dlopen-style embedder would do (VERDICT round-1 item 7's acceptance test).
"""

import ctypes

import pytest

from vote_saver_tpu.frontends import c_api
from vote_saver_tpu.frontends.c_api import Buffer, SuperBuffer

_keep = []  # keep-alive for every ctypes object built by the helpers


def _buf():
    p = ctypes.pointer(Buffer(0, None))
    _keep.append(p)
    return p


def _in(blob: bytes):
    """bytes -> POINTER(Buffer) input argument."""
    arr = ctypes.create_string_buffer(blob, len(blob))
    p = ctypes.pointer(Buffer(len(blob), ctypes.cast(arr, ctypes.POINTER(ctypes.c_char))))
    _keep.extend((arr, p))
    return p


def _super(blobs):
    bufs = [_in(b) for b in blobs]
    ptr_arr = (ctypes.POINTER(Buffer) * len(bufs))(*bufs)
    sb = ctypes.pointer(SuperBuffer(len(bufs), ptr_arr))
    _keep.extend((ptr_arr, sb))
    return sb


def _read(buf) -> bytes:
    return ctypes.string_at(buf.contents.ptr, buf.contents.size)


@pytest.fixture(scope="module")
def fns():
    """Resolve every export from its raw C address (the dlsym analog)."""
    addrs = c_api.function_pointers()
    return {name: c_api._SIGS[name](addr) for name, addr in addrs.items()}


def test_six_call_round_trip(fns):
    c_api.seed(0xCAB1)
    depth, eid_bits, n_voters = 2, 64, 2

    # 1. generate_voter_keypair
    pks, sks = [], []
    for _ in range(n_voters):
        pk_out, sk_out = _buf(), _buf()
        fns["generate_voter_keypair"](pk_out, sk_out)
        assert pk_out.contents.size > 0 and sk_out.contents.size > 0
        pks.append(_read(pk_out))
        sks.append(_read(sk_out))
        fns["free_buffer"](pk_out)  # freed copies were read out first
        assert pk_out.contents.size == 0

    # 2. admin_keygen
    outs = [_buf() for _ in range(5)]
    fns["admin_keygen"](depth, eid_bits, *outs)
    pk_crs, vk_crs, pk_eid, sk_eid, vk_eid = (_read(o) for o in outs)
    assert len(pk_crs) > len(vk_crs) > 0

    # 3. init_election
    eid_out, rt_out, tree_out = _buf(), _buf(), _buf()
    fns["init_election"](depth, eid_bits, _super(pks), eid_out, rt_out, tree_out)
    eid, rt, tree = _read(eid_out), _read(rt_out), _read(tree_out)

    # 4. generate_vote for each voter
    votes = [3, 7]
    cts = []
    for i, (sk, vote) in enumerate(zip(sks, votes)):
        proof_o, pinput_o, ct_o, sn_o = _buf(), _buf(), _buf(), _buf()
        fns["generate_vote"](
            depth, eid_bits, i, vote,
            _in(tree), _in(rt), _in(eid), _in(sk), _in(pk_eid),
            _in(pk_crs), _in(vk_crs),
            proof_o, pinput_o, ct_o, sn_o,
        )
        assert proof_o.contents.size == 192  # compressed G1||G1||G2
        assert sn_o.contents.size > 0 and pinput_o.contents.size > 0
        cts.append(_read(ct_o))

    # 5. tally_votes
    dec_o, res_o = _buf(), _buf()
    fns["tally_votes"](
        depth, _in(sk_eid), _in(vk_eid), _in(pk_crs), _in(vk_crs),
        _super(cts), dec_o, res_o,
    )
    dec_proof, voting_res = _read(dec_o), _read(res_o)

    # 6. verify_tally — true on honest data, false on a tampered result
    ok = fns["verify_tally"](
        depth, _super(cts), _in(vk_eid), _in(pk_crs), _in(vk_crs),
        _in(dec_proof), _in(voting_res),
    )
    assert bool(ok) is True

    # decode the 8-byte-BE-prefixed 32-byte-BE counts (wire format per
    # docs/WIRE_FORMATS.md) and check the two votes landed
    n = int.from_bytes(voting_res[:8], "big")
    counts = [
        int.from_bytes(voting_res[8 + 32 * i : 8 + 32 * (i + 1)], "big")
        for i in range(n)
    ]
    assert counts[3] == 1 and counts[7] == 1 and sum(counts) == 2

    bad = bytearray(voting_res)
    bad[-1] ^= 1
    ok_bad = fns["verify_tally"](
        depth, _super(cts), _in(vk_eid), _in(pk_crs), _in(vk_crs),
        _in(dec_proof), _in(bytes(bad)),
    )
    assert bool(ok_bad) is False
