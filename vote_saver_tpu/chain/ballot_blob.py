"""The on-chain verifier-input blob `vi` and its VERGRTH16-equivalent check.

Layout (reference README.md:117-135, notebook cell 0/20, main.cpp:690-698):

    vi = mode(1B) ‖ proof(192B) ‖ vk_crs ‖ pk_eid ‖ ct ‖ eid ‖ sn ‖ rt

with mode 0x01 = encrypted-primary-input Groth16, and the trailing eid/sn/rt
sections *bit-expanded*: one 32-byte big-endian field element (0 or 1) per
bit — 64/255/255 elements, spans 2048/8160/8160 bytes, matching the worked
offsets in README.md:219.  The packed 254-bit-chunk encoding used inside the
proof's primary input is recovered by re-packing the expanded bits.
"""

from __future__ import annotations

import dataclasses

from ..params import DEFAULT_EID_BITS, DIGEST_BITS, MSG_SIZE
from ..protocol import marshal as M

MODE_ENCRYPTED_INPUT = 0x01


@dataclasses.dataclass
class BallotSections:
    """Byte offsets within vi (SharedStructs.Ballot, voting_interface.sol:17-25)."""

    proof_end: int
    ct_begin: int
    ct_end: int
    eid_begin: int
    sn_begin: int
    rt_begin: int


def _expand_bits(bits) -> bytes:
    return b"".join(int(b).to_bytes(32, "big") for b in bits)


def _collapse_bits(blob: bytes) -> list[int]:
    assert len(blob) % 32 == 0
    out = []
    for i in range(0, len(blob), 32):
        v = int.from_bytes(blob[i : i + 32], "big")
        assert v in (0, 1), "expanded bit section holds non-bit element"
        out.append(v)
    return out


def build_vi(
    proof_blob: bytes,
    vk_crs_blob: bytes,
    pk_eid_blob: bytes,
    ct_blob: bytes,
    eid_bits: list[int],
    sn_bits: list[int],
    rt_bits: list[int],
) -> tuple[bytes, BallotSections]:
    assert len(proof_blob) == 192
    parts = [bytes([MODE_ENCRYPTED_INPUT]), proof_blob, vk_crs_blob, pk_eid_blob, ct_blob]
    off = sum(len(p) for p in parts)
    sec = BallotSections(
        proof_end=1 + 192,
        ct_begin=off - len(ct_blob),
        ct_end=off,
        eid_begin=off,
        sn_begin=off + 32 * len(eid_bits),
        rt_begin=off + 32 * (len(eid_bits) + len(sn_bits)),
    )
    parts += [_expand_bits(eid_bits), _expand_bits(sn_bits), _expand_bits(rt_bits)]
    return b"".join(parts), sec


def split_vi(vi: bytes, sec: BallotSections):
    """Slice vi into its sections (the voter contract's getters)."""
    return {
        "mode": vi[0],
        "proof": vi[1 : sec.proof_end],
        "middle": vi[sec.proof_end : sec.ct_begin],  # vk_crs ‖ pk_eid
        "ct": vi[sec.ct_begin : sec.ct_end],
        "eid": vi[sec.eid_begin : sec.sn_begin],
        "sn": vi[sec.sn_begin : sec.rt_begin],
        "rt": vi[sec.rt_begin :],
    }


def vergrth16(vi: bytes, sec: BallotSections, eid_bits_len: int = DEFAULT_EID_BITS) -> bool:
    """The TVM builtin's off-chain equivalent (voting_voter.sol:94): verify
    the Groth16 proof with encrypted primary input carried inside vi."""
    from ..protocol import saver

    try:
        s = split_vi(vi, sec)
        if s["mode"] != MODE_ENCRYPTED_INPUT:
            return False
        proof = M.de_proof(s["proof"])
        # middle = vk_crs ‖ pk_eid; vk_crs is self-describing
        middle = s["middle"]
        vk, vk_len = _de_vk_prefix(middle)
        # pk_eid occupies the rest (validated by its own parser)
        M.de_saver_pk(middle[vk_len:])
        ct = M.de_ct(s["ct"])
        eid_bits = _collapse_bits(s["eid"])
        sn_bits = _collapse_bits(s["sn"])
        rt_bits = _collapse_bits(s["rt"])
        rest = (
            M.pack_bits_to_field_elements(eid_bits)
            + M.pack_bits_to_field_elements(sn_bits)
            + M.pack_bits_to_field_elements(rt_bits)
        )
        svk = _VERIFY_CONTEXT.get("svk")
        if svk is None:
            return False
        return saver.verify_encryption(vk, svk, ct, proof, rest)
    except (AssertionError, IndexError, ValueError):
        return False


def _de_vk_prefix(blob: bytes):
    """Parse a Groth16 vk blob from the head of `blob`; return (vk, length)."""
    import struct

    base = M.G1_SIZE + 3 * M.G2_SIZE
    (n_ic,) = struct.unpack(">Q", blob[base : base + 8])
    length = base + 8 + n_ic * M.G1_SIZE
    return M.de_groth16_vk(blob[:length]), length


# The SAVER verification key is election-global state the on-chain verifier
# holds out-of-band (the TVM builtin keys it from the vi's embedded keys; our
# scheme's well-formedness check additionally needs svk — registered here by
# the simulator / test harness).
_VERIFY_CONTEXT: dict = {}


def set_verify_context(svk) -> None:
    _VERIFY_CONTEXT["svk"] = svk
