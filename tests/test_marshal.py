"""Wire-format roundtrip tests (SURVEY.md §2C bit-exactness targets)."""

import random

from vote_saver_tpu.params import R, Q, DIGEST_BITS
from vote_saver_tpu.protocol import marshal as M
from vote_saver_tpu.refimpl import curves as rc

rng = random.Random(0xA11CE)


def test_scalar_vector_roundtrip_and_layout():
    xs = [rng.randrange(R) for _ in range(25)]
    blob = M.ser_scalar_vector(xs)
    # 8-byte BE count + 25 * 32-byte BE elements (notebook cell 0 constants)
    assert len(blob) == 8 + 25 * 32
    assert int.from_bytes(blob[:8], "big") == 25
    assert int.from_bytes(blob[8:40], "big") == xs[0]
    assert M.de_scalar_vector(blob) == xs


def test_bitarray_big_octet_big_bit():
    bits = [1, 0, 1, 1, 0, 0, 0, 1, 1]  # bit 0 -> MSB of byte 0
    blob = M.ser_bitarray(bits)
    assert blob[0] == 0b10110001
    assert blob[1] == 0b10000000
    assert M.de_bitarray(blob, 9) == bits
    full = [rng.randrange(2) for _ in range(DIGEST_BITS)]
    assert M.de_bitarray(M.ser_bitarray(full), DIGEST_BITS) == full


def test_g1_compression_roundtrip():
    for _ in range(4):
        p = rc.g1_mul(rc.g1_gen, rng.randrange(R))
        blob = M.ser_g1(p)
        assert len(blob) == 48 and blob[0] & 0x80
        assert M.de_g1(blob) == p
    # infinity
    assert M.de_g1(M.ser_g1(None)) is None
    # negated point differs only in the sign flag
    p = rc.g1_mul(rc.g1_gen, 12345)
    b1, b2 = M.ser_g1(p), M.ser_g1(rc.g1_neg(p))
    assert b1[1:] == b2[1:] and b1[0] != b2[0]


def test_g2_compression_roundtrip():
    for _ in range(3):
        p = rc.g2_mul(rc.g2_gen, rng.randrange(R))
        blob = M.ser_g2(p)
        assert len(blob) == 96
        assert M.de_g2(blob) == p
    assert M.de_g2(M.ser_g2(None)) is None


def test_proof_blob_is_192_bytes():
    from vote_saver_tpu.protocol.groth16 import Proof

    pr = Proof(
        a=rc.g1_mul(rc.g1_gen, 7),
        b=rc.g2_mul(rc.g2_gen, 9),
        c=rc.g1_mul(rc.g1_gen, 11),
    )
    blob = M.ser_proof(pr)
    assert len(blob) == 192  # notebook: proof_size = 2*g1 + g2
    back = M.de_proof(blob)
    assert back.a == pr.a and back.b == pr.b and back.c == pr.c


def test_field_element_bit_packing():
    bits = [rng.randrange(2) for _ in range(DIGEST_BITS)]
    elems = M.pack_bits_to_field_elements(bits)
    assert len(elems) == 2  # 254 + 1
    assert M.unpack_field_elements_to_bits(elems, DIGEST_BITS) == bits
