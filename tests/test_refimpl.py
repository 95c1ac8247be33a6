"""Unit tests for the Python-int reference implementation (the oracle).

These are the known-vector / property tests the reference repo lacks
(SURVEY.md §4: crypto3 primitive tests live in un-vendored submodules).
"""

import random

import pytest

from vote_saver_tpu import params as P
from vote_saver_tpu.refimpl import field as f
from vote_saver_tpu.refimpl import curves as c
from vote_saver_tpu.refimpl import pairing as pr
from vote_saver_tpu.refimpl import pedersen as pd

rng = random.Random(0xC0FFEE)


def rand_fq():
    return rng.randrange(P.Q)


def rand_fr():
    return rng.randrange(P.R)


def rand_fq2():
    return (rand_fq(), rand_fq())


def rand_fq12():
    return tuple(tuple(rand_fq2() for _ in range(3)) for _ in range(2))


class TestFields:
    def test_fq_sqrt(self):
        for _ in range(10):
            a = rand_fq()
            s = f.fq_sqrt(a * a % P.Q)
            assert s is not None and s * s % P.Q == a * a % P.Q

    def test_fr_sqrt(self):
        for _ in range(10):
            a = rand_fr()
            s = f.fr_sqrt(a * a % P.R)
            assert s is not None and s * s % P.R == a * a % P.R
        # non-residue: generator of Fr* is never a square
        assert f.fr_sqrt(P.FR_GENERATOR) is None

    def test_fr_root_of_unity(self):
        w = P.FR_ROOT_OF_UNITY
        assert pow(w, 1 << 32, P.R) == 1
        assert pow(w, 1 << 31, P.R) != 1

    def test_fq2_mul_inv(self):
        for _ in range(10):
            a, b = rand_fq2(), rand_fq2()
            assert f.fq2_mul(a, f.fq2_inv(a)) == f.FQ2_ONE
            assert f.fq2_mul(a, b) == f.fq2_mul(b, a)
            assert f.fq2_sq(a) == f.fq2_mul(a, a)

    def test_fq2_sqrt(self):
        for _ in range(10):
            a = rand_fq2()
            s = f.fq2_sqrt(f.fq2_sq(a))
            assert s is not None and f.fq2_sq(s) == f.fq2_sq(a)

    def test_fq12_field_axioms(self):
        a, b, x = rand_fq12(), rand_fq12(), rand_fq12()
        assert f.fq12_mul(a, b) == f.fq12_mul(b, a)
        assert f.fq12_mul(a, f.fq12_inv(a)) == f.FQ12_ONE
        lhs = f.fq12_mul(a, f.fq12_add(b, x))
        rhs = f.fq12_add(f.fq12_mul(a, b), f.fq12_mul(a, x))
        assert lhs == rhs

    def test_frobenius_is_q_power(self):
        a = rand_fq12()
        assert f.fq12_frob(a) == f.fq12_pow(a, P.Q)
        assert f.fq12_frob_n(a, 2) == f.fq12_frob(f.fq12_frob(a))


class TestCurves:
    def test_g1_group_law(self):
        g = c.g1_gen
        assert c.g1_is_on_curve(g)
        assert c.g1_mul(g, P.R) is None
        p2 = c.g1_add(g, g)
        assert c.g1_is_on_curve(p2)
        assert c.g1_add(p2, c.g1_neg(g)) == g
        a, b = rand_fr(), rand_fr()
        assert c.g1_add(c.g1_mul(g, a), c.g1_mul(g, b)) == c.g1_mul(g, (a + b) % P.R)

    def test_g2_group_law(self):
        g = c.g2_gen
        assert c.g2_is_on_curve(g)
        assert c.g2_mul(g, P.R) is None
        a, b = rand_fr(), rand_fr()
        assert c.g2_add(c.g2_mul(g, a), c.g2_mul(g, b)) == c.g2_mul(g, (a + b) % P.R)

    def test_jubjub_group_law(self):
        g = pd.segment_generator(0)
        assert c.jj_is_on_curve(g)
        assert c.jj_mul(g, P.JUBJUB_RS) == c.JJ_IDENTITY
        a, b = rng.randrange(P.JUBJUB_RS), rng.randrange(P.JUBJUB_RS)
        assert c.jj_add(c.jj_mul(g, a), c.jj_mul(g, b)) == c.jj_mul(g, a + b)
        assert c.jj_add(g, c.jj_neg(g)) == c.JJ_IDENTITY

    def test_g1_multiexp_matches_sum(self):
        pts = [c.g1_mul(c.g1_gen, rand_fr()) for _ in range(5)]
        ss = [rand_fr() for _ in range(5)]
        acc = None
        for p, s in zip(pts, ss):
            acc = c.g1_add(acc, c.g1_mul(p, s))
        assert c.g1_multiexp(pts, ss) == acc


class TestPairing:
    def test_bilinearity(self):
        a, b = rand_fr(), rand_fr()
        e = pr.pairing(c.g1_gen, c.g2_gen)
        assert e != f.FQ12_ONE
        lhs = pr.pairing(c.g1_mul(c.g1_gen, a), c.g2_mul(c.g2_gen, b))
        assert lhs == f.fq12_pow(e, a * b % P.R)

    def test_additivity_in_g1(self):
        a, b = rand_fr(), rand_fr()
        p1, p2 = c.g1_mul(c.g1_gen, a), c.g1_mul(c.g1_gen, b)
        lhs = pr.pairing(c.g1_add(p1, p2), c.g2_gen)
        rhs = f.fq12_mul(pr.pairing(p1, c.g2_gen), pr.pairing(p2, c.g2_gen))
        assert lhs == rhs

    def test_pairing_check_product(self):
        a, b = rand_fr(), rand_fr()
        pairs = [
            (c.g1_mul(c.g1_gen, a), c.g2_mul(c.g2_gen, b)),
            (c.g1_neg(c.g1_mul(c.g1_gen, a * b % P.R)), c.g2_gen),
        ]
        assert pr.pairing_check(pairs)
        pairs[1] = (pairs[1][0], c.g2_mul(c.g2_gen, 2))
        assert not pr.pairing_check(pairs)

    def test_infinity_pairs_to_one(self):
        assert pr.pairing(None, c.g2_gen) == f.FQ12_ONE
        assert pr.pairing(c.g1_gen, None) == f.FQ12_ONE

    def test_native_pairing_agrees_with_python(self):
        import os

        from vote_saver_tpu import native_bridge as nb

        if not nb.available():
            return  # native disabled in this environment; python path covered above
        a, b = rand_fr(), rand_fr()
        pairs = [
            (c.g1_mul(c.g1_gen, a), c.g2_mul(c.g2_gen, b)),
            (c.g1_neg(c.g1_mul(c.g1_gen, a * b % P.R)), c.g2_gen),
        ]
        bad = [pairs[0], (pairs[1][0], c.g2_mul(c.g2_gen, 5))]
        os.environ["VSTPU_NATIVE"] = "0"
        nb.get_lib.cache_clear()
        try:
            py_good, py_bad = pr.pairing_check(pairs), pr.pairing_check(bad)
        finally:
            os.environ["VSTPU_NATIVE"] = "1"
            nb.get_lib.cache_clear()
        assert pr.pairing_check(pairs) == py_good is True
        assert pr.pairing_check(bad) == py_bad is False


class TestPedersen:
    def test_generators_distinct_and_in_subgroup(self):
        gens = [pd.segment_generator(j) for j in range(4)]
        assert len(set(gens)) == 4
        for g in gens:
            assert c.jj_is_on_curve(g)
            assert c.jj_mul(g, P.JUBJUB_RS) == c.JJ_IDENTITY

    def test_digest_shape_and_sensitivity(self):
        bits = [rng.randrange(2) for _ in range(255)]
        d = pd.pedersen_hash(bits)
        assert len(d) == P.DIGEST_BITS and set(d) <= {0, 1}
        flipped = list(bits)
        flipped[100] ^= 1
        assert pd.pedersen_hash(flipped) != d

    def test_multi_segment_matches_manual_sum(self):
        # 510-bit message spans 170 windows = 3 segments (63+63+44).
        bits = [rng.randrange(2) for _ in range(510)]
        point = pd.pedersen_point(bits)
        assert c.jj_is_on_curve(point)
        # manual recompute
        padded = bits + [0] * ((-len(bits)) % 3)
        acc = c.JJ_IDENTITY
        for j in range(0, len(padded) // 3, 63):
            k = 0
            for lw, w in enumerate(range(j, min(j + 63, len(padded) // 3))):
                s0, s1, s2 = padded[3 * w], padded[3 * w + 1], padded[3 * w + 2]
                k += (1 + s0 + 2 * s1) * (1 - 2 * s2) << (4 * lw)
            acc = c.jj_add(acc, c.jj_mul(pd.segment_generator(j // 63), k))
        assert point == acc

    def test_window_digit_range(self):
        digits = {pd.window_digit(s0, s1, s2) for s0 in (0, 1) for s1 in (0, 1) for s2 in (0, 1)}
        assert digits == {1, 2, 3, 4, -1, -2, -3, -4}

    def test_bit_roundtrip(self):
        x = rng.randrange(P.R)
        assert pd.le_bits_to_int(pd.int_to_le_bits(x, 255)) == x
