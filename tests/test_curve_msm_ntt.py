"""Device curve/MSM/NTT kernels vs the Python-int oracle.

Sizes are kept small — these run on the CPU backend in CI; the bench harness
exercises large shapes on real TPU.
"""

import random

import jax
import numpy as np
import pytest

from vote_saver_tpu.params import R, fr_spec
from vote_saver_tpu.ops import curve_ops as co
from vote_saver_tpu.ops import msm
from vote_saver_tpu.ops import limbs as lb
from vote_saver_tpu.ops.ntt import get_ntt
from vote_saver_tpu.refimpl import curves as rc
from vote_saver_tpu.refimpl import pedersen as pd

rng = random.Random(0xBEEF)


class TestG1:
    def test_add_with_special_cases(self):
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(4)]
        qts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(4)]
        pts += [None, pts[0], pts[1], None]
        qts += [qts[0], pts[0], rc.g1_neg(pts[1]), None]
        got = co.g1_from_device(jax.jit(co.g1_ops().add)(co.g1_to_device(pts), co.g1_to_device(qts)))
        assert got == [rc.g1_add(p, q) for p, q in zip(pts, qts)]

    def test_double(self):
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(3)] + [None]
        got = co.g1_from_device(jax.jit(co.g1_ops().double)(co.g1_to_device(pts)))
        assert got == [rc.g1_add(p, p) for p in pts]

    def test_scalar_mul_windowed(self):
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(3)] + [rc.g1_gen]
        ks = [rng.randrange(R) for _ in range(3)] + [0]
        got = co.g1_from_device(
            jax.jit(co.g1_ops().scalar_mul_windowed)(
                co.g1_to_device(pts), msm.scalars_to_window_digits(ks)
            )
        )
        assert got == [rc.g1_mul(p, k) for p, k in zip(pts, ks)]

    def test_sum_reduce(self):
        for n in (1, 2, 5, 8):
            pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(n)]
            got = co.g1_from_device(
                jax.jit(lambda p: co.g1_ops().sum_reduce(p))(co.g1_to_device(pts))
            )
            acc = None
            for p in pts:
                acc = rc.g1_add(acc, p)
            assert got[0] == acc

    def test_to_affine(self):
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(2)]
        dev = jax.jit(co.g1_ops().double)(co.g1_to_device(pts))
        aff = jax.jit(co.g1_ops().to_affine)(dev)
        spec_q = __import__("vote_saver_tpu.params", fromlist=["fq_spec"]).fq_spec()
        xs = lb.mont_limbs_to_ints(np.asarray(aff[0]), spec_q)
        ys = lb.mont_limbs_to_ints(np.asarray(aff[1]), spec_q)
        want = [rc.g1_add(p, p) for p in pts]
        assert [(int(x), int(y)) for x, y in zip(xs, ys)] == want


class TestG2:
    def test_add_and_mul(self):
        pts = [rc.g2_mul(rc.g2_gen, rng.randrange(R)) for _ in range(2)] + [None]
        qts = [rc.g2_mul(rc.g2_gen, rng.randrange(R)) for _ in range(2)] + [rc.g2_gen]
        got = co.g2_from_device(jax.jit(co.g2_ops().add)(co.g2_to_device(pts), co.g2_to_device(qts)))
        assert got == [rc.g2_add(p, q) for p, q in zip(pts, qts)]


class TestMSM:
    def test_var_base(self):
        n = 16
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(n)]
        ks = [rng.randrange(R) for _ in range(n)]
        got = co.g1_from_device(
            jax.jit(lambda p, d: msm.msm_var_base(co.g1_ops(), p, d))(
                co.g1_to_device(pts), msm.scalars_to_window_digits(ks)
            )
        )
        assert got[0] == rc.g1_multiexp(pts, ks)

    def test_fixed_base(self):
        tbl = msm.FixedBaseTable(rc.g1_gen, "g1")
        ks = [rng.randrange(R) for _ in range(8)] + [0, 1]
        got = co.g1_from_device(
            jax.jit(lambda d: tbl.mul(co.g1_ops(), d))(tbl.digits(ks))
        )
        assert got == [rc.g1_mul(rc.g1_gen, k) for k in ks]

    def test_pippenger(self):
        n = 32
        pts = [rc.g1_mul(rc.g1_gen, rng.randrange(R)) for _ in range(n)]
        ks = [rng.randrange(R) for _ in range(n)]
        ks[0] = 0  # zero scalar must drop out
        got = co.g1_from_device(
            jax.jit(lambda p, s: msm.msm_pippenger(co.g1_ops(), p, s))(
                co.g1_to_device(pts), msm.scalars_to_limbs(ks)
            )
        )
        assert got[0] == rc.g1_multiexp(pts, ks)


class TestNTT:
    def test_forward_matches_evaluation(self):
        n = 16
        ntt = get_ntt(n)
        spec = fr_spec()
        coeffs = [rng.randrange(R) for _ in range(n)]
        got = list(
            lb.mont_limbs_to_ints(np.asarray(jax.jit(ntt.ntt)(lb.ints_to_mont_limbs(coeffs, spec))), spec)
        )
        want = [sum(coeffs[j] * pow(ntt.w, i * j, R) for j in range(n)) % R for i in range(n)]
        assert got == want

    def test_roundtrips(self):
        n = 32
        ntt = get_ntt(n)
        spec = fr_spec()
        coeffs = lb.ints_to_mont_limbs([rng.randrange(R) for _ in range(n)], spec)
        rt = np.asarray(jax.jit(lambda c: ntt.intt(ntt.ntt(c)))(coeffs))
        assert np.array_equal(rt, coeffs)
        rt = np.asarray(jax.jit(lambda c: ntt.coset_intt(ntt.coset_ntt(c)))(coeffs))
        assert np.array_equal(rt, coeffs)


class TestEdwards:
    def test_add_and_reduce(self):
        jj = co.jj_ops()
        jp = [rc.jj_mul(pd.segment_generator(0), rng.randrange(10**6)) for _ in range(5)]
        jq = [rc.jj_mul(pd.segment_generator(1), rng.randrange(10**6)) for _ in range(5)]
        got = co.jj_from_device(jax.jit(jj.add)(co.jj_to_device(jp), co.jj_to_device(jq)))
        assert got == [rc.jj_add(p, q) for p, q in zip(jp, jq)]
        got = co.jj_from_device(jax.jit(lambda p: jj.sum_reduce(p))(co.jj_to_device(jp)))
        acc = rc.JJ_IDENTITY
        for p in jp:
            acc = rc.jj_add(acc, p)
        assert got[0] == acc
