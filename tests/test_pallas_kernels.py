"""Fused Pallas field/curve kernels vs the Python reference implementation.

Two layers:
  * emitter math (FqEmit/Fq2Emit/_jac_* formulas) runs EAGERLY on CPU with a
    shim accumulator — fast, covers all the arithmetic incl. G2;
  * pallas_call plumbing runs in interpreter mode on minimal G1 cases only
    (interpreting a fused G2 kernel takes minutes; the TPU path exercises it).
"""

import os
import random

import numpy as np
import pytest


class _EagerAcc:
    """Stands in for the VMEM scratch ref when emitters run outside pallas."""

    def __init__(self, shape, dtype):
        import jax.numpy as jnp

        self.arr = jnp.zeros(shape, dtype)

    def __setitem__(self, k, v):
        if k == slice(None):  # full overwrite resizes (mul zeroes it first)
            import jax.numpy as jnp

            self.arr = jnp.asarray(v)
            return
        self.arr = self.arr.at[k].set(v)

    def __getitem__(self, k):
        return self.arr[k]


@pytest.fixture(scope="module")
def env16():
    """Fresh module copies under the 16-bit limb layout + interpret mode."""
    import sys

    old_limb = os.environ.get("VSTPU_LIMB_BITS")
    os.environ["VSTPU_LIMB_BITS"] = "16"
    os.environ["VSTPU_PALLAS_INTERPRET"] = "1"
    mods = [m for m in sys.modules if m.startswith("vote_saver_tpu")]
    saved = {m: sys.modules.pop(m) for m in mods}
    import vote_saver_tpu.params as params
    import vote_saver_tpu.ops.limbs as lb
    import vote_saver_tpu.ops.pallas_field as pf
    import vote_saver_tpu.ops.curve_ops as co
    import vote_saver_tpu.refimpl.curves as rc

    yield dict(params=params, lb=lb, pf=pf, co=co, rc=rc)
    sys.modules.update(saved)
    if old_limb is None:
        os.environ.pop("VSTPU_LIMB_BITS", None)
    else:
        os.environ["VSTPU_LIMB_BITS"] = old_limb
    os.environ.pop("VSTPU_PALLAS_INTERPRET", None)


def _to_cols(ints, spec, lb):
    """ints -> (L, B) mont columns (kernel layout)."""
    return np.asarray(lb.ints_to_mont_limbs(ints, spec)).T


def _from_cols(cols, spec, lb):
    return [int(v) for v in lb.mont_limbs_to_ints(np.asarray(cols).T, spec)]


def _emit(env16):
    pf, params = env16["pf"], env16["params"]
    e = pf.FqEmit(params.fq_spec())
    e.acc = _EagerAcc((2 * e.L, 128), np.uint32)
    return e


def test_emitter_field_ops(env16):
    params, lb = env16["params"], env16["lb"]
    Q = params.Q
    spec = params.fq_spec()
    e = _emit(env16)
    rng = random.Random(3)
    xs = [rng.randrange(Q) for _ in range(125)] + [0, 1, Q - 1]
    ys = [rng.randrange(Q) for _ in range(125)] + [Q - 1, 1, Q - 1]
    a, b = _to_cols(xs, spec, lb), _to_cols(ys, spec, lb)
    assert _from_cols(e.mul(a, b), spec, lb) == [x * y % Q for x, y in zip(xs, ys)]
    assert _from_cols(e.add(a, b), spec, lb) == [(x + y) % Q for x, y in zip(xs, ys)]
    assert _from_cols(e.sub(a, b), spec, lb) == [(x - y) % Q for x, y in zip(xs, ys)]
    assert _from_cols(e.sq(a), spec, lb) == [x * x % Q for x in xs]
    z = np.asarray(e.is_zero(_to_cols([0, 1, Q - 1, 0], spec, lb)[:, :4]))
    assert list(z) == [True, False, False, True]


def test_emitter_fq2_and_g2_formulas(env16):
    params, lb, pf, rc = env16["params"], env16["lb"], env16["pf"], env16["rc"]
    from vote_saver_tpu.refimpl import field as rf

    spec = params.fq_spec()
    e2 = pf.Fq2Emit(_emit(env16))
    rng = random.Random(4)

    def pack2(vals):  # list of (c0, c1) -> tuple of (L, B) columns
        c0 = _to_cols([v[0] for v in vals], spec, lb)
        c1 = _to_cols([v[1] for v in vals], spec, lb)
        return (c0, c1)

    def unpack2(t):
        c0 = _from_cols(t[0], spec, lb)
        c1 = _from_cols(t[1], spec, lb)
        return list(zip(c0, c1))

    xs = [(rng.randrange(params.Q), rng.randrange(params.Q)) for _ in range(128)]
    ys = [(rng.randrange(params.Q), rng.randrange(params.Q)) for _ in range(128)]
    got = unpack2(e2.mul(pack2(xs), pack2(ys)))
    exp = [rf.fq2_mul(x, y) for x, y in zip(xs, ys)]
    assert got == exp
    got = unpack2(e2.sq(pack2(xs)))
    assert got == [rf.fq2_sq(x) for x in xs]

    # G2 jacobian add through the shared formula, eager
    pts = [rc.g2_mul(rc.g2_gen, rng.randrange(1, 2**64)) for _ in range(4)]
    qts = [rc.g2_mul(rc.g2_gen, rng.randrange(1, 2**64)) for _ in range(2)] + [
        pts[2],
        rc.g2_gen,
    ]
    one2 = [(1, 0)] * 4

    def jac2(ps):
        return (
            pack2([p[0] for p in ps]),
            pack2([p[1] for p in ps]),
            pack2(one2),
        )

    out = pf._jac_add(e2, jac2(pts), jac2(qts), complete=True)
    ox, oy, oz = (unpack2(c) for c in out)
    for i in range(4):
        zi = rf.fq2_inv(oz[i])
        zi2 = rf.fq2_sq(zi)
        ax = rf.fq2_mul(ox[i], zi2)
        ay = rf.fq2_mul(oy[i], rf.fq2_mul(zi, zi2))
        assert (ax, ay) == rc.g2_add(pts[i], qts[i])


def test_emitter_g1_madd(env16):
    params, lb, pf, rc = env16["params"], env16["lb"], env16["pf"], env16["rc"]
    import jax.numpy as jnp

    spec = params.fq_spec()
    e = _emit(env16)
    rng = random.Random(5)
    P = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 2**64)) for _ in range(4)]
    Qp = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 2**64)) for _ in range(4)]
    acc = (
        _to_cols([p[0] for p in P], spec, lb),
        _to_cols([p[1] for p in P], spec, lb),
        _to_cols([1, 1, 1, 0], spec, lb),  # last lane: acc = infinity
    )
    q = (
        _to_cols([p[0] for p in Qp], spec, lb),
        _to_cols([p[1] for p in Qp], spec, lb),
    )
    sign = jnp.asarray([False, True, False, False])
    active = jnp.asarray([True, True, False, True])
    out, exc = pf._jac_madd(e, acc, q, sign, active)
    assert not bool(np.asarray(exc).any())
    Qneg = params.Q
    exp = [
        rc.g1_add(P[0], Qp[0]),
        rc.g1_add(P[1], (Qp[1][0], (-Qp[1][1]) % Qneg)),
        P[2],  # inactive lane unchanged
        Qp[3],  # infinity accumulator lifts the point
    ]
    ox, oy, oz = (
        _from_cols(out[0], spec, lb),
        _from_cols(out[1], spec, lb),
        _from_cols(out[2], spec, lb),
    )
    for i in range(4):
        z = ox and oz[i]
        zi = pow(oz[i], params.Q - 2, params.Q)
        ax = ox[i] * zi * zi % params.Q
        ay = oy[i] * zi * zi % params.Q * zi % params.Q
        assert (ax, ay) == exp[i]
    # doubling corner flags exceptional
    out, exc = pf._jac_madd(
        e,
        (acc[0][:, :1], acc[1][:, :1], _to_cols([1], spec, lb)),
        (acc[0][:, :1].copy(), acc[1][:, :1].copy()),  # q == acc -> doubling
        jnp.asarray([False]),
        jnp.asarray([True]),
    )
    assert bool(np.asarray(exc).all())


def test_emitter_loop_cios(env16):
    """FqEmitLoop (rolled CIOS — the TPU default) matches the unrolled
    emitter bit-for-bit on mul/sq, including the 0 / 1 / Q-1 edges."""
    params, lb, pf = env16["params"], env16["lb"], env16["pf"]

    Q = params.Q
    spec = params.fq_spec()
    e = pf.FqEmitLoop(spec)
    rng = random.Random(8)
    xs = [rng.randrange(Q) for _ in range(125)] + [0, 1, Q - 1]
    ys = [rng.randrange(Q) for _ in range(125)] + [Q - 1, 1, Q - 1]
    a, b = _to_cols(xs, spec, lb), _to_cols(ys, spec, lb)
    assert _from_cols(e.mul(a, b), spec, lb) == [x * y % Q for x, y in zip(xs, ys)]
    assert _from_cols(e.sq(a), spec, lb) == [x * x % Q for x in xs]


def test_emitter_g1_addx(env16):
    """Flagged distinct add: generic sums, infinity operands, opposite ->
    z3 == 0, and the equal-operands corner raises the flag."""
    params, lb, pf, rc = env16["params"], env16["lb"], env16["pf"], env16["rc"]

    spec = params.fq_spec()
    e = _emit(env16)
    rng = random.Random(9)
    P = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 2**64)) for _ in range(3)]
    Qp = [rc.g1_mul(rc.g1_gen, rng.randrange(1, 2**64)) for _ in range(2)]
    # lanes: generic | p = inf | q = inf | opposite | equal (flagged)
    px = [P[0][0], 1, P[1][0], P[2][0], P[2][0]]
    py = [P[0][1], 1, P[1][1], P[2][1], P[2][1]]
    pz = [1, 0, 1, 1, 1]
    qx = [Qp[0][0], Qp[1][0], 1, P[2][0], P[2][0]]
    qy = [Qp[0][1], Qp[1][1], 1, (-P[2][1]) % params.Q, P[2][1]]
    qz = [1, 1, 0, 1, 1]
    p = tuple(_to_cols(v, spec, lb) for v in (px, py, pz))
    q = tuple(_to_cols(v, spec, lb) for v in (qx, qy, qz))
    out, exc = pf._jac_addx(e, p, q)
    flags = list(np.asarray(exc))
    assert flags == [False, False, False, False, True]
    ox, oy, oz = (_from_cols(c, spec, lb) for c in out)
    exp = [rc.g1_add(P[0], Qp[0]), Qp[1], P[1]]
    for i in range(3):
        zi = pow(oz[i], params.Q - 2, params.Q)
        ax = ox[i] * zi * zi % params.Q
        ay = oy[i] * zi * zi % params.Q * zi % params.Q
        assert (ax, ay) == exp[i]
    assert oz[3] == 0  # opposite points -> infinity via z3 == 0


@pytest.mark.slow  # interpret-mode pallas_call: multi-minute XLA compile on the 2-core rig
def test_pallas_call_g1_plumbing(env16):
    """Interpret-mode pallas_call round trip: mont_mul + g1 double + madd."""
    params, lb, pf, co, rc = (
        env16["params"],
        env16["lb"],
        env16["pf"],
        env16["co"],
        env16["rc"],
    )
    import jax.numpy as jnp

    spec = params.fq_spec()
    rng = random.Random(6)
    xs = [rng.randrange(params.Q) for _ in range(3)]
    ys = [rng.randrange(params.Q) for _ in range(3)]
    out = pf.mont_mul_pallas(
        "fq", lb.ints_to_mont_limbs(xs, spec), lb.ints_to_mont_limbs(ys, spec)
    )
    got = [int(v) for v in lb.mont_limbs_to_ints(np.asarray(out), spec)]
    assert got == [x * y % params.Q for x, y in zip(xs, ys)]

    a = rc.g1_mul(rc.g1_gen, 12345)
    b = rc.g1_mul(rc.g1_gen, 678)
    r = pf.g1_double_pallas(co.g1_to_device([a, b, None]))
    assert co.g1_from_device(r) == [rc.g1_add(a, a), rc.g1_add(b, b), None]

    acc = co.g1_to_device([a])
    qx, qy = pf and (
        lb.ints_to_mont_limbs([b[0]], spec),
        lb.ints_to_mont_limbs([b[1]], spec),
    )
    out, exc = pf.g1_madd_pallas(
        acc, (qx, qy), jnp.asarray([False]), jnp.asarray([True])
    )
    assert co.g1_from_device(out) == [rc.g1_add(a, b)]
    assert int(np.asarray(exc)[0]) == 0
