"""Device (XLA/JAX) witness generation for the voting circuit.

Replaces the host object-int witness walk (`VotingCircuit.generate_witness`,
mirroring the reference's per-voter C++ walk at common.hpp:1054-1128) with one
jitted batched program: every gadget family becomes a vectorised device stage

  * Pedersen gadgets: digit gather from host-precomputed window tables, a
    log-depth complete-Edwards prefix scan over windows, ONE tree-batched
    field inversion for all intermediate affine points, then pure batched
    muls for the EdwardsAdd internals (A,B,C,D,E,x3,y3);
  * digest decompositions: limb->bit shifts (plus a cumulative-product chain
    for the canonical sn comparison bits);
  * packings / Merkle selects / one-hot: integer bit ops;

and all values scatter once into a (B, num_vars, L) Montgomery limb tensor —
the exact tensor the device A/B/C evaluation (groth16._abc_h_fn) consumes.

Bit-for-bit parity with the host path is enforced by tests
(tests/test_witness_dev.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R, MSG_SIZE, SECRET_KEY_BITS, DIGEST_BITS, CHUNK_SIZE, fr_spec
from ..ops import limbs as lb
from ..ops import curve_ops as co
from ..ops.field_ops import fr_ops

# ---------------------------------------------------------------------------
# Generic device helpers
# ---------------------------------------------------------------------------


def batch_inv_axis(f, a, axis: int):
    """All-element inversion over `axis` with ONE Fermat exponentiation.

    Hillis-Steele inclusive prefix and suffix products (log2 n mul rounds as
    ONE lax.scan body — not log2 n inlined mul instances; XLA graph size is
    what dominates this backend's compile time), a single f.inv on the
    total, then inv_i = pre_i * suf_i * total_inv.  ~4*log2(n) muls per
    element instead of ~380 (the Fermat chain).  Zero entries produce
    garbage (callers guarantee nonzero, as with f.inv)."""
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    one = jnp.broadcast_to(jnp.asarray(f.one_mont), a.shape)

    def scan_prod(x):
        # inclusive running product along axis 0
        if n == 1:
            return x
        steps = (n - 1).bit_length()
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(n).reshape((n,) + (1,) * (x.ndim - 1))

        def body(xc, shift):
            rolled = jnp.where(idx >= shift, jnp.roll(xc, shift, axis=0), one)
            return f.mul(xc, rolled), None

        x, _ = jax.lax.scan(body, x, shifts)
        return x

    incl = scan_prod(a)
    pre = jnp.concatenate([one[:1], incl[:-1]], axis=0)  # exclusive prefix
    suf_incl = scan_prod(a[::-1])[::-1]
    suf = jnp.concatenate([suf_incl[1:], one[:1]], axis=0)  # exclusive suffix
    total_inv = f.inv(incl[-1])
    out = f.mul(f.mul(pre, suf), total_inv[None])
    return jnp.moveaxis(out, 0, axis)


def _limb_bits():
    return fr_spec().limb_bits


def bits_to_std_limbs(bits):
    """(B, nbits) 0/1 int32 -> (B, L) standard-form limbs (value < 2^nbits)."""
    spec = fr_spec()
    L, lbits = spec.num_limbs, spec.limb_bits
    dt = jnp.uint32 if lbits == 16 else jnp.uint64
    b = jnp.asarray(bits, dt)
    nbits = b.shape[-1]
    pad = L * lbits - nbits
    assert pad >= 0
    if pad:
        b = jnp.concatenate([b, jnp.zeros(b.shape[:-1] + (pad,), dt)], axis=-1)
    b = b.reshape(*b.shape[:-1], L, lbits)
    weights = (jnp.ones((), dt) << jnp.arange(lbits, dtype=dt))
    return jnp.sum(b * weights, axis=-1, dtype=dt)


def std_limbs_to_bits(x, nbits: int):
    """(..., L) standard-form limbs -> (..., nbits) int32 bits (LE)."""
    spec = fr_spec()
    lbits = spec.limb_bits
    shifts = jnp.arange(lbits, dtype=x.dtype)
    bits = (x[..., :, None] >> shifts) & x.dtype.type(1)
    bits = bits.reshape(*x.shape[:-1], x.shape[-1] * lbits)
    return bits[..., :nbits].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Per-gadget host-side "programs" (index maps + constant tables)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _PedersenProg:
    W: int
    nbits: int  # un-padded input bit count
    t_idx: np.ndarray  # (W,)
    xw_idx: np.ndarray  # (W,)
    add_idx: np.ndarray  # (W-1, 7): A,B,C,D,E,x3,y3
    xs4: np.ndarray  # (W, 4, L) mont limbs
    ys4: np.ndarray  # (W, 4, L) mont limbs


def _pedersen_prog(gadget, nbits: int) -> _PedersenProg:
    spec = fr_spec()
    W = len(gadget.windows)
    t_idx = np.array([w[3] for w in gadget.windows], np.int32)
    xw_idx = np.array([w[4] for w in gadget.windows], np.int32)
    add_idx = np.array(
        [[a.A, a.B, a.C, a.D, a.E, a.x3, a.y3] for a in gadget.adds], np.int32
    ).reshape(-1, 7)
    xs4 = lb.ints_to_mont_limbs(
        [[p[0] for p in row] for row in gadget.consts], spec
    )
    ys4 = lb.ints_to_mont_limbs(
        [[p[1] for p in row] for row in gadget.consts], spec
    )
    return _PedersenProg(W, nbits, t_idx, xw_idx, add_idx, xs4, ys4)


@dataclasses.dataclass
class _DecompProg:
    bits_idx: np.ndarray  # (255,)
    canonical: bool
    lt_positions: np.ndarray  # (nset,) bit positions of R-1, MSB-first
    lt_t_idx: np.ndarray  # (nset,)


def _decomp_prog(gadget) -> _DecompProg:
    bits_idx = np.array(gadget.bits, np.int32)
    if gadget.canonical:
        lt_positions = np.array([s[0] for s in gadget.lt_steps], np.int32)
        lt_t_idx = np.array([s[1] for s in gadget.lt_steps], np.int32)
    else:
        lt_positions = np.zeros(0, np.int32)
        lt_t_idx = np.zeros(0, np.int32)
    return _DecompProg(bits_idx, gadget.canonical, lt_positions, lt_t_idx)


@dataclasses.dataclass
class _Program:
    num_vars: int
    depth: int
    eid_bits: int
    m_idx: np.ndarray
    eid_bit_idx: np.ndarray
    sk_bit_idx: np.ndarray
    addr_idx: np.ndarray
    sib_idx: np.ndarray  # (depth, 255)
    eid_pack_idx: np.ndarray
    rt_pack_idx: np.ndarray
    sn_pack_idx: np.ndarray
    left_idx: np.ndarray  # (depth, 255)
    pk_hash: _PedersenProg
    pk_dec: _DecompProg
    leaf_hash: _PedersenProg
    leaf_dec: _DecompProg
    level_hash: list  # depth x _PedersenProg
    level_dec: list  # depth x _DecompProg
    sn_hash: _PedersenProg
    sn_dec: _DecompProg


_prog_cache: dict = {}


def witness_program(circ) -> _Program:
    key = (circ.tree_depth, circ.eid_bits, _limb_bits())
    if key in _prog_cache:
        return _prog_cache[key]
    p = circ._parts
    cs = circ.cs
    m_idx = np.arange(1, 1 + MSG_SIZE, dtype=np.int32)
    eid_chunks = (circ.eid_bits + CHUNK_SIZE - 1) // CHUNK_SIZE
    eid_pack_idx = np.array(p["eid_pack"].packed_vars, np.int32)
    rt_pack_idx = np.array(p["rt_pack"].packed_vars, np.int32)
    sn_pack_idx = np.array(p["sn_pack"].packed_vars, np.int32)
    prog = _Program(
        num_vars=cs.num_vars,
        depth=circ.tree_depth,
        eid_bits=circ.eid_bits,
        m_idx=m_idx,
        eid_bit_idx=np.array(p["eid_bit_vars"], np.int32),
        sk_bit_idx=np.array(p["sk_bit_vars"], np.int32),
        addr_idx=np.array(p["addr_vars"], np.int32),
        sib_idx=np.array(p["sib_vars"], np.int32),
        eid_pack_idx=eid_pack_idx,
        rt_pack_idx=rt_pack_idx,
        sn_pack_idx=sn_pack_idx,
        left_idx=np.array([lvl.left for lvl in p["levels"]], np.int32),
        pk_hash=_pedersen_prog(p["pk_hash"], SECRET_KEY_BITS),
        pk_dec=_decomp_prog(p["pk_dec"]),
        leaf_hash=_pedersen_prog(p["leaf_hash"], DIGEST_BITS),
        leaf_dec=_decomp_prog(p["leaf_dec"]),
        level_hash=[_pedersen_prog(lvl.hash, 2 * DIGEST_BITS) for lvl in p["levels"]],
        level_dec=[_decomp_prog(lvl.decompose) for lvl in p["levels"]],
        sn_hash=_pedersen_prog(p["sn_hash"], circ.eid_bits + SECRET_KEY_BITS),
        sn_dec=_decomp_prog(p["sn_dec"]),
    )
    _prog_cache[key] = prog
    return prog


# ---------------------------------------------------------------------------
# Device stages
# ---------------------------------------------------------------------------


class _Collector:
    """Accumulates (idx, values) pairs, scattered once into the witness."""

    def __init__(self):
        self.bit_idx: list = []
        self.bit_vals: list = []
        self.field_idx: list = []
        self.field_vals: list = []

    def bits(self, idx: np.ndarray, vals):
        if idx.size:
            self.bit_idx.append(np.asarray(idx, np.int32).reshape(-1))
            self.bit_vals.append(vals.reshape(vals.shape[0], -1))

    def fields(self, idx: np.ndarray, vals):
        if idx.size:
            self.field_idx.append(np.asarray(idx, np.int32).reshape(-1))
            self.field_vals.append(vals.reshape(vals.shape[0], -1, vals.shape[-1]))

    def scatter(self, f, num_vars: int, B: int):
        L = f.L
        one = jnp.asarray(f.one_mont)
        wit = jnp.zeros((B, num_vars, L), f.dtype)
        wit = wit.at[:, 0, :].set(jnp.broadcast_to(one, (B, L)))
        bi = np.concatenate(self.bit_idx)
        bv = jnp.concatenate(self.bit_vals, axis=1).astype(f.dtype)
        wit = wit.at[:, bi, :].set(bv[..., None] * one)
        fi = np.concatenate(self.field_idx)
        fv = jnp.concatenate(self.field_vals, axis=1)
        wit = wit.at[:, fi, :].set(fv)
        return wit


def _pedersen_core(f, jj, xs4, ys4, bits, W: int):
    """Pure Pedersen gadget math on traced window tables.

    bits: (B, nbits<=3W) int32; xs4/ys4: (W, 4, L) traced mont limbs.
    Returns (t (B,W), xw (B,W,L), addvals (B,W-1,7,L) or None,
    ax_last, ay_last)."""
    B = bits.shape[0]
    pad = 3 * W - bits.shape[1]
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((B, pad), jnp.int32)], axis=1)
    s0, s1, s2 = bits[:, 0::3], bits[:, 1::3], bits[:, 2::3]  # (B, W)
    t = s0 * s1

    sel = s0 + 2 * s1  # (B, W)
    warange = jnp.arange(W)[None, :]
    x_sel = xs4[warange, sel]  # (B, W, L)
    y_sel = ys4[warange, sel]
    xw = f.select(s2 == 1, f.neg(x_sel), x_sel)

    # extended coords of the window points; inclusive prefix sum over W as
    # ONE scanned Hillis-Steele body (out-of-range partners -> identity)
    ident = jj.identity_like(xw)
    pts = (xw, y_sel, ident[1], f.mul(xw, y_sel))  # X, Y, Z=1, T=XY
    if W > 1:
        steps = (W - 1).bit_length()
        shifts = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
        idx = jnp.arange(W).reshape(1, W, 1)

        def body(pc, shift):
            shifted = tuple(
                jnp.where(idx >= shift, jnp.roll(c, shift, axis=1), i)
                for i, c in zip(ident, pc)
            )
            return jj.add(pc, shifted), None

        pts, _ = jax.lax.scan(body, pts, shifts)

    zinv = batch_inv_axis(f, pts[2], axis=1)
    ax = f.mul(pts[0], zinv)  # (B, W, L)
    ay = f.mul(pts[1], zinv)

    vals = None
    if W > 1:
        x1, y1 = ax[:, :-1], ay[:, :-1]
        x2, y2 = xw[:, 1:], y_sel[:, 1:]
        A = f.mul(x1, y2)
        Bv = f.mul(y1, x2)
        C = f.mul(x1, x2)
        D = f.mul(y1, y2)
        E = f.mul(C, D)
        vals = jnp.stack([A, Bv, C, D, E, ax[:, 1:], ay[:, 1:]], axis=2)
    return t, xw, vals, ax[:, -1], ay[:, -1]


def _run_pedersen(f, jj, prog: _PedersenProg, bits, col: _Collector):
    """bits: (B, nbits) int32.  Emits t/xw/add vars; returns the digest point
    affine coords (ax, ay) (B, L) mont."""
    t, xw, vals, ax_l, ay_l = _pedersen_core(
        f, jj, jnp.asarray(prog.xs4), jnp.asarray(prog.ys4), bits, prog.W
    )
    col.bits(prog.t_idx, t)
    col.fields(prog.xw_idx, xw)
    if prog.add_idx.size:
        col.fields(prog.add_idx, vals)
    return ax_l, ay_l


@functools.cache
def _lt_const_positions():
    c = R - 1
    return np.array([i for i in range(DIGEST_BITS - 1, -1, -1) if (c >> i) & 1], np.int32)


def _decompose_core(f, x_mont, lt_positions):
    """x_mont (B, L) -> (digest bits (B, 255), lt-chain t values or None)."""
    x_std = f.from_mont(x_mont)
    bits = std_limbs_to_bits(x_std, DIGEST_BITS)  # (B, 255)
    t_vals = None
    if lt_positions is not None and lt_positions.size:
        gathered = bits[:, lt_positions]  # (B, nset)
        t_vals = jnp.cumprod(gathered, axis=1)
    return bits, t_vals


def _run_decompose(f, prog: _DecompProg, x_mont, col: _Collector):
    """x_mont (B, L) -> digest bits (B, 255) int32; emits bit + lt-t vars."""
    bits, t_vals = _decompose_core(
        f, x_mont, prog.lt_positions if prog.canonical else None
    )
    col.bits(prog.bits_idx, bits)
    if prog.canonical:
        col.bits(prog.lt_t_idx, t_vals)
    return bits


def _run_packing(f, idx: np.ndarray, bits, col: _Collector):
    """bits (B, nbits) -> packed field values per 254-bit chunk."""
    nchunks = idx.shape[0]
    outs = []
    for k in range(nchunks):
        chunk = bits[:, k * CHUNK_SIZE : (k + 1) * CHUNK_SIZE]
        std = bits_to_std_limbs(chunk)
        outs.append(f.to_mont(std))
    col.fields(idx, jnp.stack(outs, axis=1))


def _build_wgen(prog: _Program):
    f = fr_ops()
    jj = co.jj_ops()

    # stacked per-level constants: every Merkle level shares one gadget shape
    # (2*DIGEST_BITS input bits), so the whole tree walk runs as ONE scanned
    # body instead of `depth` inlined copies of the largest Pedersen gadget —
    # the depth-6 witness program was 724 s of XLA compile before this
    lv_xs4 = np.stack([p.xs4 for p in prog.level_hash])
    lv_ys4 = np.stack([p.ys4 for p in prog.level_hash])
    lv_W = prog.level_hash[0].W
    assert all(p.W == lv_W for p in prog.level_hash)
    lv_lt_pos = prog.level_dec[0].lt_positions  # R-1 bit positions: constant
    assert all(
        np.array_equal(p.lt_positions, lv_lt_pos) for p in prog.level_dec
    )
    canon_lv = bool(prog.level_dec[0].canonical)
    assert all(p.canonical == canon_lv for p in prog.level_dec)

    def wgen(vote_idx, eid_bits, sk_bits, addr_bits, sib_bits):
        B = vote_idx.shape[0]
        col = _Collector()
        m = (vote_idx[:, None] == jnp.arange(MSG_SIZE)[None, :]).astype(jnp.int32)
        col.bits(prog.m_idx, m)
        col.bits(prog.eid_bit_idx, eid_bits)
        col.bits(prog.sk_bit_idx, sk_bits)
        col.bits(prog.addr_idx, addr_bits)
        col.bits(prog.sib_idx, sib_bits)

        _run_packing(f, prog.eid_pack_idx, eid_bits, col)

        pk_x, _ = _run_pedersen(f, jj, prog.pk_hash, sk_bits, col)
        pk_bits = _run_decompose(f, prog.pk_dec, pk_x, col)

        leaf_x, _ = _run_pedersen(f, jj, prog.leaf_hash, pk_bits, col)
        cur = _run_decompose(f, prog.leaf_dec, leaf_x, col)

        def level_body(cur, xs):
            xs4_k, ys4_k, addr_k, sib_k = xs
            addr = addr_k[:, None]  # (B, 1)
            left = jnp.where(addr == 1, sib_k, cur)
            right = jnp.where(addr == 1, cur, sib_k)
            t, xw, addvals, lx, _ = _pedersen_core(
                f, jj, xs4_k, ys4_k,
                jnp.concatenate([left, right], axis=1), lv_W,
            )
            bits, ltt = _decompose_core(f, lx, lv_lt_pos if canon_lv else None)
            outs = (left, t, xw, addvals, bits) + ((ltt,) if canon_lv else ())
            return bits, outs

        cur, lv = jax.lax.scan(
            level_body,
            cur,
            (
                jnp.asarray(lv_xs4),
                jnp.asarray(lv_ys4),
                jnp.moveaxis(addr_bits, 1, 0),
                jnp.moveaxis(sib_bits, 1, 0),
            ),
        )
        lv = [jnp.moveaxis(x, 0, 1) for x in lv]  # each (B, depth, ...)
        left_s, t_s, xw_s, add_s, bits_s = lv[:5]
        col.bits(prog.left_idx, left_s)
        col.bits(np.stack([p.t_idx for p in prog.level_hash]), t_s)
        col.fields(np.stack([p.xw_idx for p in prog.level_hash]), xw_s)
        col.fields(np.stack([p.add_idx for p in prog.level_hash]), add_s)
        col.bits(np.stack([p.bits_idx for p in prog.level_dec]), bits_s)
        if canon_lv:
            col.bits(np.stack([p.lt_t_idx for p in prog.level_dec]), lv[5])

        _run_packing(f, prog.rt_pack_idx, cur, col)

        sn_x, _ = _run_pedersen(
            f, jj, prog.sn_hash, jnp.concatenate([eid_bits, sk_bits], axis=1), col
        )
        sn_bits = _run_decompose(f, prog.sn_dec, sn_x, col)
        _run_packing(f, prog.sn_pack_idx, sn_bits, col)

        return col.scatter(f, prog.num_vars, B)

    return wgen


_wgen_jit_cache: dict = {}


def generate_witness_device(circ, vote_idx, eid_bits_le, sk_bits, voter_idx, sib_bits):
    """Batched device witness: same inputs as VotingCircuit.generate_witness.

    Returns a (B, num_vars, L) Montgomery limb jnp array (device-resident).
    """
    prog = witness_program(circ)
    key = (circ.tree_depth, circ.eid_bits, _limb_bits())
    if key not in _wgen_jit_cache:
        _wgen_jit_cache[key] = jax.jit(_build_wgen(prog))
    fn = _wgen_jit_cache[key]

    vote = np.asarray(vote_idx, np.int32).reshape(-1)
    B = vote.shape[0]
    eid = np.broadcast_to(
        np.asarray(eid_bits_le).astype(np.int32), (B, circ.eid_bits)
    )
    sk = np.asarray(sk_bits).astype(np.int32).reshape(B, SECRET_KEY_BITS)
    vidx = np.asarray(voter_idx, np.int64).reshape(-1)
    addr = ((vidx[:, None] >> np.arange(circ.tree_depth)[None, :]) & 1).astype(np.int32)
    sib = np.asarray(sib_bits).astype(np.int32).reshape(B, circ.tree_depth, DIGEST_BITS)
    return fn(vote, eid, sk, addr, sib)


def witness_to_host_ints(w_mont) -> np.ndarray:
    """(B, m, L) mont limbs -> (B, m) object ints (for parity tests)."""
    spec = fr_spec()
    return lb.mont_limbs_to_ints(np.asarray(w_mont), spec)
