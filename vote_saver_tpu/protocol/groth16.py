"""Groth16 zk-SNARK over BLS12-381: setup / batched prove / verify.

Replaces crypto3's r1cs_gg_ppzksnark (SURVEY.md §2B `zk` row; generate called
at reference common.hpp:916-917, prove/verify inside the SAVER encrypt/verify
wrappers per README.md:273).  TPU-first split:

  * setup: QAP evaluation at tau on the host (sparse, one-time), CRS point
    generation as chunked fixed-base multiplications on device;
  * prove: witness -> A/B/C domain evaluations (host sparse matvec), the
    H(t) = (AB-C)/Z_H division via device coset NTTs, then one G2 + four G1
    MSMs per proof — batched over voters with vmap'd Pippenger;
  * verify: 4-term pairing-product check on the host oracle.

The QAP uses the libsnark-style input-consistency extension: the A-polynomial
of each public wire i gains the extra Lagrange term L_{nc+i}, so the domain
is the next power of two above num_constraints + num_primary + 1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..params import R, fr_spec
from ..circuit.r1cs import ConstraintSystem
from ..ops import curve_ops as co
from ..ops import limbs as lb
from ..ops import msm as msm_mod
from ..ops.field_ops import fr_ops
from ..ops.ntt import get_ntt
from ..backend import use_device
from ..refimpl import curves as rc
from ..refimpl import jacobian as rj
from ..refimpl import pairing as rp
from ..utils.rng import FrRandom

# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ProvingKey:
    num_primary: int
    num_vars: int  # including ONE
    domain: int
    # host affine int points (canonical storage; device arrays built lazily)
    a_pts: list  # (num_vars,)
    b1_pts: list
    b2_pts: list  # G2
    h_pts: list  # (domain - 1,)
    l_pts: list  # (num_vars - num_primary - 1,)
    # host ints
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    # sparse matrices (host) for A/B/C evaluation
    coo: dict
    num_constraints: int
    _dev: dict = dataclasses.field(default_factory=dict, repr=False)

    def dev(self, name: str):
        """Device Jacobian arrays for query `name`, built on first use."""
        if name not in self._dev:
            pts = getattr(self, f"{name}_pts")
            conv = co.g2_to_device if name == "b2" else co.g1_to_device
            self._dev[name] = conv(pts)
        return self._dev[name]


@dataclasses.dataclass
class VerificationKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    ic: list  # host affine ints, length num_primary + 1 (index 0 = ONE wire)


@dataclasses.dataclass
class Proof:
    a: tuple  # G1 affine ints
    b: tuple  # G2 affine ints
    c: tuple  # G1 affine ints


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------


def _batch_inv_host(xs: list[int]) -> list[int]:
    """Montgomery-trick batch inversion of nonzero ints mod R."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % R
    inv = pow(prefix[n], R - 2, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv % R
        inv = inv * xs[i] % R
    return out


_FB_CHUNK = 2048


def _fixed_base_batch(group: str, scalars: list[int]):
    """Fixed-base multiplication of many scalars; returns host affine points.

    Device path (TPU): chunked window-table kernel; host path: sequential
    windowed adds (faster than lane-parallel XLA on CPU)."""
    if not use_device():
        return _fb_host(group).mul_many(scalars)
    table = _fb_table(group)
    from_dev = co.g1_from_device if group == "g1" else co.g2_from_device
    fn = _fb_jit(group)
    out = []
    for off in range(0, len(scalars), _FB_CHUNK):
        chunk = scalars[off : off + _FB_CHUNK]
        padded = chunk + [0] * (_FB_CHUNK - len(chunk))
        res = fn(table.digits(padded))
        out.extend(from_dev(res)[: len(chunk)])
    return out


_fb_host_cache: dict = {}


def _fb_host(group: str):
    if group not in _fb_host_cache:
        base = rc.g1_gen if group == "g1" else rc.g2_gen
        _fb_host_cache[group] = rj.FixedBaseHost(base, group)
    return _fb_host_cache[group]


_fb_cache: dict = {}


def _fb_table(group: str):
    if group not in _fb_cache:
        base = rc.g1_gen if group == "g1" else rc.g2_gen
        _fb_cache[group] = msm_mod.FixedBaseTable(base, group)
    return _fb_cache[group]


_fb_jit_cache: dict = {}


def _fb_jit(group: str):
    if group not in _fb_jit_cache:
        table = _fb_table(group)
        ops = co.g1_ops() if group == "g1" else co.g2_ops()
        _fb_jit_cache[group] = jax.jit(lambda d: table.mul(ops, d))
    return _fb_jit_cache[group]


def qap_evaluate(cs: ConstraintSystem, tau: int):
    """u_i(tau), v_i(tau), w_i(tau) for every wire, plus Z(tau) and domain."""
    nc, ni, m = cs.num_constraints, cs.num_primary, cs.num_vars
    domain = 1
    while domain < nc + ni + 1:
        domain *= 2
    ntt = get_ntt(domain)
    omega = ntt.w
    z_tau = (pow(tau, domain, R) - 1) % R
    # L_k(tau) = Z(tau) * omega^k / (domain * (tau - omega^k))
    omega_pows = [1] * domain
    for k in range(1, domain):
        omega_pows[k] = omega_pows[k - 1] * omega % R
    denoms = [(tau - omega_pows[k]) % R for k in range(domain)]
    denom_inv = _batch_inv_host(denoms)
    n_inv = pow(domain, R - 2, R)
    lag = [z_tau * omega_pows[k] % R * n_inv % R * denom_inv[k] % R for k in range(domain)]

    u = [0] * m
    v = [0] * m
    w = [0] * m
    for k, (a, b, c) in enumerate(cs.constraints):
        for var, coeff in a.items():
            u[var] = (u[var] + coeff * lag[k]) % R
        for var, coeff in b.items():
            v[var] = (v[var] + coeff * lag[k]) % R
        for var, coeff in c.items():
            w[var] = (w[var] + coeff * lag[k]) % R
    # input consistency: A-poly of public wire i (incl. ONE) += L_{nc+i}
    for i in range(ni + 1):
        u[i] = (u[i] + lag[nc + i]) % R
    return u, v, w, z_tau, domain


def setup(cs: ConstraintSystem, rng: FrRandom) -> tuple[ProvingKey, VerificationKey]:
    nc, ni, m = cs.num_constraints, cs.num_primary, cs.num_vars
    tau, alpha, beta, gamma, delta = (rng() for _ in range(5))
    u, v, w, z_tau, domain = qap_evaluate(cs, tau)

    gamma_inv = pow(gamma, R - 2, R)
    delta_inv = pow(delta, R - 2, R)

    ic_exp = [(beta * u[i] + alpha * v[i] + w[i]) % R * gamma_inv % R for i in range(ni + 1)]
    l_exp = [(beta * u[i] + alpha * v[i] + w[i]) % R * delta_inv % R for i in range(ni + 1, m)]
    h_exp = []
    t_pow = 1
    for j in range(domain - 1):
        h_exp.append(t_pow * z_tau % R * delta_inv % R)
        t_pow = t_pow * tau % R

    g1_scalars = (
        u + v + h_exp + l_exp + ic_exp + [alpha, beta, delta]
    )
    g1_points = _fixed_base_batch("g1", g1_scalars)
    ofs = 0

    def take(k):
        nonlocal ofs
        out = g1_points[ofs : ofs + k]
        ofs += k
        return out

    a_pts = take(m)
    b1_pts = take(m)
    h_pts = take(domain - 1)
    l_pts = take(m - ni - 1)
    ic_pts = take(ni + 1)
    alpha_g1, beta_g1, delta_g1 = take(3)

    g2_points = _fixed_base_batch("g2", v + [beta, gamma, delta])
    b2_pts = g2_points[:m]
    beta_g2, gamma_g2, delta_g2 = g2_points[m : m + 3]

    pk = ProvingKey(
        num_primary=ni,
        num_vars=m,
        domain=domain,
        a_pts=a_pts,
        b1_pts=b1_pts,
        b2_pts=b2_pts,
        h_pts=h_pts,
        l_pts=l_pts,
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        coo=cs.to_coo(),
        num_constraints=nc,
    )
    vk = VerificationKey(
        alpha_g1=alpha_g1, beta_g2=beta_g2, gamma_g2=gamma_g2, delta_g2=delta_g2, ic=ic_pts
    )
    return pk, vk


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------


def _abc_evaluations(pk: ProvingKey, wvals: np.ndarray) -> tuple[np.ndarray, ...]:
    """Host sparse matvec: witness (B, m) object ints -> A/B/C evals (B, n)."""
    B = wvals.shape[0]
    n = pk.domain
    outs = []
    for name in ("a", "b", "c"):
        rows, cols, coeffs = pk.coo[name]
        ev = np.zeros((B, n), dtype=object)
        for r_i, c_i, cf in zip(rows, cols, coeffs):
            ev[:, r_i] = (ev[:, r_i] + cf * wvals[:, c_i]) % R
        outs.append(ev)
    a_ev, b_ev, c_ev = outs
    # input-consistency rows
    for i in range(pk.num_primary + 1):
        a_ev[:, pk.num_constraints + i] = wvals[:, i]
    return a_ev, b_ev, c_ev


def _h_coeffs_device(pk: ProvingKey):
    # cached: a fresh jax.jit object would retrace AND recompile every call
    # (remote TPU compiles cost ~25s)
    if "h_fn" in pk._dev:
        return pk._dev["h_fn"]
    ntt = get_ntt(pk.domain)
    f = fr_ops()

    def h_fn(a_ev, b_ev, c_ev):
        ca = ntt.coset_ntt(ntt.intt(a_ev))
        cb = ntt.coset_ntt(ntt.intt(b_ev))
        cc = ntt.coset_ntt(ntt.intt(c_ev))
        h_ev = f.mul(f.sub(f.mul(ca, cb), cc), jnp.asarray(ntt.zh_coset_inv_limbs))
        h = ntt.coset_intt(h_ev)
        return f.from_mont(h)  # standard-form limbs = MSM scalar format

    pk._dev["h_fn"] = jax.jit(h_fn)
    return pk._dev["h_fn"]


def _devaff(pk: ProvingKey, name: str):
    """Device AFFINE point arrays for the scheduled MSM (x, y); infinity is
    encoded (0,0) and skipped inside the madd kernel.  All G1 query arrays
    are zero-padded to one common length so a/b1/l/h share ONE compiled MSM
    program (each distinct point-array shape otherwise costs its own
    multi-minute TPU compile)."""
    d = pk._dev.setdefault("devaff", {})
    if name not in d:
        from ..ops import msm_sched as ms

        pts = getattr(pk, f"{name}_pts")
        conv = ms.g2_affine_to_device if name == "b2" else ms.g1_affine_to_device
        arrs = conv(pts)
        if name != "b2":
            n_max = max(len(pk.a_pts), pk.domain - 1)
            pad = n_max - arrs[0].shape[0]
            if pad:
                widths = ((0, pad),) + ((0, 0),) * (arrs[0].ndim - 1)
                arrs = tuple(np.pad(a, widths) for a in arrs)
        d[name] = jax.device_put(arrs)
    return d[name]


def _trace(label: str, t0: float):
    import os
    import time

    if os.environ.get("VSTPU_TRACE"):
        print(f"[trace] {label}: {time.time()-t0:.2f}s", flush=True)
    return time.time()


def _devaff_padded(pk: ProvingKey, name: str, d: int):
    """_devaff coords padded so the point count divides the mesh axis size
    (pad points are (0, 0) = the madd kernel's infinity encoding).

    NB: starts from the TRUE point count, not _devaff's length-unified
    arrays — the sharded path splits schedules by the scalar count, so the
    point shards must align with those offsets."""
    cache = pk._dev.setdefault("devaff_pad", {})
    key = (name, d)
    if key not in cache:
        x, y = _devaff(pk, name)
        true_n = len(getattr(pk, f"{name}_pts"))
        x, y = x[:true_n], y[:true_n]
        pad = (-true_n) % d
        if pad:
            widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            x, y = jnp.pad(x, widths), jnp.pad(y, widths)
        cache[key] = (x, y)
    return cache[key]


def _prove_msms_sharded(pk: ProvingKey, w_limbs: list, h_limbs: list, mesh):
    """Point-sharded prover MSMs over the mesh's `points` axis.

    Each of the five query MSMs is partitioned point-wise: shard d owns CRS
    rows [d*n/D, (d+1)*n/D) and a conflict-free schedule built from its
    scalar slice; partials all-gather + tree-reduce inside the shard_map
    (parallel/sharded.sharded_msm_scheduled).  This is the multi-chip form of
    the multiexp the reference runs single-threaded (common.hpp:916,1132)."""
    import time

    from ..ops import msm_sched as ms
    from ..parallel import sharded

    d = mesh.shape["points"]
    t0 = time.time()
    aux_limbs = [wl[pk.num_primary + 1 :] for wl in w_limbs]

    def shard_schedules(limbs_list):
        n = limbs_list[0].shape[0]
        pad = (-n) % d
        n_sh = (n + pad) // d
        scheds = []
        for i in range(d):
            sl = []
            for l in limbs_list:
                seg = l[i * n_sh : min((i + 1) * n_sh, n)]
                if seg.shape[0] < n_sh:
                    seg = np.concatenate(
                        [seg, np.zeros((n_sh - seg.shape[0], seg.shape[1]), seg.dtype)]
                    )
                sl.append(seg)
            scheds.append(ms.build_schedule_multi(sl))
        return scheds

    sch_w = shard_schedules(w_limbs)
    sch_aux = shard_schedules(aux_limbs)
    sch_h = shard_schedules(h_limbs)
    t0 = _trace(f"sharded schedules (D={d})", t0)

    queries = (
        ("a", "g1", sch_w, w_limbs),
        ("b1", "g1", sch_w, w_limbs),
        ("b2", "g2", sch_w, w_limbs),
        ("l", "g1", sch_aux, aux_limbs),
        ("h", "g1", sch_h, h_limbs),
    )
    outs, excs = {}, {}
    with mesh:
        for name, group, sch, _ll in queries:
            outs[name], excs[name] = sharded.sharded_msm_scheduled(
                mesh, group, _devaff_padded(pk, name, d), sch
            )
    flags = jax.device_get(jnp.stack([excs[n] for n, *_ in queries]))
    # madd doubling corner (adversarially reachable): recompute that query
    # with the complete-formula var-base MSM, same as the unsharded path
    for (name, group, _sch, ll), hit in zip(queries, flags):
        if bool(hit):  # pragma: no cover - adversarial corner
            stacked = jnp.stack([jnp.asarray(sl) for sl in ll])
            digits = msm_mod.limbs_to_window_digits(stacked)
            ops = co.g1_ops() if group == "g1" else co.g2_ops()
            outs[name] = jax.vmap(
                lambda dg: msm_mod.msm_var_base(ops, pk.dev(name), dg)
            )(digits)
    t0 = _trace("sharded msms", t0)
    return outs  # device Jacobian coords, leading dim (B,) per query


def _prove_msms_scheduled(pk: ProvingKey, w_limbs: list, h_limbs: list,
                          defer: bool = False):
    """Per-voter scheduled-bucket MSMs (ops/msm_sched.py).

    w_limbs/h_limbs: per-voter (m, L) / (domain-1, L) plain LE limb arrays.
    One schedule per scalar vector; the witness schedule is shared by the
    a/b1/b2 queries (schedules depend on scalars only).  Falls back to the
    complete-formula var-base MSM per query on the madd doubling corner.
    defer=True returns a zero-arg `finish` closure instead of the outs dict
    (the exc sync + fallback dispatch run when it is called).
    """
    import time

    from ..ops import msm_sched as ms

    B = len(w_limbs)
    t0 = time.time()
    aux_limbs = [wl[pk.num_primary + 1 :] for wl in w_limbs]
    # one multi-part schedule per scalar family; the witness schedule is
    # shared by the a/b1/b2 queries (same scalars, different point sets)
    sch_w = ms.build_schedule_multi(w_limbs)
    sch_aux = ms.build_schedule_multi(aux_limbs)
    sch_h = ms.build_schedule_multi(h_limbs)
    # one shape for the witness-family queries (a/b1/l G1 + b2 G2 share it;
    # w and aux land on the same analytic grid cell naturally).  The h
    # schedule stays SEPARATE: its uniform scalars need ~3x the step count
    # (lambda 61 vs 20 at depth 6), and unifying dragged four queries
    # through h's step budget — ~2x the total MSM device time.  Cost: one
    # extra ~60 s G1 program compile per process, hit only on cold start.
    ms.unify_schedule_shapes(sch_w, sch_aux)
    import os

    if os.environ.get("VSTPU_TRACE"):
        for nm, s in (("w", sch_w), ("aux", sch_aux), ("h", sch_h)):
            print(
                f"[trace] sched[{nm}]: steps={s.codes.shape[0]} "
                f"lanes={s.lanes} entries={s.total_entries} "
                f"orphans={int((s.merge_gather != 0).sum())}",
                flush=True,
            )
    t0 = _trace("schedules", t0)

    def fb(name, group, limbs_list):
        def run():
            stacked = jnp.stack([jnp.asarray(sl) for sl in limbs_list])
            digits = msm_mod.limbs_to_window_digits(stacked)
            ops = co.g1_ops() if group == "g1" else co.g2_ops()
            return jax.vmap(lambda d: msm_mod.msm_var_base(ops, pk.dev(name), d))(
                digits
            )

        return run

    queries = (
        ("a", "g1", sch_w, w_limbs),
        ("b1", "g1", sch_w, w_limbs),
        ("b2", "g2", sch_w, w_limbs),
        ("l", "g1", sch_aux, aux_limbs),
        ("h", "g1", sch_h, h_limbs),
    )
    outs, excs = {}, {}
    for name, group, sch, ll in queries:
        outs[name], excs[name] = ms.msm_scheduled_async(
            group, _devaff(pk, name), sch
        )
        t0 = _trace(f"msm {name} launch (batch {B})", t0)

    def finish():
        # one host sync for all five exception flags (tunnel round trips are
        # slow); deferred so a pipelined caller can overlap the next batch's
        # host work with this batch's device execution
        t1 = time.time()
        flags = jax.device_get(jnp.stack([excs[n] for n, *_ in queries]))
        for (name, group, sch, ll), hit in zip(queries, flags):
            if bool(hit):  # pragma: no cover - adversarial corner
                outs[name] = fb(name, group, ll)()
        _trace("msm exc sync", t1)
        return outs  # device Jacobian coords, leading dim (B,) per query

    if defer:
        return finish
    return finish()


def _prove_msm_fn(pk: ProvingKey):
    # cached on the key itself (avoids the id()-reuse hazard of a global map).
    # Windowed var-base MSM: measured ~3x faster than sort-based Pippenger on
    # TPU at prover sizes, with far cheaper compiles.
    if "msm_fn" not in pk._dev:
        g1, g2 = co.g1_ops(), co.g2_ops()

        def msms(w_scalars, aux_scalars, h_scalars):
            vb = lambda ops, pts, s: msm_mod.msm_var_base(
                ops, pts, msm_mod.limbs_to_window_digits(s)
            )
            a = jax.vmap(lambda s: vb(g1, pk.dev("a"), s))(w_scalars)
            b1 = jax.vmap(lambda s: vb(g1, pk.dev("b1"), s))(w_scalars)
            b2 = jax.vmap(lambda s: vb(g2, pk.dev("b2"), s))(w_scalars)
            l = jax.vmap(lambda s: vb(g1, pk.dev("l"), s))(aux_scalars)
            h = jax.vmap(lambda s: vb(g1, pk.dev("h"), s))(h_scalars)
            return a, b1, b2, l, h

        pk._dev["msm_fn"] = jax.jit(msms)
    return pk._dev["msm_fn"]


def _h_scalars(pk: ProvingKey, wvals: np.ndarray) -> np.ndarray:
    """H(t) coefficients as plain limb arrays, via device coset NTTs."""
    spec = fr_spec()
    a_ev, b_ev, c_ev = _abc_evaluations(pk, wvals)
    h_fn = _h_coeffs_device(pk)
    h_std = np.asarray(
        h_fn(
            lb.ints_to_mont_limbs(a_ev, spec),
            lb.ints_to_mont_limbs(b_ev, spec),
            lb.ints_to_mont_limbs(c_ev, spec),
        )
    )  # (B, n, L) standard-form limbs
    return h_std[:, : pk.domain - 1, :]


_ABC_CHUNK = 4096


def _abc_coo_device(pk: ProvingKey):
    """Per-matrix COO tensors for the device A/B/C evaluation, cached on pk.

    Coefficients are stored in DOUBLE-Montgomery form (c*R_mont^2 mod N): one
    Montgomery mul against the Montgomery-form witness yields the canonical
    value of (c*w)*R_mont^2... *R^-1 = (c*w)_mont * R_mont, so after the
    per-row lazy sum a single reduce_lazy lands exactly on Montgomery form.
    The A matrix gains the libsnark input-consistency entries
    (row nc+i, col i, coeff 1).  Entries are padded to a chunk multiple with
    zero coefficients (zero products scatter harmlessly into row 0).
    """
    if "abc_coo" in pk._dev:
        return pk._dev["abc_coo"]
    spec = fr_spec()
    out = {}
    for name in ("a", "b", "c"):
        rows, cols, coeffs = pk.coo[name]
        rows, cols = np.asarray(rows, np.int32), np.asarray(cols, np.int32)
        coeffs = list(coeffs)
        if name == "a":
            extra = pk.num_primary + 1
            rows = np.concatenate(
                [rows, pk.num_constraints + np.arange(extra, dtype=np.int32)]
            )
            cols = np.concatenate([cols, np.arange(extra, dtype=np.int32)])
            coeffs = coeffs + [1] * extra
        c2m = [spec.to_mont(spec.to_mont(int(c))) for c in coeffs]
        nnz = rows.shape[0]
        P = -(-nnz // _ABC_CHUNK) * _ABC_CHUNK
        pad = P - nnz
        rows = np.concatenate([rows, np.zeros(pad, np.int32)])
        cols = np.concatenate([cols, np.zeros(pad, np.int32)])
        c2m_l = np.concatenate(
            [lb.ints_to_limbs(c2m, spec), np.zeros((pad, spec.num_limbs), lb.limb_dtype(spec))]
        )
        K = P // _ABC_CHUNK
        out[name] = (
            rows.reshape(K, _ABC_CHUNK),
            cols.reshape(K, _ABC_CHUNK),
            c2m_l.reshape(K, _ABC_CHUNK, spec.num_limbs),
        )
    pk._dev["abc_coo"] = out
    return out


def _abc_h_w_fn(pk: ProvingKey):
    """Cached jit: Montgomery witness (B, m, L) ->
    (h_std (B, domain-1, L), w_std (B, m, L), sat (B,) bool).

    The device replacement for the host sparse matvec `_abc_evaluations` +
    coset-NTT `_h_scalars`: COO gather + Montgomery mul (double-Montgomery
    coefficients) + scatter-add of lazy limb columns, one reduce_lazy per
    row, then the (AB-C)/Z_H coset division.  `sat` is the batched R1CS
    satisfiability check (the reference's BOOST_ASSERT ladder,
    common.hpp:1110-1128, as one device reduction).
    """
    if "abc_h_w_fn" in pk._dev:
        return pk._dev["abc_h_w_fn"]
    f = fr_ops()
    ntt = get_ntt(pk.domain)
    coo = _abc_coo_device(pk)
    n, nc = pk.domain, pk.num_constraints

    def matvec(w_mont, name):
        rows_c, cols_c, c2m_c = (jnp.asarray(x) for x in coo[name])
        B = w_mont.shape[0]
        acc0 = jnp.zeros((B, n, f.L), f.dtype)

        def body(acc, xs):
            rows_k, cols_k, c2m_k = xs
            wg = jnp.take(w_mont, cols_k, axis=1)  # (B, CH, L)
            cw = f.mul(c2m_k[None], wg)  # canonical (< N); exact limbs
            return acc.at[:, rows_k].add(cw), None

        acc, _ = jax.lax.scan(body, acc0, (rows_c, cols_c, c2m_c))
        # rows hold <= 254 terms (largest LC = one packing chunk), so lazy
        # limb sums stay far below the reduce_lazy column bound
        return f.reduce_lazy(acc)

    def fn(w_mont):
        a_ev = matvec(w_mont, "a")
        b_ev = matvec(w_mont, "b")
        c_ev = matvec(w_mont, "c")
        # satisfiability: AB-C vanishes on every constraint row (rows past
        # nc are the input-consistency block where B is identically zero)
        diff = f.sub(f.mul(a_ev, b_ev), c_ev)
        sat = jnp.all(f.is_zero(diff), axis=-1)
        ca = ntt.coset_ntt(ntt.intt(a_ev))
        cb = ntt.coset_ntt(ntt.intt(b_ev))
        cc = ntt.coset_ntt(ntt.intt(c_ev))
        h_ev = f.mul(f.sub(f.mul(ca, cb), cc), jnp.asarray(ntt.zh_coset_inv_limbs))
        h = ntt.coset_intt(h_ev)
        h_std = f.from_mont(h)[:, : n - 1]
        w_std = f.from_mont(w_mont)
        return h_std, w_std, sat

    pk._dev["abc_h_w_fn"] = jax.jit(fn)
    return pk._dev["abc_h_w_fn"]


def prove_msms_device(pk: ProvingKey, w_mont, mesh=None, defer: bool = False):
    """Witness tensor -> the five query MSMs, kept ON DEVICE.

    Returns (outs, w_std): outs maps query name -> device Jacobian coords
    with leading dim (B,); w_std is the standard-form limb witness on host.
    The blinding/SAVER tail consumes `outs` without a host round trip
    (protocol/ballot_dev.finalize_ballots_device).  Raises AssertionError if
    any assignment fails the R1CS (the reference's in-production
    BOOST_ASSERT, common.hpp:1110-1128, as one batched device reduction).
    defer=True (single-chip scheduled path only) returns (finish, w_std)
    with `finish()` producing the outs dict — the pipelined vote stream
    overlaps the next batch's host work with this batch's device MSMs.
    """
    import time

    t0 = time.time()
    h_std, w_std, sat = _abc_h_w_fn(pk)(w_mont)
    h_np, w_np, sat_np = jax.device_get((h_std, w_std, sat))
    assert bool(np.all(sat_np)), "witness generation failed (R1CS unsatisfied)"
    t0 = _trace("abc+h device", t0)
    if mesh is not None:
        outs = _prove_msms_sharded(pk, list(w_np), list(h_np), mesh)
        if defer:
            return (lambda: outs), w_np
    else:
        outs = _msms_device(pk, list(w_np), list(h_np), defer=defer)
    _trace("msms launch" if defer else "msms total", t0)
    return outs, w_np


def prove_device(
    pk: ProvingKey, w_mont, rng: FrRandom, mesh=None
) -> tuple[list[Proof], np.ndarray]:
    """Prove from a device-resident Montgomery witness tensor (B, m, L)
    (as produced by circuit.witness_dev.generate_witness_device).

    Returns (proofs, w_std): w_std is the standard-form limb witness on host
    (callers slice the primary input out of it).  Raises AssertionError if
    any assignment fails the R1CS (mirroring the reference's in-production
    BOOST_ASSERT at common.hpp:1110-1128).
    """
    import time

    if use_device() or mesh is not None:
        outs, w_np = prove_msms_device(pk, w_mont, mesh=mesh)
        t0 = time.time()
        pts = _msms_from_device(outs)
        t0 = _trace("msm from_device", t0)
    else:
        t0 = time.time()
        h_std, w_std, sat = _abc_h_w_fn(pk)(w_mont)
        h_np, w_np, sat_np = jax.device_get((h_std, w_std, sat))
        assert bool(np.all(sat_np)), "witness generation failed (R1CS unsatisfied)"
        t0 = _trace("abc+h device", t0)
        spec = fr_spec()
        w_ints = lb.limbs_to_ints(w_np, spec)
        h_ints = lb.limbs_to_ints(h_np, spec)
        pts = _msms_host_native(pk, list(w_ints), list(h_ints))
        t0 = _trace("msms total", t0)
    a_pts, b1_pts, b2_pts, l_pts, h_pts = pts
    return _blind_and_assemble(pk, a_pts, b1_pts, b2_pts, l_pts, h_pts, rng, t0), w_np


def _msms_host_native(pk: ProvingKey, w_ints: list, h_ints: list):
    """CPU path: the native MSM releases the GIL, so the 5 MSMs x B voters
    run on a thread pool (true parallelism through the C library)."""
    import concurrent.futures as cf

    B = len(w_ints)
    jobs = []
    for i in range(B):
        wl = [int(x) for x in w_ints[i]]
        jobs.append((pk.a_pts, wl, "g1"))
        jobs.append((pk.b1_pts, wl, "g1"))
        jobs.append((pk.b2_pts, wl, "g2"))
        jobs.append((pk.l_pts, wl[pk.num_primary + 1 :], "g1"))
        jobs.append((pk.h_pts, [int(x) for x in h_ints[i]], "g1"))
    with cf.ThreadPoolExecutor(max_workers=min(16, len(jobs))) as pool:
        results = list(pool.map(lambda j: rj.msm_host(j[0], j[1], group=j[2]), jobs))
    return (results[0::5], results[1::5], results[2::5], results[3::5], results[4::5])


def _msms_device(pk: ProvingKey, w_limbs: list, h_limbs: list,
                 defer: bool = False):
    """Device MSMs for all five queries; returns {name: device Jacobian
    coords with leading dim (B,)} — results stay device-resident so the
    blinding/SAVER tail (protocol/ballot_dev.py) can consume them without a
    host round trip.  defer=True returns the finish closure instead."""
    import os

    if os.environ.get("VSTPU_MSM", "scheduled") == "varbase":
        w_scalars = np.stack(w_limbs)
        aux_scalars = np.stack([wl[pk.num_primary + 1 :] for wl in w_limbs])
        h_scalars = np.stack(h_limbs)
        msm_fn = _prove_msm_fn(pk)
        a_j, b1_j, b2_j, l_j, h_j = msm_fn(w_scalars, aux_scalars, h_scalars)
        outs = dict(a=a_j, b1=b1_j, b2=b2_j, l=l_j, h=h_j)
        if defer:
            return lambda: outs
        return outs
    return _prove_msms_scheduled(pk, w_limbs, h_limbs, defer=defer)


def _msms_from_device(outs: dict):
    return (
        co.g1_from_device(outs["a"]),
        co.g1_from_device(outs["b1"]),
        co.g2_from_device(outs["b2"]),
        co.g1_from_device(outs["l"]),
        co.g1_from_device(outs["h"]),
    )


def prove(pk: ProvingKey, wvals: np.ndarray, rng: FrRandom) -> list[Proof]:
    """wvals: (B, num_vars) object ints (full assignments, col 0 == 1)."""
    import time

    B = wvals.shape[0]
    spec = fr_spec()
    t0 = time.time()
    h_scalars = _h_scalars(pk, wvals)
    t0 = _trace("h_scalars (abc + coset NTTs)", t0)

    if use_device():
        w_limbs = [msm_mod.scalars_to_limbs(wvals[i]) for i in range(B)]
        h_limbs = [h_scalars[i] for i in range(B)]
        a_pts, b1_pts, b2_pts, l_pts, h_pts = _msms_from_device(
            _msms_device(pk, w_limbs, h_limbs)
        )
    else:
        h_ints = lb.limbs_to_ints(h_scalars, spec)
        a_pts, b1_pts, b2_pts, l_pts, h_pts = _msms_host_native(
            pk, list(wvals), list(h_ints)
        )

    t0 = _trace("msms total", t0)
    return _blind_and_assemble(pk, a_pts, b1_pts, b2_pts, l_pts, h_pts, rng, t0)


def _blind_and_assemble(pk, a_pts, b1_pts, b2_pts, l_pts, h_pts, rng, t0=0.0):
    B = len(a_pts)
    # blinding: two rounds of batched pointwise muls (native-accelerated)
    rs = [(rng(), rng()) for _ in range(B)]
    d1 = rj.g1_mul_many(
        [pk.delta_g1] * (3 * B),
        [r for r, _ in rs] + [s for _, s in rs] + [r * s % R for r, s in rs],
    )
    d2 = rj.g2_mul_many([pk.delta_g2] * B, [s for _, s in rs])
    a_list, b1_list = [], []
    for i in range(B):
        a_list.append(rc.g1_add(rc.g1_add(pk.alpha_g1, a_pts[i]), d1[i]))
        b1_list.append(rc.g1_add(rc.g1_add(pk.beta_g1, b1_pts[i]), d1[B + i]))
    round2 = rj.g1_mul_many(
        a_list + b1_list, [s for _, s in rs] + [r for r, _ in rs]
    )
    proofs = []
    for i in range(B):
        b2 = rc.g2_add(rc.g2_add(pk.beta_g2, b2_pts[i]), d2[i])
        c = rc.g1_add(l_pts[i], h_pts[i])
        c = rc.g1_add(c, round2[i])
        c = rc.g1_add(c, round2[B + i])
        c = rc.g1_add(c, rc.g1_neg(d1[2 * B + i]))
        proofs.append(Proof(a=a_list[i], b=b2, c=c))
    _trace("proof assembly", t0)
    return proofs


# ---------------------------------------------------------------------------
# Verify (host pairings)
# ---------------------------------------------------------------------------


def ic_combine(vk: VerificationKey, primary: list[int]):
    return rc.g1_add(vk.ic[0], rj.msm_host(vk.ic[1 : 1 + len(primary)], primary))


def verify(vk: VerificationKey, primary: list[int], proof: Proof) -> bool:
    """e(A,B) == e(alpha,beta) * e(IC(primary), gamma) * e(C, delta)."""
    icp = ic_combine(vk, primary)
    return rp.pairing_check(
        [
            (proof.a, proof.b),
            (rc.g1_neg(vk.alpha_g1), vk.beta_g2),
            (rc.g1_neg(icp), vk.gamma_g2),
            (rc.g1_neg(proof.c), vk.delta_g2),
        ]
    )
