// vs_native: host-side BLS12-381 curve kernels for the vote_saver_tpu runtime.
//
// The CPU execution provider behind vote_saver_tpu.refimpl.jacobian: Fq/Fq2
// Montgomery arithmetic on 6x64-bit limbs (__int128 CIOS), Jacobian G1/G2
// group law, Pippenger MSM and windowed fixed-base multiplication, exported
// over a plain C ABI (consumed via ctypes — no pybind11 dependency).
//
// Role: replaces the reference's crypto3 multiexp on hosts without a TPU
// (CRS generation, proving MSMs, SAVER encryption); the TPU path lives in
// vote_saver_tpu/ops.  Interface contract documented in
// vote_saver_tpu/native_bridge.py.
//
// Points cross the ABI as affine coordinates in *standard* (non-Montgomery)
// form, 6 little-endian u64 limbs per Fq element; scalars as 32-byte
// little-endian integers.  Infinity is flagged out-of-band.

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

namespace {

constexpr int NL = 6;  // limbs per Fq element

struct Fq {
  u64 v[NL];
};

constexpr Fq Q = {{0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
                   0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
constexpr u64 N0INV = 0x89f3fffcfffcfffdULL;
constexpr Fq R_MONT = {{0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
                        0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL}};
constexpr Fq R2 = {{0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
                    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL}};

inline bool is_zero(const Fq &a) {
  u64 acc = 0;
  for (int i = 0; i < NL; i++) acc |= a.v[i];
  return acc == 0;
}

inline bool geq_q(const Fq &a) {
  for (int i = NL - 1; i >= 0; i--) {
    if (a.v[i] > Q.v[i]) return true;
    if (a.v[i] < Q.v[i]) return false;
  }
  return true;  // equal
}

inline void sub_q(Fq &a) {
  u64 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 t = (u128)a.v[i] - Q.v[i] - borrow;
    a.v[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
}

inline Fq add(const Fq &a, const Fq &b) {
  Fq r;
  u64 carry = 0;
  for (int i = 0; i < NL; i++) {
    u128 t = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)t;
    carry = (u64)(t >> 64);
  }
  if (carry || geq_q(r)) sub_q(r);
  return r;
}

inline Fq sub(const Fq &a, const Fq &b) {
  Fq r;
  u64 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 t = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < NL; i++) {
      u128 t = (u128)r.v[i] + Q.v[i] + carry;
      r.v[i] = (u64)t;
      carry = (u64)(t >> 64);
    }
  }
  return r;
}

inline Fq neg(const Fq &a) {
  if (is_zero(a)) return a;
  Fq r;
  u64 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 t = (u128)Q.v[i] - a.v[i] - borrow;
    r.v[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
  return r;  // final borrow is 0 since Q > a
}

// CIOS Montgomery multiplication.
inline Fq mul(const Fq &a, const Fq &b) {
  u64 t[NL + 2] = {0};
  for (int i = 0; i < NL; i++) {
    u64 carry = 0;
    for (int j = 0; j < NL; j++) {
      u128 cur = (u128)a.v[j] * b.v[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    u128 cur = (u128)t[NL] + carry;
    t[NL] = (u64)cur;
    t[NL + 1] = (u64)(cur >> 64);

    u64 m = t[0] * N0INV;
    u128 acc = (u128)m * Q.v[0] + t[0];
    carry = (u64)(acc >> 64);
    for (int j = 1; j < NL; j++) {
      acc = (u128)m * Q.v[j] + t[j] + carry;
      t[j - 1] = (u64)acc;
      carry = (u64)(acc >> 64);
    }
    acc = (u128)t[NL] + carry;
    t[NL - 1] = (u64)acc;
    t[NL] = t[NL + 1] + (u64)(acc >> 64);
    t[NL + 1] = 0;
  }
  Fq r;
  std::memcpy(r.v, t, sizeof(r.v));
  if (t[NL] || geq_q(r)) sub_q(r);
  return r;
}

inline Fq sqr(const Fq &a) { return mul(a, a); }

inline Fq to_mont(const Fq &a) { return mul(a, R2); }

inline Fq from_mont(const Fq &a) {
  Fq one = {{1, 0, 0, 0, 0, 0}};
  return mul(a, one);
}

inline Fq inv(const Fq &a_mont) {
  // Fermat: a^(Q-2); exponent bits of Q-2 processed MSB->LSB.
  static const Fq QM2 = {{0xb9feffffffffaaa9ULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
                          0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
  Fq result = R_MONT;
  for (int i = NL - 1; i >= 0; i--) {
    for (int b = 63; b >= 0; b--) {
      result = sqr(result);
      if ((QM2.v[i] >> b) & 1) result = mul(result, a_mont);
    }
  }
  return result;
}

// ----------------------------------------------------------------- Fq2 ----

struct Fq2 {
  Fq c0, c1;
};

inline bool is_zero(const Fq2 &a) { return is_zero(a.c0) && is_zero(a.c1); }

inline Fq2 add(const Fq2 &a, const Fq2 &b) { return {add(a.c0, b.c0), add(a.c1, b.c1)}; }
inline Fq2 sub(const Fq2 &a, const Fq2 &b) { return {sub(a.c0, b.c0), sub(a.c1, b.c1)}; }
inline Fq2 neg(const Fq2 &a) { return {neg(a.c0), neg(a.c1)}; }

inline Fq2 mul(const Fq2 &a, const Fq2 &b) {
  Fq t0 = mul(a.c0, b.c0);
  Fq t1 = mul(a.c1, b.c1);
  Fq t2 = mul(add(a.c0, a.c1), add(b.c0, b.c1));
  return {sub(t0, t1), sub(t2, add(t0, t1))};
}

inline Fq2 sqr(const Fq2 &a) {
  Fq t0 = mul(add(a.c0, a.c1), sub(a.c0, a.c1));
  Fq t1 = mul(a.c0, a.c1);
  return {t0, add(t1, t1)};
}

inline Fq2 inv(const Fq2 &a) {
  Fq norm = add(mul(a.c0, a.c0), mul(a.c1, a.c1));
  Fq ni = inv(norm);
  return {mul(a.c0, ni), neg(mul(a.c1, ni))};
}

// ------------------------------------------------- generic group law ------

template <typename F>
struct Jac {
  F x, y, z;
  bool inf;
};

template <typename F>
inline Jac<F> dbl(const Jac<F> &p) {
  if (p.inf) return p;
  F a = sqr(p.x);
  F b = sqr(p.y);
  F c = sqr(b);
  F d = sub(sqr(add(p.x, b)), add(a, c));
  d = add(d, d);
  F e = add(add(a, a), a);
  F x3 = sub(sqr(e), add(d, d));
  F c8 = add(c, c);
  c8 = add(c8, c8);
  c8 = add(c8, c8);
  F y3 = sub(mul(e, sub(d, x3)), c8);
  F z3 = mul(add(p.y, p.y), p.z);
  return {x3, y3, z3, false};
}

template <typename F>
inline Jac<F> padd(const Jac<F> &p, const Jac<F> &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  F z1z1 = sqr(p.z);
  F z2z2 = sqr(q.z);
  F u1 = mul(p.x, z2z2);
  F u2 = mul(q.x, z1z1);
  F s1 = mul(mul(p.y, q.z), z2z2);
  F s2 = mul(mul(q.y, p.z), z1z1);
  F h = sub(u2, u1);
  F rr = sub(s2, s1);
  if (is_zero(h)) {
    if (is_zero(rr)) return dbl(p);
    return {u1, s1, p.z, true};  // infinity
  }
  rr = add(rr, rr);
  F i = sqr(add(h, h));
  F j = mul(h, i);
  F v = mul(u1, i);
  F x3 = sub(sub(sqr(rr), j), add(v, v));
  F s1j = mul(s1, j);
  F y3 = sub(mul(rr, sub(v, x3)), add(s1j, s1j));
  F z3 = mul(sub(sqr(add(p.z, q.z)), add(z1z1, z2z2)), h);
  return {x3, y3, z3, false};
}

// --------------------------------------------------------- Pippenger -----

template <typename F>
void msm(const Jac<F> *pts, const std::uint8_t *scalars, std::size_t n, Jac<F> &out,
         int window_bits) {
  const int num_windows = (256 + window_bits - 1) / window_bits;
  const std::size_t nbuckets = (std::size_t)1 << window_bits;
  std::vector<Jac<F>> buckets(nbuckets);
  out.inf = true;
  for (int w = num_windows - 1; w >= 0; w--) {
    for (int b = 0; b < window_bits; b++) out = dbl(out);
    for (auto &bk : buckets) bk.inf = true;
    const int bit0 = w * window_bits;
    for (std::size_t k = 0; k < n; k++) {
      // extract window digit from 32-byte LE scalar
      u64 d = 0;
      for (int b = 0; b < window_bits; b++) {
        int bit = bit0 + b;
        if (bit < 256 && ((scalars[k * 32 + bit / 8] >> (bit % 8)) & 1)) d |= (u64)1 << b;
      }
      if (d && !pts[k].inf) buckets[d] = padd(buckets[d], pts[k]);
    }
    Jac<F> running, total;
    running.inf = true;
    total.inf = true;
    for (std::size_t b = nbuckets - 1; b >= 1; b--) {
      running = padd(running, buckets[b]);
      total = padd(total, running);
    }
    out = padd(out, total);
  }
}

// ------------------------------------------------------------ C ABI ------

inline Fq load_fq(const u64 *p) {
  Fq r;
  std::memcpy(r.v, p, sizeof(r.v));
  return to_mont(r);
}

inline void store_fq(u64 *p, const Fq &a) {
  Fq s = from_mont(a);
  std::memcpy(p, s.v, sizeof(s.v));
}

template <typename F>
void load_affine(const u64 *coords, const std::uint8_t *inf, std::size_t n, int fdim,
                 std::vector<Jac<F>> &out);

template <>
void load_affine<Fq>(const u64 *coords, const std::uint8_t *inf, std::size_t n, int,
                     std::vector<Jac<Fq>> &out) {
  out.resize(n);
  for (std::size_t i = 0; i < n; i++) {
    out[i].inf = inf[i] != 0;
    if (!out[i].inf) {
      out[i].x = load_fq(coords + i * 2 * NL);
      out[i].y = load_fq(coords + i * 2 * NL + NL);
      out[i].z = R_MONT;  // one
    } else {
      out[i].x = R_MONT;
      out[i].y = R_MONT;
      out[i].z = R_MONT;
    }
  }
}

template <>
void load_affine<Fq2>(const u64 *coords, const std::uint8_t *inf, std::size_t n, int,
                      std::vector<Jac<Fq2>> &out) {
  out.resize(n);
  for (std::size_t i = 0; i < n; i++) {
    out[i].inf = inf[i] != 0;
    const u64 *base = coords + i * 4 * NL;
    if (!out[i].inf) {
      out[i].x = {load_fq(base), load_fq(base + NL)};
      out[i].y = {load_fq(base + 2 * NL), load_fq(base + 3 * NL)};
      out[i].z = {R_MONT, {{0, 0, 0, 0, 0, 0}}};
    } else {
      out[i].x = {R_MONT, {{0, 0, 0, 0, 0, 0}}};
      out[i].y = out[i].x;
      out[i].z = out[i].x;
    }
  }
}

void store_affine_g1(const Jac<Fq> &p, u64 *coords, std::uint8_t *inf) {
  if (p.inf) {
    *inf = 1;
    std::memset(coords, 0, 2 * NL * sizeof(u64));
    return;
  }
  *inf = 0;
  Fq zi = inv(p.z);
  Fq zi2 = sqr(zi);
  store_fq(coords, mul(p.x, zi2));
  store_fq(coords + NL, mul(p.y, mul(zi, zi2)));
}

void store_affine_g2(const Jac<Fq2> &p, u64 *coords, std::uint8_t *inf) {
  if (p.inf) {
    *inf = 1;
    std::memset(coords, 0, 4 * NL * sizeof(u64));
    return;
  }
  *inf = 0;
  Fq2 zi = inv(p.z);
  Fq2 zi2 = sqr(zi);
  Fq2 x = mul(p.x, zi2);
  Fq2 y = mul(p.y, mul(zi, zi2));
  store_fq(coords, x.c0);
  store_fq(coords + NL, x.c1);
  store_fq(coords + 2 * NL, y.c0);
  store_fq(coords + 3 * NL, y.c1);
}

}  // namespace

extern "C" {

// MSM: points as n * (2|4)*6 u64 affine limbs (standard form), inf flags,
// scalars as n * 32 LE bytes.  Output: one affine point + inf flag.
void vs_g1_msm(const u64 *coords, const std::uint8_t *inf, const std::uint8_t *scalars,
               std::size_t n, int window_bits, u64 *out_coords, std::uint8_t *out_inf) {
  std::vector<Jac<Fq>> pts;
  load_affine<Fq>(coords, inf, n, 1, pts);
  Jac<Fq> r;
  msm<Fq>(pts.data(), scalars, n, r, window_bits);
  store_affine_g1(r, out_coords, out_inf);
}

void vs_g2_msm(const u64 *coords, const std::uint8_t *inf, const std::uint8_t *scalars,
               std::size_t n, int window_bits, u64 *out_coords, std::uint8_t *out_inf) {
  std::vector<Jac<Fq2>> pts;
  load_affine<Fq2>(coords, inf, n, 2, pts);
  Jac<Fq2> r;
  msm<Fq2>(pts.data(), scalars, n, r, window_bits);
  store_affine_g2(r, out_coords, out_inf);
}

// Fixed-base: one base point, n scalars -> n affine points.
void vs_g1_fixed_base(const u64 *base_coords, const std::uint8_t *scalars, std::size_t n,
                      int window_bits, u64 *out_coords, std::uint8_t *out_inf) {
  const int num_windows = (256 + window_bits - 1) / window_bits;
  const std::size_t tsize = (std::size_t)1 << window_bits;
  std::uint8_t no_inf = 0;
  std::vector<Jac<Fq>> basev;
  load_affine<Fq>(base_coords, &no_inf, 1, 1, basev);
  // table[w][d] = d * 2^(w*wb) * base
  std::vector<Jac<Fq>> table((std::size_t)num_windows * tsize);
  Jac<Fq> win = basev[0];
  for (int w = 0; w < num_windows; w++) {
    table[w * tsize].inf = true;
    for (std::size_t d = 1; d < tsize; d++)
      table[w * tsize + d] = padd(table[w * tsize + d - 1], win);
    for (int b = 0; b < window_bits; b++) win = dbl(win);
  }
  for (std::size_t k = 0; k < n; k++) {
    Jac<Fq> acc;
    acc.inf = true;
    for (int w = 0; w < num_windows; w++) {
      u64 d = 0;
      for (int b = 0; b < window_bits; b++) {
        int bit = w * window_bits + b;
        if (bit < 256 && ((scalars[k * 32 + bit / 8] >> (bit % 8)) & 1)) d |= (u64)1 << b;
      }
      if (d) acc = padd(acc, table[w * tsize + d]);
    }
    store_affine_g1(acc, out_coords + k * 2 * NL, out_inf + k);
  }
}

void vs_g2_fixed_base(const u64 *base_coords, const std::uint8_t *scalars, std::size_t n,
                      int window_bits, u64 *out_coords, std::uint8_t *out_inf) {
  const int num_windows = (256 + window_bits - 1) / window_bits;
  const std::size_t tsize = (std::size_t)1 << window_bits;
  std::uint8_t no_inf = 0;
  std::vector<Jac<Fq2>> basev;
  load_affine<Fq2>(base_coords, &no_inf, 1, 2, basev);
  std::vector<Jac<Fq2>> table((std::size_t)num_windows * tsize);
  Jac<Fq2> win = basev[0];
  for (int w = 0; w < num_windows; w++) {
    table[w * tsize].inf = true;
    for (std::size_t d = 1; d < tsize; d++)
      table[w * tsize + d] = padd(table[w * tsize + d - 1], win);
    for (int b = 0; b < window_bits; b++) win = dbl(win);
  }
  for (std::size_t k = 0; k < n; k++) {
    Jac<Fq2> acc;
    acc.inf = true;
    for (int w = 0; w < num_windows; w++) {
      u64 d = 0;
      for (int b = 0; b < window_bits; b++) {
        int bit = w * window_bits + b;
        if (bit < 256 && ((scalars[k * 32 + bit / 8] >> (bit % 8)) & 1)) d |= (u64)1 << b;
      }
      if (d) acc = padd(acc, table[w * tsize + d]);
    }
    store_affine_g2(acc, out_coords + k * 4 * NL, out_inf + k);
  }
}

// Pointwise scalar multiplication: n (point, scalar) pairs -> n points.
void vs_g1_mul_many(const u64 *coords, const std::uint8_t *inf, const std::uint8_t *scalars,
                    std::size_t n, u64 *out_coords, std::uint8_t *out_inf) {
  std::vector<Jac<Fq>> pts;
  load_affine<Fq>(coords, inf, n, 1, pts);
  for (std::size_t k = 0; k < n; k++) {
    Jac<Fq> acc;
    acc.inf = true;
    for (int bit = 255; bit >= 0; bit--) {
      acc = dbl(acc);
      if ((scalars[k * 32 + bit / 8] >> (bit % 8)) & 1) acc = padd(acc, pts[k]);
    }
    store_affine_g1(acc, out_coords + k * 2 * NL, out_inf + k);
  }
}

int vs_abi_version() { return 1; }
}

// ===========================================================================
// Pairing: optimal ate over BLS12-381, generic untwist-based Miller loop.
// Mirrors the oracle in refimpl/pairing.py (same algorithm, ~1000x faster);
// exposed as a pairing-*product* check — the only shape every verification
// path (Groth16 verify, SAVER verify_encryption / verify_decryption) needs.
// ===========================================================================

namespace {

// --- Fq6 = Fq2[v]/(v^3 - (u+1)), Fq12 = Fq6[w]/(w^2 - v) ------------------

struct Fq6 {
  Fq2 c0, c1, c2;
};
struct Fq12 {
  Fq6 c0, c1;
};

inline Fq2 mul_xi(const Fq2 &a) { return {sub(a.c0, a.c1), add(a.c0, a.c1)}; }

inline Fq6 add(const Fq6 &a, const Fq6 &b) {
  return {add(a.c0, b.c0), add(a.c1, b.c1), add(a.c2, b.c2)};
}
inline Fq6 sub(const Fq6 &a, const Fq6 &b) {
  return {sub(a.c0, b.c0), sub(a.c1, b.c1), sub(a.c2, b.c2)};
}
inline Fq6 neg(const Fq6 &a) { return {neg(a.c0), neg(a.c1), neg(a.c2)}; }

inline Fq6 mul(const Fq6 &a, const Fq6 &b) {
  Fq2 t0 = mul(a.c0, b.c0);
  Fq2 t1 = mul(a.c1, b.c1);
  Fq2 t2 = mul(a.c2, b.c2);
  Fq2 c0 = add(t0, mul_xi(sub(mul(add(a.c1, a.c2), add(b.c1, b.c2)), add(t1, t2))));
  Fq2 c1 = add(sub(mul(add(a.c0, a.c1), add(b.c0, b.c1)), add(t0, t1)), mul_xi(t2));
  Fq2 c2 = add(sub(mul(add(a.c0, a.c2), add(b.c0, b.c2)), add(t0, t2)), t1);
  return {c0, c1, c2};
}
inline Fq6 sqr(const Fq6 &a) { return mul(a, a); }
inline Fq6 mul_by_v(const Fq6 &a) { return {mul_xi(a.c2), a.c0, a.c1}; }

inline Fq6 inv(const Fq6 &a) {
  Fq2 c0 = sub(sqr(a.c0), mul_xi(mul(a.c1, a.c2)));
  Fq2 c1 = sub(mul_xi(sqr(a.c2)), mul(a.c0, a.c1));
  Fq2 c2 = sub(sqr(a.c1), mul(a.c0, a.c2));
  Fq2 t = add(mul(a.c0, c0), mul_xi(add(mul(a.c2, c1), mul(a.c1, c2))));
  Fq2 ti = inv(t);
  return {mul(c0, ti), mul(c1, ti), mul(c2, ti)};
}

inline Fq12 add(const Fq12 &a, const Fq12 &b) { return {add(a.c0, b.c0), add(a.c1, b.c1)}; }
inline Fq12 sub(const Fq12 &a, const Fq12 &b) { return {sub(a.c0, b.c0), sub(a.c1, b.c1)}; }

inline Fq12 mul(const Fq12 &a, const Fq12 &b) {
  Fq6 t0 = mul(a.c0, b.c0);
  Fq6 t1 = mul(a.c1, b.c1);
  Fq6 c1 = sub(mul(add(a.c0, a.c1), add(b.c0, b.c1)), add(t0, t1));
  return {add(t0, mul_by_v(t1)), c1};
}
inline Fq12 sqr(const Fq12 &a) { return mul(a, a); }

inline Fq12 inv(const Fq12 &a) {
  Fq6 t = inv(sub(sqr(a.c0), mul_by_v(sqr(a.c1))));
  return {mul(a.c0, t), neg(mul(a.c1, t))};
}

inline Fq12 conj(const Fq12 &a) { return {a.c0, neg(a.c1)}; }

inline Fq2 fq2_zero() { return {{{0, 0, 0, 0, 0, 0}}, {{0, 0, 0, 0, 0, 0}}}; }
inline Fq2 fq2_one() { return {R_MONT, {{0, 0, 0, 0, 0, 0}}}; }
inline Fq6 fq6_zero() { return {fq2_zero(), fq2_zero(), fq2_zero()}; }
inline Fq6 fq6_one() { return {fq2_one(), fq2_zero(), fq2_zero()}; }
inline Fq12 fq12_one() { return {fq6_one(), fq6_zero()}; }

inline bool is_one(const Fq12 &a) {
  Fq12 d = sub(a, fq12_one());
  const u64 *p = (const u64 *)&d;
  u64 acc = 0;
  for (size_t i = 0; i < sizeof(Fq12) / 8; i++) acc |= p[i];
  return acc == 0;
}

inline Fq12 pow_limbs(const Fq12 &a, const u64 *exp, int nlimbs) {
  Fq12 r = fq12_one();
  bool started = false;
  for (int i = nlimbs - 1; i >= 0; i--) {
    for (int b = 63; b >= 0; b--) {
      if (started) r = sqr(r);
      if ((exp[i] >> b) & 1) {
        if (started) r = mul(r, a);
        else { r = a; started = true; }
      }
    }
  }
  return r;
}

constexpr u64 EXP_Q2[12] = {0x26aa00001c718e39ULL, 0x7ced6b1d76382eabULL, 0x162c338362113cfdULL, 0x66bf91ed3e71b743ULL, 0x292e85a87091a049ULL, 0x1d68619c86185c7bULL, 0xf53149330978ef01ULL, 0x50a62cfd16ddca6eULL, 0x66e59e49349e8bd0ULL, 0xe2dc90e50e7046b4ULL, 0x4bd278eaa22f25e9ULL, 0x02a437a4b8c35fc7ULL};
constexpr u64 EXP_HARD[20] = {0xe516c3f438e3ba79ULL, 0xfa9912aae208ccf1ULL, 0x905ce937335d5b68ULL, 0xc71a2629b0dea236ULL, 0x83774940996754c8ULL, 0x21d160aeb6a1e799ULL, 0x2ed0b283ed237db4ULL, 0x915c97f36c6f1821ULL, 0x67f17fcbde783765ULL, 0x2378b9039096d1b7ULL, 0x7988f8761bdc51dcULL, 0x2076995003fc77a1ULL, 0x827eca0ba621315bULL, 0xe5a72bce8d63cb9fULL, 0xf68f7764c28b6f8aULL, 0x2f230063cf081517ULL, 0x94506632528d6a9aULL, 0xd3cde88eeb996ca3ULL, 0xc0bd38c3195c899eULL, 0x000f686b3d807d01ULL};

// |BLS_X| = 0xd201000000010000 (the parameter is negative; conjugate at end)
constexpr u64 ATE_X = 0xd201000000010000ULL;

// --- E(Fq12) affine points for the generic Miller loop --------------------

struct P12 {
  Fq12 x, y;
  bool inf;
};

inline Fq12 fq12_scalar3() {
  Fq three = add(add(R_MONT, R_MONT), R_MONT);
  Fq12 r = fq12_one();
  r.c0.c0.c0 = three;
  return r;
}

inline P12 e12_add(const P12 &p, const P12 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  Fq12 dx = sub(q.x, p.x);
  Fq12 num, den;
  const u64 *pp = (const u64 *)&dx;
  u64 acc = 0;
  for (size_t i = 0; i < sizeof(Fq12) / 8; i++) acc |= pp[i];
  if (acc == 0) {
    Fq12 dy = sub(q.y, p.y);
    const u64 *py = (const u64 *)&dy;
    u64 accy = 0;
    for (size_t i = 0; i < sizeof(Fq12) / 8; i++) accy |= py[i];
    if (accy != 0) return {fq12_one(), fq12_one(), true};
    num = mul(fq12_scalar3(), sqr(p.x));
    den = add(p.y, p.y);
  } else {
    num = sub(q.y, p.y);
    den = dx;
  }
  Fq12 lam = mul(num, inv(den));
  Fq12 x3 = sub(sub(sqr(lam), p.x), q.x);
  Fq12 y3 = sub(mul(lam, sub(p.x, x3)), p.y);
  return {x3, y3, false};
}

inline Fq12 line_eval(const P12 &a, const P12 &b, const Fq12 &xp, const Fq12 &yp) {
  // line through a,b (tangent if equal) evaluated at (xp, yp)
  Fq12 dx = sub(b.x, a.x);
  const u64 *pp = (const u64 *)&dx;
  u64 acc = 0;
  for (size_t i = 0; i < sizeof(Fq12) / 8; i++) acc |= pp[i];
  Fq12 num, den;
  if (acc == 0) {
    Fq12 dy = sub(b.y, a.y);
    const u64 *py = (const u64 *)&dy;
    u64 accy = 0;
    for (size_t i = 0; i < sizeof(Fq12) / 8; i++) accy |= py[i];
    if (accy != 0) return sub(xp, a.x);  // vertical line
    num = mul(fq12_scalar3(), sqr(a.x));
    den = add(a.y, a.y);
  } else {
    num = sub(b.y, a.y);
    den = dx;
  }
  Fq12 lam = mul(num, inv(den));
  return sub(sub(yp, a.y), mul(lam, sub(xp, a.x)));
}

inline Fq12 embed_fq2(const Fq2 &c) {
  Fq12 r = {fq6_zero(), fq6_zero()};
  r.c0.c0 = c;
  return r;
}

struct UntwistCtx {
  Fq12 w2_inv, w3_inv;
};

inline UntwistCtx make_untwist() {
  Fq12 w = {fq6_zero(), fq6_one()};
  Fq12 w2 = mul(w, w);
  Fq12 w3 = mul(w2, w);
  return {inv(w2), inv(w3)};
}

Fq12 miller_loop(const Fq &px, const Fq &py, const Fq2 &qx, const Fq2 &qy,
                 const UntwistCtx &ctx) {
  Fq12 xp = {fq6_zero(), fq6_zero()};
  xp.c0.c0.c0 = px;
  Fq12 yp = {fq6_zero(), fq6_zero()};
  yp.c0.c0.c0 = py;
  P12 q = {mul(embed_fq2(qx), ctx.w2_inv), mul(embed_fq2(qy), ctx.w3_inv), false};
  P12 t = q;
  Fq12 f = fq12_one();
  // bits of |x| below the MSB
  int msb = 63;
  while (!((ATE_X >> msb) & 1)) msb--;
  for (int b = msb - 1; b >= 0; b--) {
    f = mul(sqr(f), line_eval(t, t, xp, yp));
    t = e12_add(t, t);
    if ((ATE_X >> b) & 1) {
      f = mul(f, line_eval(t, q, xp, yp));
      t = e12_add(t, q);
    }
  }
  return conj(f);  // x < 0
}

Fq12 final_exp(const Fq12 &f) {
  Fq12 a = mul(conj(f), inv(f));           // ^(q^6 - 1)
  a = mul(pow_limbs(a, EXP_Q2, 12), a);    // ^(q^2 + 1)
  return pow_limbs(a, EXP_HARD, 20);       // hard part
}

}  // namespace

extern "C" {

// Pairing-product check: prod e(P_i, Q_i) == 1.
// g1: n * 12 u64 (x‖y standard limbs), g2: n * 24 u64, inf flags per side.
int vs_pairing_check(const u64 *g1, const std::uint8_t *g1_inf, const u64 *g2,
                     const std::uint8_t *g2_inf, std::size_t n) {
  UntwistCtx ctx = make_untwist();
  Fq12 acc = fq12_one();
  for (std::size_t i = 0; i < n; i++) {
    if (g1_inf[i] || g2_inf[i]) continue;
    Fq px = load_fq(g1 + i * 12);
    Fq py = load_fq(g1 + i * 12 + 6);
    Fq2 qx = {load_fq(g2 + i * 24), load_fq(g2 + i * 24 + 6)};
    Fq2 qy = {load_fq(g2 + i * 24 + 12), load_fq(g2 + i * 24 + 18)};
    acc = mul(acc, miller_loop(px, py, qx, qy, ctx));
  }
  return is_one(final_exp(acc)) ? 1 : 0;
}
}

// ===========================================================================
// Batch point decompression + pointwise G2 scalar multiplication.
//
// Decompression mirrors protocol/marshal.py's compressed encoding
// (48B BE x-coordinate, byte-0 flags 0x80 compressed / 0x40 infinity /
// 0x20 sign where sign == "y is the lexicographically high root"), moving
// the per-point modular square root off the python hot path (~1000x).
// ===========================================================================

namespace {

constexpr Fq QP1D4 = {{0xee7fbfffffffeaabULL, 0x7aaffffac54ffffULL, 0xd9cc34a83dac3d89ULL,
                       0xd91dd2e13ce144afULL, 0x92c6e9ed90d2eb35ULL, 0x680447a8e5ff9a6ULL}};
constexpr Fq QM3D4 = {{0xee7fbfffffffeaaaULL, 0x7aaffffac54ffffULL, 0xd9cc34a83dac3d89ULL,
                       0xd91dd2e13ce144afULL, 0x92c6e9ed90d2eb35ULL, 0x680447a8e5ff9a6ULL}};
constexpr Fq QM1D2 = {{0xdcff7fffffffd555ULL, 0xf55ffff58a9ffffULL, 0xb39869507b587b12ULL,
                       0xb23ba5c279c2895fULL, 0x258dd3db21a5d66bULL, 0xd0088f51cbff34dULL}};

inline Fq fq_pow(const Fq &a_mont, const Fq &e) {
  Fq result = R_MONT;
  for (int i = NL - 1; i >= 0; i--)
    for (int b = 63; b >= 0; b--) {
      result = sqr(result);
      if ((e.v[i] >> b) & 1) result = mul(result, a_mont);
    }
  return result;
}

inline Fq2 fq2_pow(const Fq2 &a, const Fq &e) {
  Fq2 result = {R_MONT, {{0, 0, 0, 0, 0, 0}}};
  for (int i = NL - 1; i >= 0; i--)
    for (int b = 63; b >= 0; b--) {
      result = sqr(result);
      if ((e.v[i] >> b) & 1) result = mul(result, a);
    }
  return result;
}

inline bool fq_eq(const Fq &a, const Fq &b) {
  for (int i = 0; i < NL; i++)
    if (a.v[i] != b.v[i]) return false;
  return true;
}

// sqrt in Montgomery form; q = 3 mod 4.  Returns false on non-residue.
inline bool fq_sqrt(const Fq &a_mont, Fq &out) {
  out = fq_pow(a_mont, QP1D4);
  return fq_eq(sqr(out), a_mont);
}

// Adj–Rodriguez sqrt in Fq2 (mirrors refimpl/field.py fq2_sqrt).
inline bool fq2_sqrt(const Fq2 &a, Fq2 &out) {
  if (is_zero(a)) {
    out = a;
    return true;
  }
  Fq2 a1 = fq2_pow(a, QM3D4);
  Fq2 alpha = mul(sqr(a1), a);
  Fq2 x0 = mul(a1, a);
  Fq2 neg_one = {neg(R_MONT), {{0, 0, 0, 0, 0, 0}}};
  Fq2 res;
  if (fq_eq(alpha.c0, neg_one.c0) && is_zero(alpha.c1)) {
    res = {neg(x0.c1), x0.c0};  // u * x0
  } else {
    Fq2 one = {R_MONT, {{0, 0, 0, 0, 0, 0}}};
    Fq2 b = fq2_pow(add(one, alpha), QM1D2);
    res = mul(b, x0);
  }
  Fq2 chk = sqr(res);
  if (!(fq_eq(chk.c0, a.c0) && fq_eq(chk.c1, a.c1))) return false;
  out = res;
  return true;
}

// standard-form comparison against (Q-1)/2 ("lexicographically high").
inline bool fq_is_high_std(const Fq &a_std) {
  for (int i = NL - 1; i >= 0; i--) {
    if (a_std.v[i] > QM1D2.v[i]) return true;
    if (a_std.v[i] < QM1D2.v[i]) return false;
  }
  return false;  // equal -> not high
}

inline bool fq2_is_high_std(const Fq &y0_std, const Fq &y1_std) {
  if (!is_zero(y1_std)) return fq_is_high_std(y1_std);
  return fq_is_high_std(y0_std);
}

// 48 big-endian bytes (flags already masked off) -> standard-form Fq limbs.
inline Fq fq_from_be48(const std::uint8_t *b) {
  Fq r;
  for (int i = 0; i < NL; i++) {
    u64 v = 0;
    for (int k = 0; k < 8; k++) v = (v << 8) | b[(NL - 1 - i) * 8 + k];
    r.v[i] = v;
  }
  return r;
}

}  // namespace

extern "C" {

// blobs: n * 48 bytes compressed G1.  out_coords: n * 2 * 6 u64 standard
// affine; out_inf: n flags.  Returns 0 on success, 1+index on bad point.
long long vs_g1_decompress_many(const std::uint8_t *blobs, std::size_t n, u64 *out_coords,
                                std::uint8_t *out_inf) {
  const Fq four_m = to_mont({{4, 0, 0, 0, 0, 0}});
  for (std::size_t k = 0; k < n; k++) {
    const std::uint8_t *b = blobs + k * 48;
    if (!(b[0] & 0x80)) return (long long)k + 1;
    if (b[0] & 0x40) {
      out_inf[k] = 1;
      std::memset(out_coords + k * 2 * NL, 0, 2 * NL * sizeof(u64));
      continue;
    }
    out_inf[k] = 0;
    std::uint8_t tmp[48];
    std::memcpy(tmp, b, 48);
    tmp[0] &= 0x1f;
    Fq x_std = fq_from_be48(tmp);
    Fq x = to_mont(x_std);
    Fq rhs = add(mul(sqr(x), x), four_m);
    Fq y;
    if (!fq_sqrt(rhs, y)) return (long long)k + 1;
    Fq y_std = from_mont(y);
    bool high = fq_is_high_std(y_std);
    if (high != !!(b[0] & 0x20)) y_std = from_mont(neg(y));
    std::memcpy(out_coords + k * 2 * NL, x_std.v, NL * sizeof(u64));
    std::memcpy(out_coords + k * 2 * NL + NL, y_std.v, NL * sizeof(u64));
  }
  return 0;
}

// blobs: n * 96 bytes compressed G2 (x1 BE48 with flags, then x0 BE48).
// out_coords: n * 4 * 6 u64 standard affine (x0, x1, y0, y1).
long long vs_g2_decompress_many(const std::uint8_t *blobs, std::size_t n, u64 *out_coords,
                                std::uint8_t *out_inf) {
  const Fq four_m = to_mont({{4, 0, 0, 0, 0, 0}});
  const Fq2 b_coeff = {four_m, four_m};  // 4*(u+1)
  for (std::size_t k = 0; k < n; k++) {
    const std::uint8_t *b = blobs + k * 96;
    if (!(b[0] & 0x80)) return (long long)k + 1;
    if (b[0] & 0x40) {
      out_inf[k] = 1;
      std::memset(out_coords + k * 4 * NL, 0, 4 * NL * sizeof(u64));
      continue;
    }
    out_inf[k] = 0;
    std::uint8_t tmp[48];
    std::memcpy(tmp, b, 48);
    tmp[0] &= 0x1f;
    Fq x1_std = fq_from_be48(tmp);
    Fq x0_std = fq_from_be48(b + 48);
    Fq2 x = {to_mont(x0_std), to_mont(x1_std)};
    Fq2 rhs = add(mul(sqr(x), x), b_coeff);
    Fq2 y;
    if (!fq2_sqrt(rhs, y)) return (long long)k + 1;
    Fq y0_std = from_mont(y.c0), y1_std = from_mont(y.c1);
    bool high = fq2_is_high_std(y0_std, y1_std);
    if (high != !!(b[0] & 0x20)) {
      Fq2 yn = neg(y);
      y0_std = from_mont(yn.c0);
      y1_std = from_mont(yn.c1);
    }
    u64 *oc = out_coords + k * 4 * NL;
    std::memcpy(oc, x0_std.v, NL * sizeof(u64));
    std::memcpy(oc + NL, x1_std.v, NL * sizeof(u64));
    std::memcpy(oc + 2 * NL, y0_std.v, NL * sizeof(u64));
    std::memcpy(oc + 3 * NL, y1_std.v, NL * sizeof(u64));
  }
  return 0;
}

// ---------------------------------------------------------------------------
// MSM bucket scheduler — the host side of ops/msm_sched.py.
//
// Replaces the numpy argsort pipeline (schedules are scalar-value-dependent,
// so every prove pays this cost; see VERDICT round-1 item 3).  Two passes
// over the (parts x points x windows) digit tensor, no sort:
//   pass 1: signed w-bit digits + per-(thread, lane) histogram;
//   pass 2: occurrence index per lane = thread-exclusive-prefix + local
//           running counter -> (step, entry lane) -> codes matrix.
// Orphan-lane allocation (hot buckets spilling past the step budget) is
// vectorised numpy between the passes (ops/msm_sched.py).
// ---------------------------------------------------------------------------

}  // extern "C" (pause for C++ templates below)

#include <thread>

namespace sched {

inline int num_windows(int w) {
  int nbits = 256 + w;  // carry headroom, mirrors msm_sched.signed_digits
  return nbits / w + (nbits % w ? 1 : 0);
}

// signed digits of one 32-byte LE scalar: digits[j] in [-2^(w-1), 2^(w-1)]
inline void signed_digits_one(const std::uint8_t *s, int w, int K, std::int16_t *out) {
  std::uint8_t buf[40];
  std::memcpy(buf, s, 32);
  std::memset(buf + 32, 0, 8);
  const int half = 1 << (w - 1), full = 1 << w;
  const std::uint32_t mask = full - 1;
  int carry = 0;
  for (int j = 0; j < K; j++) {
    int o = j * w;
    std::uint32_t word;
    std::memcpy(&word, buf + (o >> 3), 4);  // little-endian host
    int raw = int((word >> (o & 7)) & mask) + carry;
    if (raw > half) {
      out[j] = std::int16_t(raw - full);
      carry = 1;
    } else {
      out[j] = std::int16_t(raw);
      carry = 0;
    }
  }
}

inline void thread_range(std::size_t total, int t, int T, std::size_t &lo, std::size_t &hi) {
  std::size_t per = total / T, rem = total % T;
  lo = t * per + std::min<std::size_t>(t, rem);
  hi = lo + per + (std::size_t(t) < rem ? 1 : 0);
}

}  // namespace sched

extern "C" {

// scalars: (parts*n, 32) LE bytes, scalar (b, i) at index b*n+i.
// digits out: (parts*n, K) int16.  counts out: (nthreads, K*parts... ) — one
// uint32 histogram of size parts*K_per_part*2^(w-1) per thread, caller-zeroed.
// inf: n bytes or NULL.  Returns total nonzero (non-inf) entries.
long long vs_sched_pass1(const std::uint8_t *scalars, std::size_t parts, std::size_t n,
                         int w, const std::uint8_t *inf, std::int16_t *digits,
                         std::uint32_t *counts, int nthreads) {
  const int K = sched::num_windows(w);
  const std::size_t bw = std::size_t(1) << (w - 1);
  const std::size_t canon = parts * std::size_t(K) * bw;
  const std::size_t total_scalars = parts * n;
  std::vector<long long> totals(nthreads, 0);
  auto work = [&](int t) {
    std::size_t lo, hi;
    sched::thread_range(total_scalars, t, nthreads, lo, hi);
    std::uint32_t *cnt = counts + std::size_t(t) * canon;
    long long tot = 0;
    for (std::size_t s = lo; s < hi; s++) {
      std::int16_t *dg = digits + s * K;
      sched::signed_digits_one(scalars + s * 32, w, K, dg);
      std::size_t i = s % n;        // point index
      std::size_t b = s / n;        // part
      if (inf && inf[i]) continue;
      for (int j = 0; j < K; j++) {
        int d = dg[j];
        if (!d) continue;
        std::size_t lane = (b * K + j) * bw + (d < 0 ? -d : d) - 1;
        cnt[lane]++;
        tot++;
      }
    }
    totals[t] = tot;
  };
  std::vector<std::thread> ths;
  for (int t = 1; t < nthreads; t++) ths.emplace_back(work, t);
  work(0);
  for (auto &th : ths) th.join();
  long long total = 0;
  for (auto v : totals) total += v;
  return total;
}

// Fill the codes matrix.  orph_base: per-canonical-lane base orphan index
// (entries only read for lanes that spill).  counts: the per-thread
// histograms from pass 1 (same nthreads!).  codes: (nsteps, lanes) int32,
// caller-zeroed.
void vs_sched_pass2(const std::int16_t *digits, std::size_t parts, std::size_t n, int w,
                    const std::uint8_t *inf, const std::uint32_t *counts,
                    const std::int32_t *orph_base, int steps_budget, int lanes,
                    std::int32_t *codes, int nthreads) {
  const int K = sched::num_windows(w);
  const std::size_t bw = std::size_t(1) << (w - 1);
  const std::size_t canon = parts * std::size_t(K) * bw;
  const std::size_t total_scalars = parts * n;
  auto work = [&](int t) {
    std::size_t lo, hi;
    sched::thread_range(total_scalars, t, nthreads, lo, hi);
    // occurrence base for this thread = sum of earlier threads' counts
    std::vector<std::uint32_t> occ(canon, 0);
    for (int tt = 0; tt < t; tt++) {
      const std::uint32_t *cnt = counts + std::size_t(tt) * canon;
      for (std::size_t l = 0; l < canon; l++) occ[l] += cnt[l];
    }
    for (std::size_t s = lo; s < hi; s++) {
      std::size_t i = s % n;
      std::size_t b = s / n;
      if (inf && inf[i]) continue;
      const std::int16_t *dg = digits + s * K;
      for (int j = 0; j < K; j++) {
        int d = dg[j];
        if (!d) continue;
        std::size_t lane = (b * K + j) * bw + (d < 0 ? -d : d) - 1;
        std::uint32_t o = occ[lane]++;
        std::uint32_t chunk = o / steps_budget;
        std::uint32_t step = o % steps_budget;
        std::size_t el = chunk ? canon + std::size_t(orph_base[lane]) + chunk - 1 : lane;
        codes[std::size_t(step) * lanes + el] =
            std::int32_t((i + 1) | (std::uint32_t(d < 0) << 30));
      }
    }
  };
  std::vector<std::thread> ths;
  for (int t = 1; t < nthreads; t++) ths.emplace_back(work, t);
  work(0);
  for (auto &th : ths) th.join();
}

// Pointwise G2 scalar multiplication (mirror of vs_g1_mul_many).
void vs_g2_mul_many(const u64 *coords, const std::uint8_t *inf, const std::uint8_t *scalars,
                    std::size_t n, u64 *out_coords, std::uint8_t *out_inf) {
  std::vector<Jac<Fq2>> pts;
  load_affine<Fq2>(coords, inf, n, 2, pts);
  for (std::size_t k = 0; k < n; k++) {
    Jac<Fq2> acc;
    acc.inf = true;
    for (int bit = 255; bit >= 0; bit--) {
      acc = dbl(acc);
      if ((scalars[k * 32 + bit / 8] >> (bit % 8)) & 1) acc = padd(acc, pts[k]);
    }
    store_affine_g2(acc, out_coords + k * 4 * NL, out_inf + k);
  }
}

}  // extern "C"
