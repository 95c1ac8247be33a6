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
