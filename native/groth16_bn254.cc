// Native Groth16 verifier over BN254 — the framework's counterpart of the
// reference's no_std RISC-V on-chain contract
// (/root/reference/ckb-contracts/contracts/universal_groth16_verifier/
// src/entry.rs:12-42): three byte cells in (vk, proof, publics, ark-0.2
// compressed encodings), accept/reject + error code out. No dependencies
// beyond libc; built as a shared library and driven from Python via ctypes
// (ckb_zkp_tpu/native/__init__.py).
//
// Field/pairing design mirrors ckb_zkp_tpu/host/pairing.py: Fq2 = Fq[u]/(u^2+1),
// Fq6 = Fq2[v]/(v^3 - xi), xi = 9+u, Fq12 = Fq6[w]/(w^2 - v); optimal ate with
// affine Fq2 line functions mapped sparsely into Fq12; BN x-chain hard part of
// the final exponentiation.

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

typedef unsigned __int128 u128;

// ---------- u256 ----------
struct U256 {
  uint64_t v[4];
};

static const U256 Q = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                        0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const U256 R_ORDER = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                              0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const uint64_t BN_X = 4965661367192848881ULL;  // BN parameter
// ate loop count 6x+2 = 29793968203157093288 (65 bits — needs u128)
static const u128 ATE_LOOP = (u128)6 * BN_X + 2;

static inline int u256_cmp(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; i--) {
    if (a.v[i] < b.v[i]) return -1;
    if (a.v[i] > b.v[i]) return 1;
  }
  return 0;
}

static inline bool u256_is_zero(const U256 &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline uint64_t u256_add(U256 &out, const U256 &a, const U256 &b) {
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + c;
    out.v[i] = (uint64_t)s;
    c = s >> 64;
  }
  return (uint64_t)c;
}

static inline uint64_t u256_sub(U256 &out, const U256 &a, const U256 &b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    out.v[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  return (uint64_t)borrow;
}

// divide by a small uint, in place; returns remainder
static inline uint64_t u256_divmod_small(U256 &a, uint64_t d) {
  u128 rem = 0;
  for (int i = 3; i >= 0; i--) {
    u128 cur = (rem << 64) | a.v[i];
    a.v[i] = (uint64_t)(cur / d);
    rem = cur % d;
  }
  return (uint64_t)rem;
}

// ---------- Fq (Montgomery) ----------
static uint64_t INV;     // -q^{-1} mod 2^64
static U256 R2;          // (2^256)^2 mod q
static U256 R1;          // 2^256 mod q (= one in Montgomery form)

struct Fq {
  U256 n;  // Montgomery form
};

static Fq FQ_ZERO, FQ_ONE;

static inline Fq fq_mont_mul(const Fq &a, const Fq &b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a.n.v[j] * b.n.v[i] + t[j] + carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (uint64_t)cur;
    t[5] = (uint64_t)(cur >> 64);

    uint64_t m = t[0] * INV;
    u128 c0 = (u128)m * Q.v[0] + t[0];
    carry = c0 >> 64;
    for (int j = 1; j < 4; j++) {
      u128 cur2 = (u128)m * Q.v[j] + t[j] + carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (uint64_t)cur3;
    t[4] = t[5] + (uint64_t)(cur3 >> 64);
  }
  Fq out;
  for (int i = 0; i < 4; i++) out.n.v[i] = t[i];
  if (t[4] || u256_cmp(out.n, Q) >= 0) u256_sub(out.n, out.n, Q);
  return out;
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
  Fq out;
  uint64_t c = u256_add(out.n, a.n, b.n);
  if (c || u256_cmp(out.n, Q) >= 0) u256_sub(out.n, out.n, Q);
  return out;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
  Fq out;
  if (u256_sub(out.n, a.n, b.n)) u256_add(out.n, out.n, Q);
  return out;
}

static inline Fq fq_neg(const Fq &a) { return fq_sub(FQ_ZERO, a); }

static inline bool fq_eq(const Fq &a, const Fq &b) {
  return u256_cmp(a.n, b.n) == 0;
}

static inline bool fq_is_zero(const Fq &a) { return u256_is_zero(a.n); }

static inline Fq fq_from_u256(const U256 &raw) {
  Fq a;
  a.n = raw;
  Fq r2;
  r2.n = R2;
  return fq_mont_mul(a, r2);
}

static inline U256 fq_to_u256(const Fq &a) {
  // multiply by 1 (non-Montgomery) to divide by R
  Fq one_raw;
  one_raw.n.v[0] = 1;
  one_raw.n.v[1] = one_raw.n.v[2] = one_raw.n.v[3] = 0;
  return fq_mont_mul(a, one_raw).n;
}

static Fq fq_pow(const Fq &a, const U256 &e) {
  Fq result = FQ_ONE;
  Fq base = a;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = e.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) result = fq_mont_mul(result, base);
      base = fq_mont_mul(base, base);
      bits >>= 1;
    }
  }
  return result;
}

static Fq fq_inv(const Fq &a) {
  U256 e;
  u256_sub(e, Q, (U256){{2, 0, 0, 0}});
  return fq_pow(a, e);
}

// y "positive" per ark 0.2: y > q - y
static bool fq_is_positive(const Fq &y) {
  U256 raw = fq_to_u256(y);
  U256 neg;
  if (u256_is_zero(raw)) return false;
  u256_sub(neg, Q, raw);
  return u256_cmp(raw, neg) > 0;
}

// ---------- Fq2 = Fq[u]/(u^2+1) ----------
struct Fq2 {
  Fq c0, c1;
};

static Fq2 FQ2_ZERO, FQ2_ONE;

static inline Fq2 fq2_add(const Fq2 &a, const Fq2 &b) {
  return {fq_add(a.c0, b.c0), fq_add(a.c1, b.c1)};
}
static inline Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) {
  return {fq_sub(a.c0, b.c0), fq_sub(a.c1, b.c1)};
}
static inline Fq2 fq2_neg(const Fq2 &a) { return {fq_neg(a.c0), fq_neg(a.c1)}; }
static inline Fq2 fq2_conj(const Fq2 &a) { return {a.c0, fq_neg(a.c1)}; }

static inline Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
  Fq v0 = fq_mont_mul(a.c0, b.c0);
  Fq v1 = fq_mont_mul(a.c1, b.c1);
  Fq2 out;
  out.c0 = fq_sub(v0, v1);  // u^2 = -1
  Fq s = fq_mont_mul(fq_add(a.c0, a.c1), fq_add(b.c0, b.c1));
  out.c1 = fq_sub(s, fq_add(v0, v1));
  return out;
}

static inline Fq2 fq2_sqr(const Fq2 &a) { return fq2_mul(a, a); }

static inline Fq2 fq2_scale(const Fq2 &a, const Fq &k) {
  return {fq_mont_mul(a.c0, k), fq_mont_mul(a.c1, k)};
}

static inline bool fq2_is_zero(const Fq2 &a) {
  return fq_is_zero(a.c0) && fq_is_zero(a.c1);
}
static inline bool fq2_eq(const Fq2 &a, const Fq2 &b) {
  return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1);
}

static Fq2 fq2_inv(const Fq2 &a) {
  Fq norm = fq_add(fq_mont_mul(a.c0, a.c0), fq_mont_mul(a.c1, a.c1));
  Fq ninv = fq_inv(norm);
  return {fq_mont_mul(a.c0, ninv), fq_neg(fq_mont_mul(a.c1, ninv))};
}

static Fq2 fq2_pow(const Fq2 &a, const U256 &e) {
  Fq2 result = FQ2_ONE;
  Fq2 base = a;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = e.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) result = fq2_mul(result, base);
      base = fq2_sqr(base);
      bits >>= 1;
    }
  }
  return result;
}

// ark 0.2 QuadExtField ordering: compare c1 first, then c0
static bool fq2_is_positive(const Fq2 &y) {
  Fq2 ny = fq2_neg(y);
  U256 y1 = fq_to_u256(y.c1), ny1 = fq_to_u256(ny.c1);
  int c = u256_cmp(y1, ny1);
  if (c != 0) return c > 0;
  U256 y0 = fq_to_u256(y.c0), ny0 = fq_to_u256(ny.c0);
  return u256_cmp(y0, ny0) > 0;
}

static Fq2 XI;  // 9 + u

static inline Fq2 fq2_mul_xi(const Fq2 &a) { return fq2_mul(a, XI); }

// sqrt in Fq2 for q = 3 mod 4 (complex method); returns false if non-residue
static bool fq2_sqrt(const Fq2 &a, Fq2 *out) {
  if (fq2_is_zero(a)) {
    *out = FQ2_ZERO;
    return true;
  }
  U256 e = Q;
  u256_sub(e, e, (U256){{3, 0, 0, 0}});
  u256_divmod_small(e, 4);  // (q-3)/4
  Fq2 a1 = fq2_pow(a, e);
  Fq2 x0 = fq2_mul(a1, a);
  Fq2 alpha = fq2_mul(a1, x0);
  Fq2 neg_one = fq2_neg(FQ2_ONE);
  Fq2 x;
  if (fq2_eq(alpha, neg_one)) {
    // x = u * x0
    x.c0 = fq_neg(x0.c1);
    x.c1 = x0.c0;
  } else {
    U256 h = Q;
    u256_sub(h, h, (U256){{1, 0, 0, 0}});
    u256_divmod_small(h, 2);  // (q-1)/2
    Fq2 b = fq2_pow(fq2_add(FQ2_ONE, alpha), h);
    x = fq2_mul(b, x0);
  }
  if (!fq2_eq(fq2_sqr(x), a)) return false;
  *out = x;
  return true;
}

// ---------- Fq6 = Fq2[v]/(v^3 - xi) ----------
struct Fq6 {
  Fq2 c0, c1, c2;
};

static Fq6 FQ6_ZERO, FQ6_ONE;

static inline Fq6 fq6_add(const Fq6 &a, const Fq6 &b) {
  return {fq2_add(a.c0, b.c0), fq2_add(a.c1, b.c1), fq2_add(a.c2, b.c2)};
}
static inline Fq6 fq6_sub(const Fq6 &a, const Fq6 &b) {
  return {fq2_sub(a.c0, b.c0), fq2_sub(a.c1, b.c1), fq2_sub(a.c2, b.c2)};
}
static inline Fq6 fq6_neg(const Fq6 &a) {
  return {fq2_neg(a.c0), fq2_neg(a.c1), fq2_neg(a.c2)};
}

static Fq6 fq6_mul(const Fq6 &a, const Fq6 &b) {
  Fq2 v0 = fq2_mul(a.c0, b.c0);
  Fq2 v1 = fq2_mul(a.c1, b.c1);
  Fq2 v2 = fq2_mul(a.c2, b.c2);
  Fq6 out;
  // c0 = v0 + xi*((a1+a2)(b1+b2) - v1 - v2)
  Fq2 t = fq2_mul(fq2_add(a.c1, a.c2), fq2_add(b.c1, b.c2));
  t = fq2_sub(fq2_sub(t, v1), v2);
  out.c0 = fq2_add(v0, fq2_mul_xi(t));
  // c1 = (a0+a1)(b0+b1) - v0 - v1 + xi*v2
  t = fq2_mul(fq2_add(a.c0, a.c1), fq2_add(b.c0, b.c1));
  out.c1 = fq2_add(fq2_sub(fq2_sub(t, v0), v1), fq2_mul_xi(v2));
  // c2 = (a0+a2)(b0+b2) - v0 - v2 + v1
  t = fq2_mul(fq2_add(a.c0, a.c2), fq2_add(b.c0, b.c2));
  out.c2 = fq2_add(fq2_sub(fq2_sub(t, v0), v2), v1);
  return out;
}

static inline Fq6 fq6_sqr(const Fq6 &a) { return fq6_mul(a, a); }

static Fq6 fq6_mul_by_v(const Fq6 &a) {
  // (c0 + c1 v + c2 v^2) * v = xi*c2 + c0 v + c1 v^2
  return {fq2_mul_xi(a.c2), a.c0, a.c1};
}

static Fq6 fq6_inv(const Fq6 &a) {
  Fq2 c0 = fq2_sub(fq2_sqr(a.c0), fq2_mul_xi(fq2_mul(a.c1, a.c2)));
  Fq2 c1 = fq2_sub(fq2_mul_xi(fq2_sqr(a.c2)), fq2_mul(a.c0, a.c1));
  Fq2 c2 = fq2_sub(fq2_sqr(a.c1), fq2_mul(a.c0, a.c2));
  Fq2 t = fq2_add(
      fq2_mul_xi(fq2_add(fq2_mul(a.c2, c1), fq2_mul(a.c1, c2))),
      fq2_mul(a.c0, c0));
  Fq2 tinv = fq2_inv(t);
  return {fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv)};
}

// ---------- Fq12 = Fq6[w]/(w^2 - v) ----------
struct Fq12 {
  Fq6 c0, c1;
};

static Fq12 FQ12_ONE;

static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
  Fq6 v0 = fq6_mul(a.c0, b.c0);
  Fq6 v1 = fq6_mul(a.c1, b.c1);
  Fq12 out;
  out.c0 = fq6_add(v0, fq6_mul_by_v(v1));
  Fq6 t = fq6_mul(fq6_add(a.c0, a.c1), fq6_add(b.c0, b.c1));
  out.c1 = fq6_sub(fq6_sub(t, v0), v1);
  return out;
}

static inline Fq12 fq12_sqr(const Fq12 &a) { return fq12_mul(a, a); }

static Fq12 fq12_conj(const Fq12 &a) { return {a.c0, fq6_neg(a.c1)}; }

static Fq12 fq12_inv(const Fq12 &a) {
  Fq6 t = fq6_sub(fq6_sqr(a.c0), fq6_mul_by_v(fq6_sqr(a.c1)));
  Fq6 tinv = fq6_inv(t);
  return {fq6_mul(a.c0, tinv), fq6_neg(fq6_mul(a.c1, tinv))};
}

static bool fq12_eq(const Fq12 &a, const Fq12 &b) {
  return fq2_eq(a.c0.c0, b.c0.c0) && fq2_eq(a.c0.c1, b.c0.c1) &&
         fq2_eq(a.c0.c2, b.c0.c2) && fq2_eq(a.c1.c0, b.c1.c0) &&
         fq2_eq(a.c1.c1, b.c1.c1) && fq2_eq(a.c1.c2, b.c1.c2);
}

static Fq12 fq12_pow_u64(const Fq12 &a, uint64_t e) {
  Fq12 result = FQ12_ONE;
  Fq12 base = a;
  while (e) {
    if (e & 1) result = fq12_mul(result, base);
    base = fq12_sqr(base);
    e >>= 1;
  }
  return result;
}

// Frobenius coefficients: GAMMA = xi^((q-1)/6); powers 1..5
static Fq2 FROB_GAMMA[6];  // [i] = xi^(i(q-1)/6), i = 0..5

static Fq12 fq12_frobenius(const Fq12 &a) {
  // (c0 + c1 w)^q: coefficients conj, basis w^i picks up GAMMA[i]
  Fq12 out;
  out.c0.c0 = fq2_conj(a.c0.c0);                              // w^0
  out.c1.c0 = fq2_mul(fq2_conj(a.c1.c0), FROB_GAMMA[1]);      // w^1
  out.c0.c1 = fq2_mul(fq2_conj(a.c0.c1), FROB_GAMMA[2]);      // w^2 (v)
  out.c1.c1 = fq2_mul(fq2_conj(a.c1.c1), FROB_GAMMA[3]);      // w^3 (v w)
  out.c0.c2 = fq2_mul(fq2_conj(a.c0.c2), FROB_GAMMA[4]);      // w^4 (v^2)
  out.c1.c2 = fq2_mul(fq2_conj(a.c1.c2), FROB_GAMMA[5]);      // w^5 (v^2 w)
  return out;
}

// ---------- G1 ----------
struct G1 {
  Fq x, y;
  bool inf;
};

static Fq FQ_B;  // 3

static bool g1_on_curve(const G1 &p) {
  if (p.inf) return true;
  Fq lhs = fq_mont_mul(p.y, p.y);
  Fq rhs = fq_add(fq_mont_mul(fq_mont_mul(p.x, p.x), p.x), FQ_B);
  return fq_eq(lhs, rhs);
}

static G1 g1_add(const G1 &p, const G1 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  if (fq_eq(p.x, q.x)) {
    if (!fq_eq(p.y, q.y)) return {FQ_ZERO, FQ_ZERO, true};
    if (fq_is_zero(p.y)) return {FQ_ZERO, FQ_ZERO, true};
    // doubling
    Fq three;
    three = fq_add(fq_add(FQ_ONE, FQ_ONE), FQ_ONE);
    Fq num = fq_mont_mul(three, fq_mont_mul(p.x, p.x));
    Fq lam = fq_mont_mul(num, fq_inv(fq_add(p.y, p.y)));
    Fq x3 = fq_sub(fq_mont_mul(lam, lam), fq_add(p.x, p.x));
    Fq y3 = fq_sub(fq_mont_mul(lam, fq_sub(p.x, x3)), p.y);
    return {x3, y3, false};
  }
  Fq lam = fq_mont_mul(fq_sub(q.y, p.y), fq_inv(fq_sub(q.x, p.x)));
  Fq x3 = fq_sub(fq_sub(fq_mont_mul(lam, lam), p.x), q.x);
  Fq y3 = fq_sub(fq_mont_mul(lam, fq_sub(p.x, x3)), p.y);
  return {x3, y3, false};
}

static G1 g1_neg(const G1 &p) {
  if (p.inf) return p;
  return {p.x, fq_neg(p.y), false};
}

static G1 g1_mul(const G1 &p, const U256 &k) {
  G1 acc = {FQ_ZERO, FQ_ZERO, true};
  G1 base = p;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = k.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) acc = g1_add(acc, base);
      base = g1_add(base, base);
      bits >>= 1;
    }
  }
  return acc;
}

// ---------- G2 (twist coords over Fq2) ----------
struct G2 {
  Fq2 x, y;
  bool inf;
};

static Fq2 FQ2_B;  // 3/(9+u)

static bool g2_on_curve(const G2 &p) {
  if (p.inf) return true;
  Fq2 lhs = fq2_sqr(p.y);
  Fq2 rhs = fq2_add(fq2_mul(fq2_sqr(p.x), p.x), FQ2_B);
  return fq2_eq(lhs, rhs);
}

static G2 g2_add(const G2 &p, const G2 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  if (fq2_eq(p.x, q.x)) {
    if (!fq2_eq(p.y, q.y)) return {FQ2_ZERO, FQ2_ZERO, true};
    if (fq2_is_zero(p.y)) return {FQ2_ZERO, FQ2_ZERO, true};
    Fq2 three = fq2_add(fq2_add(FQ2_ONE, FQ2_ONE), FQ2_ONE);
    Fq2 lam = fq2_mul(fq2_mul(three, fq2_sqr(p.x)),
                      fq2_inv(fq2_add(p.y, p.y)));
    Fq2 x3 = fq2_sub(fq2_sqr(lam), fq2_add(p.x, p.x));
    Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(p.x, x3)), p.y);
    return {x3, y3, false};
  }
  Fq2 lam = fq2_mul(fq2_sub(q.y, p.y), fq2_inv(fq2_sub(q.x, p.x)));
  Fq2 x3 = fq2_sub(fq2_sub(fq2_sqr(lam), p.x), q.x);
  Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(p.x, x3)), p.y);
  return {x3, y3, false};
}

static G2 g2_mul(const G2 &p, const U256 &k) {
  G2 acc = {FQ2_ZERO, FQ2_ZERO, true};
  G2 base = p;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = k.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) acc = g2_add(acc, base);
      base = g2_add(base, base);
      bits >>= 1;
    }
  }
  return acc;
}

// ---------- pairing ----------
// sparse line value in Fq12 from twist-coordinate slope/points, evaluated at
// P = (xP, yP): l = yP + (-lam*xP) w + (lam*x_T - y_T) w^3
static Fq12 line_value(const Fq2 &lam, const G2 &T, const Fq &xp, const Fq &yp) {
  Fq12 out = {};  // zero
  out.c0.c0 = {yp, FQ_ZERO};
  out.c1.c0 = fq2_neg(fq2_scale(lam, xp));      // w^1 -> c1.c0
  out.c1.c1 = fq2_sub(fq2_mul(lam, T.x), T.y);  // w^3 -> c1.c1
  return out;
}

// doubling/adding line step in affine twist coords
static Fq12 line_double(G2 &T, const Fq &xp, const Fq &yp) {
  Fq2 three = fq2_add(fq2_add(FQ2_ONE, FQ2_ONE), FQ2_ONE);
  Fq2 lam = fq2_mul(fq2_mul(three, fq2_sqr(T.x)), fq2_inv(fq2_add(T.y, T.y)));
  Fq12 val = line_value(lam, T, xp, yp);
  Fq2 x3 = fq2_sub(fq2_sqr(lam), fq2_add(T.x, T.x));
  Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(T.x, x3)), T.y);
  T = {x3, y3, false};
  return val;
}

static Fq12 line_add(G2 &T, const G2 &Q2p, const Fq &xp, const Fq &yp) {
  if (fq2_eq(T.x, Q2p.x) && !fq2_eq(T.y, Q2p.y)) {
    // vertical line: xP - x_T  ->  (xP) - x_T at w^2? in untwisted coords the
    // vertical is x_P - X_T = xp - x_T w^2: c0.c0 = xp, c0.c1 = -x_T
    Fq12 out = {};
    out.c0.c0 = {xp, FQ_ZERO};
    out.c0.c1 = fq2_neg(T.x);
    T = {FQ2_ZERO, FQ2_ZERO, true};
    return out;
  }
  Fq2 lam = fq2_mul(fq2_sub(Q2p.y, T.y), fq2_inv(fq2_sub(Q2p.x, T.x)));
  Fq12 val = line_value(lam, T, xp, yp);
  Fq2 x3 = fq2_sub(fq2_sub(fq2_sqr(lam), T.x), Q2p.x);
  Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(T.x, x3)), T.y);
  T = {x3, y3, false};
  return val;
}

static Fq12 miller_loop(const G1 &p, const G2 &q) {
  if (p.inf || q.inf) return FQ12_ONE;
  Fq12 f = FQ12_ONE;
  G2 T = q;
  // MSB-1 .. 0 of ATE_LOOP
  int top = 127;
  while (!((ATE_LOOP >> top) & 1)) top--;
  for (int i = top - 1; i >= 0; i--) {
    f = fq12_sqr(f);
    f = fq12_mul(f, line_double(T, p.x, p.y));
    if ((ATE_LOOP >> i) & 1) f = fq12_mul(f, line_add(T, q, p.x, p.y));
  }
  // BN final steps: Q1 = pi(Q), Q2 = pi^2(Q); add Q1, then -Q2
  G2 Q1 = {fq2_mul(fq2_conj(q.x), FROB_GAMMA[2]),
           fq2_mul(fq2_conj(q.y), FROB_GAMMA[3]), false};
  G2 Q2 = {fq2_mul(fq2_conj(Q1.x), FROB_GAMMA[2]),
           fq2_mul(fq2_conj(Q1.y), FROB_GAMMA[3]), false};
  G2 nQ2 = {Q2.x, fq2_neg(Q2.y), false};
  f = fq12_mul(f, line_add(T, Q1, p.x, p.y));
  f = fq12_mul(f, line_add(T, nQ2, p.x, p.y));
  return f;
}

static Fq12 final_exponentiation(const Fq12 &f_in) {
  // easy part: f^((q^6-1)(q^2+1))
  Fq12 f = fq12_mul(fq12_conj(f_in), fq12_inv(f_in));  // f^(q^6-1)
  f = fq12_mul(fq12_frobenius(fq12_frobenius(f)), f);  // f^(q^2+1)
  // hard part (Devegili et al. x-chain); after easy part f is unitary so
  // conj == inverse.
  Fq12 fp = fq12_frobenius(f);
  Fq12 fp2 = fq12_frobenius(fp);
  Fq12 fp3 = fq12_frobenius(fp2);
  Fq12 fu = fq12_pow_u64(f, BN_X);
  Fq12 fu2 = fq12_pow_u64(fu, BN_X);
  Fq12 fu3 = fq12_pow_u64(fu2, BN_X);
  Fq12 y0 = fq12_mul(fq12_mul(fp, fp2), fp3);
  Fq12 y1 = fq12_conj(f);
  Fq12 y2 = fq12_frobenius(fq12_frobenius(fu2));
  Fq12 y3 = fq12_conj(fq12_frobenius(fu));
  Fq12 y4 = fq12_conj(fq12_mul(fu, fq12_frobenius(fu2)));
  Fq12 y5 = fq12_conj(fu2);
  Fq12 y6 = fq12_conj(fq12_mul(fu3, fq12_frobenius(fu3)));
  Fq12 t0 = fq12_mul(fq12_mul(fq12_sqr(y6), y4), y5);
  Fq12 t1 = fq12_mul(fq12_mul(y3, y5), t0);
  t0 = fq12_mul(t0, y2);
  t1 = fq12_sqr(fq12_mul(fq12_sqr(t1), t0));
  t0 = fq12_mul(t1, y1);
  t1 = fq12_mul(t1, y0);
  t0 = fq12_sqr(t0);
  return fq12_mul(t1, t0);
}

// ---------- parsing (ark 0.2 compressed) ----------
struct Reader {
  const uint8_t *p;
  size_t n;
  bool fail;
  bool take(uint8_t *dst, size_t k) {
    if (fail || n < k) {
      fail = true;
      return false;
    }
    memcpy(dst, p, k);
    p += k;
    n -= k;
    return true;
  }
};

static const uint8_t FLAG_INF = 1 << 6;
static const uint8_t FLAG_POS = 1 << 7;

static bool read_fq(Reader &r, Fq *out, uint8_t *flags) {
  uint8_t buf[32];
  if (!r.take(buf, 32)) return false;
  if (flags) {
    *flags = buf[31] & 0xC0;
    buf[31] &= 0x3F;
  }
  U256 raw;
  for (int i = 0; i < 4; i++) {
    uint64_t limb = 0;
    for (int j = 7; j >= 0; j--) limb = (limb << 8) | buf[i * 8 + j];
    raw.v[i] = limb;
  }
  if (u256_cmp(raw, Q) >= 0) return false;
  *out = fq_from_u256(raw);
  return true;
}

static bool fq_sqrt(const Fq &a, Fq *out) {
  // q = 3 mod 4: sqrt = a^((q+1)/4)
  U256 e = Q;
  u256_add(e, e, (U256){{1, 0, 0, 0}});
  u256_divmod_small(e, 4);
  Fq x = fq_pow(a, e);
  if (!fq_eq(fq_mont_mul(x, x), a)) return false;
  *out = x;
  return true;
}

static bool read_g1(Reader &r, G1 *out) {
  uint8_t flags;
  Fq x;
  if (!read_fq(r, &x, &flags)) return false;
  if (flags & FLAG_INF) {
    *out = {FQ_ZERO, FQ_ZERO, true};
    return fq_is_zero(x);
  }
  Fq rhs = fq_add(fq_mont_mul(fq_mont_mul(x, x), x), FQ_B);
  Fq y;
  if (!fq_sqrt(rhs, &y)) return false;
  bool want_pos = (flags & FLAG_POS) != 0;
  if (fq_is_positive(y) != want_pos) y = fq_neg(y);
  *out = {x, y, false};
  return g1_on_curve(*out);
}

static bool read_g2(Reader &r, G2 *out) {
  Fq x0, x1;
  uint8_t flags;
  if (!read_fq(r, &x0, nullptr)) return false;
  if (!read_fq(r, &x1, &flags)) return false;
  Fq2 x = {x0, x1};
  if (flags & FLAG_INF) {
    *out = {FQ2_ZERO, FQ2_ZERO, true};
    return fq2_is_zero(x);
  }
  Fq2 rhs = fq2_add(fq2_mul(fq2_sqr(x), x), FQ2_B);
  Fq2 y;
  if (!fq2_sqrt(rhs, &y)) return false;
  bool want_pos = (flags & FLAG_POS) != 0;
  if (fq2_is_positive(y) != want_pos) y = fq2_neg(y);
  *out = {x, y, false};
  if (!g2_on_curve(*out)) return false;
  // subgroup check: r*Q == inf
  G2 t = g2_mul(*out, R_ORDER);
  return t.inf;
}

// ---------- init ----------
static bool INITED = false;

static void init_constants() {
  if (INITED) return;
  // INV = -q^{-1} mod 2^64 via Newton iteration
  uint64_t q0 = Q.v[0];
  uint64_t inv = 1;
  for (int i = 0; i < 63; i++) inv *= 2 - q0 * inv;
  INV = ~inv + 1;  // negate mod 2^64
  // R1 = 2^256 mod q, R2 = R1^2 via repeated doubling (exact mod-q doubling)
  U256 r = {{1, 0, 0, 0}};
  for (int i = 0; i < 256; i++) {
    U256 d;
    uint64_t c = u256_add(d, r, r);
    if (c || u256_cmp(d, Q) >= 0) u256_sub(d, d, Q);
    r = d;
  }
  R1 = r;
  // R2 = R1 doubled 256 more times
  for (int i = 0; i < 256; i++) {
    U256 d;
    uint64_t c = u256_add(d, r, r);
    if (c || u256_cmp(d, Q) >= 0) u256_sub(d, d, Q);
    r = d;
  }
  R2 = r;
  FQ_ZERO.n = (U256){{0, 0, 0, 0}};
  FQ_ONE.n = R1;
  FQ2_ZERO = {FQ_ZERO, FQ_ZERO};
  FQ2_ONE = {FQ_ONE, FQ_ZERO};
  FQ6_ZERO = {FQ2_ZERO, FQ2_ZERO, FQ2_ZERO};
  FQ6_ONE = {FQ2_ONE, FQ2_ZERO, FQ2_ZERO};
  FQ12_ONE = {FQ6_ONE, FQ6_ZERO};
  // b coefficients
  Fq nine = fq_from_u256((U256){{9, 0, 0, 0}});
  Fq three = fq_from_u256((U256){{3, 0, 0, 0}});
  FQ_B = three;
  XI = {nine, FQ_ONE};
  FQ2_B = fq2_mul((Fq2){three, FQ_ZERO}, fq2_inv(XI));
  // GAMMA = xi^((q-1)/6)
  U256 e = Q;
  u256_sub(e, e, (U256){{1, 0, 0, 0}});
  u256_divmod_small(e, 6);
  Fq2 gamma = fq2_pow(XI, e);
  FROB_GAMMA[0] = FQ2_ONE;
  for (int i = 1; i < 6; i++) FROB_GAMMA[i] = fq2_mul(FROB_GAMMA[i - 1], gamma);
  INITED = true;
}

}  // namespace

extern "C" {

// mirrors contracts.py codes: 0 = OK, 1 = encoding error, 2 = verify fail
int groth16_verify_bn254(const uint8_t *vk_bytes, size_t vk_len,
                         const uint8_t *proof_bytes, size_t proof_len,
                         const uint8_t *publics_bytes, size_t publics_len) {
  init_constants();
  Reader vkr = {vk_bytes, vk_len, false};
  G1 alpha;
  G2 beta, gamma_g2, delta;
  if (!read_g1(vkr, &alpha)) return 1;
  if (!read_g2(vkr, &beta)) return 1;
  if (!read_g2(vkr, &gamma_g2)) return 1;
  if (!read_g2(vkr, &delta)) return 1;
  uint8_t lenbuf[8];
  if (!vkr.take(lenbuf, 8)) return 1;
  uint64_t n_abc = 0;
  for (int i = 7; i >= 0; i--) n_abc = (n_abc << 8) | lenbuf[i];
  if (n_abc == 0 || n_abc > 65536) return 1;
  if (publics_len % 32 || publics_len / 32 != n_abc - 1) return 1;

  G1 g_ic;
  if (!read_g1(vkr, &g_ic)) return 1;
  for (uint64_t i = 1; i < n_abc; i++) {
    G1 base;
    if (!read_g1(vkr, &base)) return 1;
    // scalar: 32 LE bytes, must be < r
    U256 s;
    const uint8_t *sb = publics_bytes + (i - 1) * 32;
    for (int limb = 0; limb < 4; limb++) {
      uint64_t v = 0;
      for (int j = 7; j >= 0; j--) v = (v << 8) | sb[limb * 8 + j];
      s.v[limb] = v;
    }
    if (u256_cmp(s, R_ORDER) >= 0) return 1;
    g_ic = g1_add(g_ic, g1_mul(base, s));
  }
  if (vkr.fail || vkr.n != 0) return 1;

  Reader pr = {proof_bytes, proof_len, false};
  G1 a, c;
  G2 b;
  if (!read_g1(pr, &a)) return 1;
  if (!read_g2(pr, &b)) return 1;
  if (!read_g1(pr, &c)) return 1;
  if (pr.fail || pr.n != 0) return 1;
  if (a.inf || b.inf || c.inf) return 2;

  // e(A,B) * e(-g_ic, gamma) * e(-C, delta) * e(-alpha, beta) == 1
  Fq12 f = miller_loop(a, b);
  f = fq12_mul(f, miller_loop(g1_neg(g_ic), gamma_g2));
  f = fq12_mul(f, miller_loop(g1_neg(c), delta));
  f = fq12_mul(f, miller_loop(g1_neg(alpha), beta));
  Fq12 out = final_exponentiation(f);
  return fq12_eq(out, FQ12_ONE) ? 0 : 2;
}

// internal consistency check: pairing bilinearity on the generators.
// returns 0 on success, nonzero identifies the failing stage.
int groth16_bn254_selftest(void) {
  init_constants();
  // generators
  G1 P = {fq_from_u256((U256){{1, 0, 0, 0}}), fq_from_u256((U256){{2, 0, 0, 0}}),
          false};
  if (!g1_on_curve(P)) return 1;
  // G2 generator (pairing.py:182-191)
  auto fq_from_dec = [](const char *s) {
    U256 acc = {{0, 0, 0, 0}};
    for (const char *c = s; *c; c++) {
      // acc = acc*10 + digit
      U256 t8, t2;
      uint64_t carry = 0;
      // acc*2
      carry = u256_add(t2, acc, acc);
      (void)carry;
      // acc*4, *8
      u256_add(t8, t2, t2);
      u256_add(t8, t8, t8);
      u256_add(acc, t8, t2);  // *10
      U256 d = {{(uint64_t)(*c - '0'), 0, 0, 0}};
      u256_add(acc, acc, d);
    }
    return fq_from_u256(acc);
  };
  G2 Qg;
  Qg.x = {fq_from_dec("10857046999023057135944570762232829481370756359578518"
                      "086990519993285655852781"),
          fq_from_dec("11559732032986387107991004021392285783925812861821192"
                      "530917403151452391805634")};
  Qg.y = {fq_from_dec("84956539231234314176049732474892724384181905872636001"
                      "48770280649306958101930"),
          fq_from_dec("40823678758634336813322034031454355683168513275934012"
                      "08105741076214120093531")};
  Qg.inf = false;
  if (!g2_on_curve(Qg)) return 2;
  // e(2P, Q) == e(P, Q)^2
  G1 P2 = g1_add(P, P);
  Fq12 e1 = final_exponentiation(miller_loop(P2, Qg));
  Fq12 e2 = final_exponentiation(miller_loop(P, Qg));
  if (!fq12_eq(e1, fq12_mul(e2, e2))) return 3;
  // e(P, 2Q) == e(P, Q)^2
  G2 Q2g = g2_add(Qg, Qg);
  Fq12 e3 = final_exponentiation(miller_loop(P, Q2g));
  if (!fq12_eq(e3, fq12_mul(e2, e2))) return 4;
  // e(P, Q)^r == 1 (non-degeneracy + order)
  Fq12 acc = FQ12_ONE;
  Fq12 base = e2;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = R_ORDER.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) acc = fq12_mul(acc, base);
      base = fq12_sqr(base);
      bits >>= 1;
    }
  }
  if (!fq12_eq(acc, FQ12_ONE)) return 5;
  if (fq12_eq(e2, FQ12_ONE)) return 6;
  return 0;
}

}  // extern "C"
