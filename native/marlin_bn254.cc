// Native Marlin verifier over BN254 — second native-runtime verifier
// (reference counterpart: /root/reference/ckb-contracts/contracts/
// universal_marlin_verifier/src/entry.rs: three byte cells in — ivk, proof,
// publics, ark-0.2 compressed encodings — accept/reject + error code out).
//
// Reuses the BN254 field/pairing tower and ark readers from
// groth16_bn254.cc (included below; both verifiers ship in this .so).
// Adds: Fr Montgomery arithmetic (mod the group order), Keccak-f1600 +
// STROBE-128 (merlin) + ChaCha20 for the Fiat-Shamir RNG
// (marlin/src/fs_rng.rs:11-70), the AHP verifier rounds/query set/equality
// check (marlin/src/ahp/verifier.rs:40-128+), and the batched KZG10 check
// with degree-bound shifted commitments (marlin/src/pc/mod.rs:163-230).
// Behavior mirrors ckb_zkp_tpu/schemes/marlin bit-for-bit (the Python
// implementation is the executable spec; tests/test_contracts.py drives
// both against the same artifacts).

#include "groth16_bn254.cc"

#include <string>
#include <vector>
#include <algorithm>

namespace marlin_native {

// ---------------- Fr (Montgomery mod R_ORDER) ----------------
static uint64_t FR_INV;
static U256 FR_R1, FR_R2;

struct Fr {
  U256 n;  // Montgomery form
};
static Fr FR_ZERO, FR_ONE;

static inline Fr fr_mul(const Fr &a, const Fr &b) {
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
    uint64_t m = t[0] * FR_INV;
    u128 c0 = (u128)m * R_ORDER.v[0] + t[0];
    carry = c0 >> 64;
    for (int j = 1; j < 4; j++) {
      u128 cur2 = (u128)m * R_ORDER.v[j] + t[j] + carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (uint64_t)cur3;
    t[4] = t[5] + (uint64_t)(cur3 >> 64);
  }
  Fr out;
  for (int i = 0; i < 4; i++) out.n.v[i] = t[i];
  if (t[4] || u256_cmp(out.n, R_ORDER) >= 0) u256_sub(out.n, out.n, R_ORDER);
  return out;
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
  Fr out;
  uint64_t c = u256_add(out.n, a.n, b.n);
  if (c || u256_cmp(out.n, R_ORDER) >= 0) u256_sub(out.n, out.n, R_ORDER);
  return out;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
  Fr out;
  if (u256_sub(out.n, a.n, b.n)) u256_add(out.n, out.n, R_ORDER);
  return out;
}

static inline Fr fr_neg(const Fr &a) { return fr_sub(FR_ZERO, a); }
static inline bool fr_is_zero(const Fr &a) { return u256_is_zero(a.n); }
static inline bool fr_eq(const Fr &a, const Fr &b) {
  return u256_cmp(a.n, b.n) == 0;
}

static inline Fr fr_from_u256(const U256 &raw) {
  Fr a;
  a.n = raw;
  Fr r2;
  r2.n = FR_R2;
  return fr_mul(a, r2);
}

static inline Fr fr_from_u64(uint64_t v) {
  U256 raw = {{v, 0, 0, 0}};
  return fr_from_u256(raw);
}

static inline U256 fr_to_u256(const Fr &a) {
  Fr one_raw;
  one_raw.n.v[0] = 1;
  one_raw.n.v[1] = one_raw.n.v[2] = one_raw.n.v[3] = 0;
  return fr_mul(a, one_raw).n;
}

static Fr fr_pow(const Fr &a, const U256 &e) {
  Fr result = FR_ONE;
  Fr base = a;
  for (int limb = 0; limb < 4; limb++) {
    uint64_t bits = e.v[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) result = fr_mul(result, base);
      base = fr_mul(base, base);
      bits >>= 1;
    }
  }
  return result;
}

static Fr fr_pow_u64(const Fr &a, uint64_t e) {
  U256 ee = {{e, 0, 0, 0}};
  return fr_pow(a, ee);
}

static Fr fr_inv(const Fr &a) {
  U256 e;
  u256_sub(e, R_ORDER, (U256){{2, 0, 0, 0}});
  return fr_pow(a, e);
}

// ---------------- Keccak-f1600 ----------------
static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};
static const int KECCAK_ROT[5][5] = {{0, 36, 3, 41, 18},
                                     {1, 44, 10, 45, 2},
                                     {62, 6, 43, 15, 61},
                                     {28, 55, 25, 21, 56},
                                     {27, 20, 39, 8, 14}};

static inline uint64_t rotl64(uint64_t x, int n) {
  n &= 63;
  if (n == 0) return x;
  return (x << n) | (x >> (64 - n));
}

static void keccak_f1600(uint8_t state[200]) {
  uint64_t lanes[25];
  for (int i = 0; i < 25; i++) {
    uint64_t v = 0;
    for (int j = 7; j >= 0; j--) v = (v << 8) | state[8 * i + j];
    lanes[i] = v;
  }
  for (int r = 0; r < 24; r++) {
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = lanes[x] ^ lanes[x + 5] ^ lanes[x + 10] ^ lanes[x + 15] ^
             lanes[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) lanes[x + 5 * y] ^= d[x];
    uint64_t b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] =
            rotl64(lanes[x + 5 * y], KECCAK_ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        lanes[x + 5 * y] =
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
    lanes[0] ^= KECCAK_RC[r];
  }
  for (int i = 0; i < 25; i++) {
    uint64_t v = lanes[i];
    for (int j = 0; j < 8; j++) {
      state[8 * i + j] = (uint8_t)v;
      v >>= 8;
    }
  }
}

// ---------------- STROBE-128 (merlin subset) ----------------
struct Strobe128 {
  uint8_t state[200];
  uint8_t pos, pos_begin, cur_flags;

  static const int R = 166;
  static const uint8_t FLAG_I = 1, FLAG_A = 2, FLAG_C = 4, FLAG_M = 16,
                       FLAG_K = 32;

  void init(const uint8_t *label, size_t n) {
    memset(state, 0, 200);
    const uint8_t hdr[6] = {1, R + 2, 1, 0, 1, 96};
    memcpy(state, hdr, 6);
    memcpy(state + 6, "STROBEv1.0.2", 12);
    keccak_f1600(state);
    pos = pos_begin = cur_flags = 0;
    meta_ad(label, n, false);
  }
  void run_f() {
    state[pos] ^= pos_begin;
    state[pos + 1] ^= 0x04;
    state[R + 1] ^= 0x80;
    keccak_f1600(state);
    pos = pos_begin = 0;
  }
  void absorb(const uint8_t *data, size_t n) {
    for (size_t i = 0; i < n; i++) {
      state[pos] ^= data[i];
      if (++pos == R) run_f();
    }
  }
  void squeeze(uint8_t *out, size_t n) {
    for (size_t i = 0; i < n; i++) {
      out[i] = state[pos];
      state[pos] = 0;
      if (++pos == R) run_f();
    }
  }
  void begin_op(uint8_t flags, bool more) {
    if (more) return;
    uint8_t old_begin = pos_begin;
    pos_begin = pos + 1;
    cur_flags = flags;
    uint8_t hdr[2] = {old_begin, flags};
    absorb(hdr, 2);
    bool force_f = (flags & (FLAG_C | FLAG_K)) != 0;
    if (force_f && pos != 0) run_f();
  }
  void meta_ad(const uint8_t *d, size_t n, bool more) {
    begin_op(FLAG_M | FLAG_A, more);
    absorb(d, n);
  }
  void ad(const uint8_t *d, size_t n, bool more) {
    begin_op(FLAG_A, more);
    absorb(d, n);
  }
  void prf(uint8_t *out, size_t n) {
    begin_op(FLAG_I | FLAG_A | FLAG_C, false);
    squeeze(out, n);
  }
};

struct Transcript {
  Strobe128 s;
  void init(const uint8_t *label, size_t n) {
    s.init((const uint8_t *)"Merlin v1.0", 11);
    append((const uint8_t *)"dom-sep", 7, label, n);
  }
  void append(const uint8_t *label, size_t ln, const uint8_t *msg, size_t mn) {
    s.meta_ad(label, ln, false);
    uint8_t len4[4] = {(uint8_t)mn, (uint8_t)(mn >> 8), (uint8_t)(mn >> 16),
                       (uint8_t)(mn >> 24)};
    s.meta_ad(len4, 4, true);
    s.ad(msg, mn, false);
  }
  void challenge(const uint8_t *label, size_t ln, uint8_t *out, size_t n) {
    s.meta_ad(label, ln, false);
    uint8_t len4[4] = {(uint8_t)n, (uint8_t)(n >> 8), (uint8_t)(n >> 16),
                       (uint8_t)(n >> 24)};
    s.meta_ad(len4, 4, true);
    s.prf(out, n);
  }
};

// ---------------- ChaCha20 (rand_chacha-compatible stream) ----------------
static inline uint32_t rotl32(uint32_t x, int n) {
  return (x << n) | (x >> (32 - n));
}

static void chacha20_block(const uint8_t key[32], uint32_t counter,
                           const uint32_t nonce[3], uint8_t out[64]) {
  uint32_t st[16];
  st[0] = 0x61707865;
  st[1] = 0x3320646e;
  st[2] = 0x79622d32;
  st[3] = 0x6b206574;
  for (int i = 0; i < 8; i++) {
    st[4 + i] = (uint32_t)key[4 * i] | ((uint32_t)key[4 * i + 1] << 8) |
                ((uint32_t)key[4 * i + 2] << 16) |
                ((uint32_t)key[4 * i + 3] << 24);
  }
  st[12] = counter;
  st[13] = nonce[0];
  st[14] = nonce[1];
  st[15] = nonce[2];
  uint32_t w[16];
  memcpy(w, st, sizeof(st));
  auto qr = [&](int a, int b, int c, int d) {
    w[a] += w[b];
    w[d] = rotl32(w[d] ^ w[a], 16);
    w[c] += w[d];
    w[b] = rotl32(w[b] ^ w[c], 12);
    w[a] += w[b];
    w[d] = rotl32(w[d] ^ w[a], 8);
    w[c] += w[d];
    w[b] = rotl32(w[b] ^ w[c], 7);
  };
  for (int i = 0; i < 10; i++) {
    qr(0, 4, 8, 12);
    qr(1, 5, 9, 13);
    qr(2, 6, 10, 14);
    qr(3, 7, 11, 15);
    qr(0, 5, 10, 15);
    qr(1, 6, 11, 12);
    qr(2, 7, 8, 13);
    qr(3, 4, 9, 14);
  }
  for (int i = 0; i < 16; i++) {
    uint32_t v = w[i] + st[i];
    out[4 * i] = (uint8_t)v;
    out[4 * i + 1] = (uint8_t)(v >> 8);
    out[4 * i + 2] = (uint8_t)(v >> 16);
    out[4 * i + 3] = (uint8_t)(v >> 24);
  }
}

struct ChaChaRng {
  uint8_t key[32];
  uint64_t counter;
  uint8_t buf[64];
  size_t buf_len;

  void init(const uint8_t seed[32]) {
    memcpy(key, seed, 32);
    counter = 0;
    buf_len = 0;
  }
  void refill() {
    uint32_t lo = (uint32_t)counter;
    uint32_t nonce[3] = {(uint32_t)(counter >> 32), 0, 0};
    chacha20_block(key, lo, nonce, buf);
    buf_len = 64;
    counter++;
  }
  void next_bytes(uint8_t *out, size_t n) {
    size_t got = 0;
    while (got < n) {
      if (buf_len == 0) refill();
      size_t take = n - got < buf_len ? n - got : buf_len;
      memcpy(out + got, buf + 64 - buf_len, take);
      buf_len -= take;
      got += take;
    }
  }
  uint64_t next_u64() {
    uint8_t b[8];
    next_bytes(b, 8);
    uint64_t v = 0;
    for (int i = 7; i >= 0; i--) v = (v << 8) | b[i];
    return v;
  }
};

// ---------------- Marlin FS-RNG (fs_rng.py / fs_rng.rs) ----------------
struct FsRng {
  uint8_t seed[32];
  ChaChaRng r;

  void hash_seed(const std::vector<uint8_t> &material) {
    Transcript t;
    t.init((const uint8_t *)"MARLINSEED", 10);
    t.append((const uint8_t *)"Seed", 4, material.data(), material.size());
    t.challenge((const uint8_t *)"x", 1, seed, 32);
    r.init(seed);
  }
  void init(const std::vector<uint8_t> &material) { hash_seed(material); }
  void absorb(const std::vector<uint8_t> &material) {
    std::vector<uint8_t> m = material;
    m.insert(m.end(), seed, seed + 32);
    hash_seed(m);
  }
  // ark Fp::rand rejection sampling: 4x u64, top bits shaved to 254
  Fr rand_fr() {
    for (;;) {
      U256 v;
      uint8_t b[32];
      r.next_bytes(b, 32);
      for (int limb = 0; limb < 4; limb++) {
        uint64_t x = 0;
        for (int j = 7; j >= 0; j--) x = (x << 8) | b[limb * 8 + j];
        v.v[limb] = x;
      }
      v.v[3] &= (1ULL << 62) - 1;  // shave 256 - 254 = 2 bits
      if (u256_cmp(v, R_ORDER) < 0) return fr_from_u256(v);
    }
  }
  // rand_u128() % r, as marlin.py's opening_challenge
  Fr rand_u128_mod_r() {
    uint64_t lo = r.next_u64();
    uint64_t hi = r.next_u64();
    U256 v = {{lo, hi, 0, 0}};
    // 128-bit value < r always (r ~ 2^254), reduce anyway for form
    if (u256_cmp(v, R_ORDER) >= 0) u256_sub(v, v, R_ORDER);
    return fr_from_u256(v);
  }
};

// ---------------- ToBytes writers (FS absorb material) ----------------
static void put_u256_le(std::vector<uint8_t> &out, const U256 &v) {
  for (int limb = 0; limb < 4; limb++) {
    uint64_t x = v.v[limb];
    for (int j = 0; j < 8; j++) {
      out.push_back((uint8_t)x);
      x >>= 8;
    }
  }
}

static void put_u64_le(std::vector<uint8_t> &out, uint64_t x) {
  for (int j = 0; j < 8; j++) {
    out.push_back((uint8_t)x);
    x >>= 8;
  }
}

static void put_g1_tobytes(std::vector<uint8_t> &out, const G1 &p) {
  // x || y || infinity-u8 (serialize/tobytes.py point_bytes)
  put_u256_le(out, fq_to_u256(p.x));
  put_u256_le(out, fq_to_u256(p.y));
  out.push_back(p.inf ? 1 : 0);
}

static void put_g2_tobytes(std::vector<uint8_t> &out, const G2 &p) {
  put_u256_le(out, fq_to_u256(p.x.c0));
  put_u256_le(out, fq_to_u256(p.x.c1));
  put_u256_le(out, fq_to_u256(p.y.c0));
  put_u256_le(out, fq_to_u256(p.y.c1));
  out.push_back(p.inf ? 1 : 0);
}

static void put_fr_tobytes(std::vector<uint8_t> &out, const Fr &x) {
  put_u256_le(out, fr_to_u256(x));
}

// ---------------- parsed structures ----------------
struct Commitment {
  G1 comm;
  bool has_shifted;
  G1 shifted;
};

struct IndexInfo {
  uint64_t num_constraints, num_variables, num_non_zeros;
};

struct VerifierKeyPC {
  G1 g, gamma_g;
  G2 h, beta_h;
  uint64_t supported_degree;
};

struct Ivk {
  IndexInfo info;
  std::vector<Commitment> index_comms;
  VerifierKeyPC vk;
};

struct OpenProof {
  G1 w;
  bool has_rand;
  Fr rand_v;
};

struct Proof {
  std::vector<std::vector<Commitment>> commitments;  // 3 rounds
  std::vector<Fr> evaluations;
  std::vector<OpenProof> opening_proofs;
};

static bool read_u64(Reader &r, uint64_t *out) {
  uint8_t b[8];
  if (!r.take(b, 8)) return false;
  uint64_t v = 0;
  for (int i = 7; i >= 0; i--) v = (v << 8) | b[i];
  *out = v;
  return true;
}

static bool read_fr(Reader &r, Fr *out) {
  uint8_t b[32];
  if (!r.take(b, 32)) return false;
  U256 raw;
  for (int i = 0; i < 4; i++) {
    uint64_t limb = 0;
    for (int j = 7; j >= 0; j--) limb = (limb << 8) | b[i * 8 + j];
    raw.v[i] = limb;
  }
  if (u256_cmp(raw, R_ORDER) >= 0) return false;
  *out = fr_from_u256(raw);
  return true;
}

static bool read_commitment(Reader &r, Commitment *out) {
  if (!read_g1(r, &out->comm)) return false;
  uint8_t flag;
  if (!r.take(&flag, 1)) return false;
  if (flag == 0) {
    out->has_shifted = false;
    return true;
  }
  if (flag != 1) return false;
  out->has_shifted = true;
  return read_g1(r, &out->shifted);
}

static const uint64_t MAX_VEC = 1 << 20;

static bool read_ivk(Reader &r, Ivk *out) {
  if (!read_u64(r, &out->info.num_constraints)) return false;
  if (!read_u64(r, &out->info.num_variables)) return false;
  if (!read_u64(r, &out->info.num_non_zeros)) return false;
  uint64_t n;
  if (!read_u64(r, &n) || n != 12) return false;  // 12 indexer comms
  out->index_comms.resize(n);
  for (uint64_t i = 0; i < n; i++)
    if (!read_commitment(r, &out->index_comms[i])) return false;
  if (!read_g1(r, &out->vk.g)) return false;
  if (!read_g1(r, &out->vk.gamma_g)) return false;
  if (!read_g2(r, &out->vk.h)) return false;
  if (!read_g2(r, &out->vk.beta_h)) return false;
  if (!read_u64(r, &out->vk.supported_degree)) return false;
  if (out->vk.supported_degree > MAX_VEC) return false;
  return !r.fail && r.n == 0;
}

static bool read_proof(Reader &r, Proof *out) {
  uint64_t rounds;
  if (!read_u64(r, &rounds) || rounds != 3) return false;
  out->commitments.resize(3);
  for (int k = 0; k < 3; k++) {
    uint64_t n;
    if (!read_u64(r, &n) || n > 16) return false;
    out->commitments[k].resize(n);
    for (uint64_t i = 0; i < n; i++)
      if (!read_commitment(r, &out->commitments[k][i])) return false;
  }
  uint64_t ne;
  if (!read_u64(r, &ne) || ne > 64) return false;
  out->evaluations.resize(ne);
  for (uint64_t i = 0; i < ne; i++)
    if (!read_fr(r, &out->evaluations[i])) return false;
  uint64_t np;
  if (!read_u64(r, &np) || np > 8) return false;
  out->opening_proofs.resize(np);
  for (uint64_t i = 0; i < np; i++) {
    OpenProof &op = out->opening_proofs[i];
    if (!read_g1(r, &op.w)) return false;
    uint8_t flag;
    if (!r.take(&flag, 1)) return false;
    if (flag == 0) {
      op.has_rand = false;
    } else if (flag == 1) {
      op.has_rand = true;
      if (!read_fr(r, &op.rand_v)) return false;
    } else {
      return false;
    }
  }
  return !r.fail && r.n == 0;
}

// ---------------- domains ----------------
static uint64_t pow2_at_least(uint64_t n) {
  uint64_t s = 1;
  while (s < (n ? n : 1)) s *= 2;
  return s;
}

// v_H(x) = x^n - 1 for the pow2 domain of size n
static Fr eval_vanishing(const Fr &x, uint64_t n) {
  return fr_sub(fr_pow_u64(x, n), FR_ONE);
}

// u_H(x, y) = (v(x) - v(y)) / (x - y); n*x^(n-1) on the diagonal
static Fr bivariate_eval(const Fr &x, const Fr &y, uint64_t n) {
  if (!fr_eq(x, y)) {
    Fr num = fr_sub(eval_vanishing(x, n), eval_vanishing(y, n));
    return fr_mul(num, fr_inv(fr_sub(x, y)));
  }
  return fr_mul(fr_from_u64(n), fr_pow_u64(x, n - 1));
}

// BN254 Fr: generator 5 (host/pairing.py:173), two-adicity 28
static Fr domain_root(uint64_t n) {
  U256 e;
  u256_sub(e, R_ORDER, (U256){{1, 0, 0, 0}});  // r - 1
  // e = (r-1) / n  (n is a power of two dividing 2^28)
  while (n > 1) {
    u256_divmod_small(e, 2);
    n >>= 1;
  }
  return fr_pow(fr_from_u64(5), e);
}

// x_poly evaluation at beta via the Lagrange formula over domain X:
// sum_i vals[i] * (v_X(beta)/n) * w^i / (beta - w^i)
static Fr eval_interpolated(const std::vector<Fr> &vals, const Fr &beta) {
  uint64_t n = pow2_at_least(vals.size());
  Fr w = domain_root(n);
  Fr vx = eval_vanishing(beta, n);
  if (fr_is_zero(vx)) {
    // beta on the domain: value is vals at that point (or 0 beyond)
    Fr cur = FR_ONE;
    for (uint64_t i = 0; i < n; i++) {
      if (fr_eq(cur, beta))
        return i < vals.size() ? vals[i] : FR_ZERO;
      cur = fr_mul(cur, w);
    }
    return FR_ZERO;
  }
  Fr scale = fr_mul(vx, fr_inv(fr_from_u64(n)));
  Fr acc = FR_ZERO;
  Fr cur = FR_ONE;
  for (size_t i = 0; i < vals.size(); i++) {
    Fr term = fr_mul(vals[i], fr_mul(cur, fr_inv(fr_sub(beta, cur))));
    acc = fr_add(acc, term);
    cur = fr_mul(cur, w);
  }
  return fr_mul(acc, scale);
}

// ---------------- the verifier ----------------
static const char *LABELS[21] = {
    "a_row", "a_col", "a_val", "a_row_col", "b_row", "b_col", "b_val",
    "b_row_col", "c_row", "c_col", "c_val", "c_row_col", "w", "z_a",
    "z_b", "mask", "t", "g_1", "h_1", "g_2", "h_2"};

struct Query {
  std::string label;
  int point_id;  // 0 = beta, 1 = gamma
};

static int cmp_u256_pair(const U256 &a, const U256 &b) { return u256_cmp(a, b); }

// returns 0 ok / 1 encoding / 2 verify-fail (contracts.py codes)
static int verify(const uint8_t *vk_bytes, size_t vk_len,
                  const uint8_t *proof_bytes, size_t proof_len,
                  const uint8_t *publics_bytes, size_t publics_len) {
  Reader vr = {vk_bytes, vk_len, false};
  Ivk ivk;
  if (!read_ivk(vr, &ivk)) return 1;
  Reader pr = {proof_bytes, proof_len, false};
  Proof proof;
  if (!read_proof(pr, &proof)) return 1;
  if (publics_len % 32) return 1;
  size_t n_pub = publics_len / 32;
  std::vector<Fr> publics(n_pub);
  for (size_t i = 0; i < n_pub; i++) {
    Reader sr = {publics_bytes + 32 * i, 32, false};
    if (!read_fr(sr, &publics[i])) return 1;
  }
  if (ivk.info.num_constraints != ivk.info.num_variables) return 2;
  if (proof.commitments[0].size() != 4 || proof.commitments[1].size() != 3 ||
      proof.commitments[2].size() != 2)
    return 1;
  if (proof.evaluations.size() != 21) return 1;
  if (proof.opening_proofs.size() != 2) return 1;

  // ---- FS seed: ivk.to_bytes() + frs_bytes(publics) ----
  std::vector<uint8_t> seed;
  put_u64_le(seed, ivk.info.num_variables);
  put_u64_le(seed, ivk.info.num_constraints);
  put_u64_le(seed, ivk.info.num_non_zeros);
  auto put_comm = [&](std::vector<uint8_t> &out, const Commitment &c) {
    put_g1_tobytes(out, c.comm);
    if (c.has_shifted) {
      out.push_back(1);
      put_g1_tobytes(out, c.shifted);
    } else {
      out.push_back(0);
    }
  };
  for (const Commitment &c : ivk.index_comms) put_comm(seed, c);
  put_g1_tobytes(seed, ivk.vk.g);
  put_g1_tobytes(seed, ivk.vk.gamma_g);
  put_g2_tobytes(seed, ivk.vk.h);
  put_g2_tobytes(seed, ivk.vk.beta_h);
  put_u64_le(seed, ivk.vk.supported_degree);
  for (const Fr &x : publics) put_fr_tobytes(seed, x);

  FsRng rng;
  rng.init(seed);

  uint64_t h_size = pow2_at_least(ivk.info.num_constraints);
  uint64_t k_size = pow2_at_least(ivk.info.num_non_zeros);

  // round 1 absorb + sample
  std::vector<uint8_t> buf;
  for (const Commitment &c : proof.commitments[0]) put_comm(buf, c);
  rng.absorb(buf);
  auto sample_outside = [&](uint64_t n) {
    Fr t = rng.rand_fr();
    while (fr_is_zero(eval_vanishing(t, n))) t = rng.rand_fr();
    return t;
  };
  Fr alpha = sample_outside(h_size);
  Fr eta_a = rng.rand_fr();
  Fr eta_b = rng.rand_fr();
  Fr eta_c = rng.rand_fr();
  // round 2
  buf.clear();
  for (const Commitment &c : proof.commitments[1]) put_comm(buf, c);
  rng.absorb(buf);
  Fr beta = sample_outside(h_size);
  // round 3
  buf.clear();
  for (const Commitment &c : proof.commitments[2]) put_comm(buf, c);
  rng.absorb(buf);
  Fr gamma = rng.rand_fr();

  // opening challenge: absorb evaluations, rand_u128 % r
  buf.clear();
  for (const Fr &e : proof.evaluations) put_fr_tobytes(buf, e);
  rng.absorb(buf);
  Fr opening_challenge = rng.rand_u128_mod_r();

  // ---- query set, sorted like Python sorted({(label, point)}) ----
  // (w, z_a, z_b, mask, t, g_1, h_1) at beta; (g_2, h_2) and the 12 indexer
  // polynomials at gamma. Sort key: (label string, point int value).
  struct Q {
    std::string label;
    bool at_gamma;
  };
  std::vector<Q> qs;
  const char *beta_labels[7] = {"w", "z_a", "z_b", "mask", "t", "g_1", "h_1"};
  for (const char *l : beta_labels) qs.push_back({l, false});
  qs.push_back({"g_2", true});
  qs.push_back({"h_2", true});
  for (int i = 0; i < 12; i++) qs.push_back({LABELS[i], true});
  U256 beta_raw = fr_to_u256(beta), gamma_raw = fr_to_u256(gamma);
  std::sort(qs.begin(), qs.end(), [&](const Q &a, const Q &b) {
    if (a.label != b.label) return a.label < b.label;
    const U256 &pa = a.at_gamma ? gamma_raw : beta_raw;
    const U256 &pb = b.at_gamma ? gamma_raw : beta_raw;
    return cmp_u256_pair(pa, pb) < 0;
  });
  if (qs.size() != proof.evaluations.size()) return 1;
  // evaluation lookup
  auto find_eval = [&](const char *label, bool at_gamma) -> Fr {
    for (size_t i = 0; i < qs.size(); i++)
      if (qs[i].label == label && qs[i].at_gamma == at_gamma)
        return proof.evaluations[i];
    return FR_ZERO;  // unreachable for well-formed label sets
  };

  // ---- AHP equality check (ahp.py:588-648) ----
  Fr v_h_alpha = eval_vanishing(alpha, h_size);
  Fr v_h_beta = eval_vanishing(beta, h_size);
  Fr r_alpha_beta = bivariate_eval(alpha, beta, h_size);
  std::vector<Fr> formatted;
  formatted.push_back(FR_ONE);
  for (const Fr &x : publics) formatted.push_back(x);
  uint64_t x_size = pow2_at_least(formatted.size());
  Fr v_x_beta = eval_vanishing(beta, x_size);
  Fr x_at_beta = eval_interpolated(formatted, beta);

  Fr e_mask = find_eval("mask", false), e_za = find_eval("z_a", false);
  Fr e_zb = find_eval("z_b", false), e_t = find_eval("t", false);
  Fr e_w = find_eval("w", false), e_g1 = find_eval("g_1", false);
  Fr e_h1 = find_eval("h_1", false);
  Fr inner = fr_add(fr_add(fr_mul(eta_a, e_za), fr_mul(eta_b, e_zb)),
                    fr_mul(eta_c, fr_mul(e_za, e_zb)));
  Fr lhs = fr_add(e_mask, fr_mul(r_alpha_beta, inner));
  lhs = fr_sub(lhs, fr_mul(e_t, fr_add(fr_mul(v_x_beta, e_w), x_at_beta)));
  Fr rhs = fr_add(fr_mul(e_h1, v_h_beta), fr_mul(beta, e_g1));
  if (!fr_eq(lhs, rhs)) return 2;

  Fr v_k_gamma = eval_vanishing(gamma, k_size);
  Fr k_as_fr = fr_from_u64(k_size);
  Fr alpha_beta = fr_mul(alpha, beta);
  Fr denom[3];
  const char *ms[3] = {"a", "b", "c"};
  for (int m = 0; m < 3; m++) {
    std::string row = std::string(ms[m]) + "_row";
    std::string col = std::string(ms[m]) + "_col";
    std::string rc = std::string(ms[m]) + "_row_col";
    Fr e_row = find_eval(row.c_str(), true);
    Fr e_col = find_eval(col.c_str(), true);
    Fr e_rc = find_eval(rc.c_str(), true);
    denom[m] = fr_add(
        fr_sub(fr_sub(alpha_beta, fr_mul(alpha, e_row)), fr_mul(beta, e_col)),
        e_rc);
  }
  Fr e_aval = find_eval("a_val", true), e_bval = find_eval("b_val", true);
  Fr e_cval = find_eval("c_val", true);
  Fr a_g = fr_add(
      fr_add(fr_mul(fr_mul(fr_mul(eta_a, e_aval), denom[1]), denom[2]),
             fr_mul(fr_mul(fr_mul(eta_b, e_bval), denom[2]), denom[0])),
      fr_mul(fr_mul(fr_mul(eta_c, e_cval), denom[0]), denom[1]));
  a_g = fr_mul(fr_mul(a_g, v_h_alpha), v_h_beta);
  Fr b_g = fr_mul(fr_mul(denom[0], denom[1]), denom[2]);
  Fr e_g2 = find_eval("g_2", true), e_h2 = find_eval("h_2", true);
  Fr lhs2 = fr_mul(e_h2, v_k_gamma);
  Fr rhs2 = fr_sub(
      a_g, fr_mul(b_g, fr_add(fr_mul(gamma, e_g2),
                              fr_mul(e_t, fr_inv(k_as_fr)))));
  if (!fr_eq(lhs2, rhs2)) return 2;

  // ---- batched KZG check (pc.py:214-291) ----
  // degree bounds: indexer None*12, round1 None*4, round2 [None, h-2, None],
  // round3 [k-2, None] — in label order LABELS[0..20]
  bool has_bound[21] = {false};
  uint64_t bound[21] = {0};
  has_bound[17] = true;
  bound[17] = h_size - 2;  // g_1
  has_bound[19] = true;
  bound[19] = k_size - 2;  // g_2
  // commitments by label order
  std::vector<Commitment> all_comms;
  for (const Commitment &c : ivk.index_comms) all_comms.push_back(c);
  for (int k2 = 0; k2 < 3; k2++)
    for (const Commitment &c : proof.commitments[k2]) all_comms.push_back(c);
  if (all_comms.size() != 21) return 1;

  // per query point (sorted ascending by value): sorted labels, accumulate
  struct PointGroup {
    U256 raw;
    Fr point;
    bool is_gamma;
  };
  std::vector<PointGroup> groups;
  groups.push_back({beta_raw, beta, false});
  groups.push_back({gamma_raw, gamma, true});
  std::sort(groups.begin(), groups.end(), [](const PointGroup &a,
                                             const PointGroup &b) {
    return u256_cmp(a.raw, b.raw) < 0;
  });

  G1 total_c[2];
  Fr total_v[2];
  for (int gi = 0; gi < 2; gi++) {
    const PointGroup &pg = groups[gi];
    // labels queried at this point, sorted
    std::vector<int> idxs;
    for (int i = 0; i < 21; i++) {
      bool at_gamma = !(i >= 12 && i <= 18);  // indexer+g_2/h_2 at gamma
      // beta labels: w z_a z_b mask t g_1 h_1 == indices 12..18
      if (at_gamma == pg.is_gamma) idxs.push_back(i);
    }
    std::sort(idxs.begin(), idxs.end(), [&](int a, int b) {
      return std::string(LABELS[a]) < std::string(LABELS[b]);
    });
    G1 acc_comm = {FQ_ZERO, FQ_ZERO, true};
    Fr acc_value = FR_ZERO;
    Fr challenge = FR_ONE;
    for (int i : idxs) {
      const Commitment &c = all_comms[i];
      Fr value = find_eval(LABELS[i], pg.is_gamma);
      acc_comm = g1_add(acc_comm, g1_mul(c.comm, fr_to_u256(challenge)));
      acc_value = fr_add(acc_value, fr_mul(value, challenge));
      if (has_bound[i]) {
        if (!c.has_shifted) return 1;
        Fr shifted_challenge = fr_mul(challenge, opening_challenge);
        uint64_t shift = ivk.vk.supported_degree - bound[i];
        Fr shift_value = fr_mul(fr_pow_u64(pg.point, shift), value);
        acc_comm = g1_add(
            acc_comm, g1_mul(c.shifted, fr_to_u256(shifted_challenge)));
        acc_value = fr_add(acc_value, fr_mul(shift_value, shifted_challenge));
      }
      challenge = fr_mul(fr_mul(challenge, opening_challenge),
                         opening_challenge);
    }
    total_c[gi] = acc_comm;
    total_v[gi] = acc_value;
  }

  // kzg10.check per group: e(u, h) == e(w, beta_h - point*h)
  for (int gi = 0; gi < 2; gi++) {
    const OpenProof &op = proof.opening_proofs[gi];
    G1 u = g1_add(total_c[gi],
                  g1_neg(g1_mul(ivk.vk.g, fr_to_u256(total_v[gi]))));
    if (op.has_rand)
      u = g1_add(u, g1_neg(g1_mul(ivk.vk.gamma_g, fr_to_u256(op.rand_v))));
    G2 hp = g2_mul(ivk.vk.h, fr_to_u256(groups[gi].point));
    G2 v = g2_add(ivk.vk.beta_h, (G2){hp.x, fq2_neg(hp.y), hp.inf});
    Fq12 f = miller_loop(u, ivk.vk.h);
    f = fq12_mul(f, miller_loop(g1_neg(op.w), v));
    Fq12 out = final_exponentiation(f);
    if (!fq12_eq(out, FQ12_ONE)) return 2;
  }
  return 0;
}

static void init_fr_constants() {
  static bool done = false;
  if (done) return;
  uint64_t r0 = R_ORDER.v[0];
  uint64_t inv = 1;
  for (int i = 0; i < 63; i++) inv *= 2 - r0 * inv;
  FR_INV = ~inv + 1;
  U256 r = {{1, 0, 0, 0}};
  for (int i = 0; i < 256; i++) {
    U256 d;
    uint64_t c = u256_add(d, r, r);
    if (c || u256_cmp(d, R_ORDER) >= 0) u256_sub(d, d, R_ORDER);
    r = d;
  }
  FR_R1 = r;
  for (int i = 0; i < 256; i++) {
    U256 d;
    uint64_t c = u256_add(d, r, r);
    if (c || u256_cmp(d, R_ORDER) >= 0) u256_sub(d, d, R_ORDER);
    r = d;
  }
  FR_R2 = r;
  FR_ZERO.n = (U256){{0, 0, 0, 0}};
  FR_ONE.n = FR_R1;
  done = true;
}

}  // namespace marlin_native

extern "C" {

int marlin_verify_bn254(const uint8_t *vk_bytes, size_t vk_len,
                        const uint8_t *proof_bytes, size_t proof_len,
                        const uint8_t *publics_bytes, size_t publics_len) {
  init_constants();
  marlin_native::init_fr_constants();
  return marlin_native::verify(vk_bytes, vk_len, proof_bytes, proof_len,
                               publics_bytes, publics_len);
}

// consistency: Fr Montgomery context + keccak/strobe/chacha sanity
int marlin_bn254_selftest(void) {
  init_constants();
  marlin_native::init_fr_constants();
  using namespace marlin_native;
  // Fr: 3 * inv(3) == 1
  Fr three = fr_from_u64(3);
  if (!fr_eq(fr_mul(three, fr_inv(three)), FR_ONE)) return 1;
  // domain root: w^n == 1, w^(n/2) != 1
  Fr w = domain_root(1 << 10);
  if (!fr_eq(fr_pow_u64(w, 1 << 10), FR_ONE)) return 2;
  if (fr_eq(fr_pow_u64(w, 1 << 9), FR_ONE)) return 3;
  // ChaCha RFC 8439 vector: key 00..1f, counter 1, nonce 00 00 00 09 00 00
  // 00 4a 00 00 00 00 -> keystream starts 10 f1 e7 e4 ...
  uint8_t key[32];
  for (int i = 0; i < 32; i++) key[i] = (uint8_t)i;
  uint32_t nonce[3] = {0x09000000u, 0x4a000000u, 0x00000000u};
  uint8_t blk[64];
  chacha20_block(key, 1, nonce, blk);
  if (blk[0] != 0x10 || blk[1] != 0xf1 || blk[2] != 0xe7 || blk[3] != 0xe4)
    return 4;
  // merlin transcript vector: must match the Python Transcript
  // (tests/test_contracts.py pins the challenge bytes cross-impl)
  return 0;
}

}  // extern "C"
