// Native CPU oracle for the TPU MSM framework.
//
// Role parity: the reference vendors a Rust->WASM Aleo snarkVM build as its
// trusted "best CPU" implementation and correctness oracle
// (reference: src/workers/aleo-wasm-web/, used as ground truth for random
// inputs in src/ui/AllBenchmarks.tsx:53-55).  Rust is unavailable in this
// environment, so this is an independent C++ implementation of:
//   - 253-bit base-field arithmetic (4x64-bit limbs, Montgomery form)
//   - extended twisted Edwards point add/double/scalar-mul (a = -1, d = 3021)
//   - a serial signed-window Pippenger MSM
// exposed through a C ABI consumed via ctypes (utils/oracle.py).
//
// Build: cpp/Makefile -> liboracle.so.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

using u64 = std::uint64_t;
using u128 = unsigned __int128;

namespace {

// ---------------------------------------------------------------------------
// Field: F_p with p = 0x12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001
// Montgomery form with R = 2^256.
// ---------------------------------------------------------------------------

struct Fp {
  u64 v[4];  // little-endian 64-bit limbs, Montgomery representation
};

static const u64 P_LIMBS[4] = {0x0a11800000000001ULL, 0x59aa76fed0000001ULL,
                               0x60b44d1e5c37b001ULL, 0x12ab655e9a2ca556ULL};
// R^2 mod p (computed at init)
static u64 R2_LIMBS[4];
static u64 PINV;  // -p^{-1} mod 2^64

static inline int cmp256(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline void sub256(u64 r[4], const u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline u64 add256(u64 r[4], const u64 a[4], const u64 b[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    r[i] = (u64)s;
    carry = s >> 64;
  }
  return (u64)carry;
}

static inline void fp_add(Fp &r, const Fp &a, const Fp &b) {
  u64 carry = add256(r.v, a.v, b.v);
  if (carry || cmp256(r.v, P_LIMBS) >= 0) {
    u64 t[4];
    sub256(t, r.v, P_LIMBS);
    std::memcpy(r.v, t, sizeof t);
  }
}

static inline void fp_sub(Fp &r, const Fp &a, const Fp &b) {
  if (cmp256(a.v, b.v) >= 0) {
    sub256(r.v, a.v, b.v);
  } else {
    u64 t[4];
    add256(t, a.v, P_LIMBS);
    sub256(r.v, t, b.v);
  }
}

// CIOS Montgomery multiplication, 4x64 limbs.
static inline void fp_mul(Fp &r, const Fp &a, const Fp &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * PINV;
    carry = 0;
    {
      u128 c0 = (u128)t[0] + (u128)m * P_LIMBS[0];
      carry = c0 >> 64;
    }
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * P_LIMBS[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 c4 = (u128)t[4] + carry;
    t[3] = (u64)c4;
    t[4] = t[5] + (u64)(c4 >> 64);
    t[5] = 0;
  }
  std::memcpy(r.v, t, 4 * sizeof(u64));
  if (t[4] || cmp256(r.v, P_LIMBS) >= 0) {
    u64 s[4];
    sub256(s, r.v, P_LIMBS);
    std::memcpy(r.v, s, sizeof s);
  }
}

static Fp FP_ZERO, FP_ONE_MONT, FP_D_MONT, FP_TWO_MONT;

static inline void fp_from_raw(Fp &r, const u64 raw[4]) {
  Fp tmp;
  std::memcpy(tmp.v, raw, sizeof tmp.v);
  Fp r2;
  std::memcpy(r2.v, R2_LIMBS, sizeof r2.v);
  fp_mul(r, tmp, r2);
}

static inline void fp_to_raw(u64 raw[4], const Fp &a) {
  Fp one;
  one.v[0] = 1;
  one.v[1] = one.v[2] = one.v[3] = 0;
  Fp r;
  fp_mul(r, a, one);
  std::memcpy(raw, r.v, 4 * sizeof(u64));
}

static inline bool fp_is_zero(const Fp &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline void fp_neg(Fp &r, const Fp &a) {
  if (fp_is_zero(a)) {
    r = a;
  } else {
    sub256(r.v, P_LIMBS, a.v);
  }
}

// ---------------------------------------------------------------------------
// Extended twisted Edwards points, a = -1, d = 3021 (Montgomery coords).
// ---------------------------------------------------------------------------

struct Pt {
  Fp x, y, t, z;
};

static inline void pt_identity(Pt &p) {
  p.x = FP_ZERO;
  p.y = FP_ONE_MONT;
  p.t = FP_ZERO;
  p.z = FP_ONE_MONT;
}

// add-2008-hwcd (unified; see ops/curve.py docstring for validity argument).
static inline void pt_add(Pt &r, const Pt &p, const Pt &q) {
  Fp a, b, c, d, e, f, g, h, t1, t2;
  fp_mul(a, p.x, q.x);
  fp_mul(b, p.y, q.y);
  fp_mul(t1, p.t, q.t);
  fp_mul(c, FP_D_MONT, t1);
  fp_mul(d, p.z, q.z);
  fp_add(t1, p.x, p.y);
  fp_add(t2, q.x, q.y);
  fp_mul(e, t1, t2);
  fp_sub(e, e, a);
  fp_sub(e, e, b);
  fp_sub(f, d, c);
  fp_add(g, d, c);
  fp_add(h, b, a);  // B - aA, a = -1
  fp_mul(r.x, e, f);
  fp_mul(r.y, g, h);
  fp_mul(r.t, e, h);
  fp_mul(r.z, f, g);
}

// dbl-2008-hwcd
static inline void pt_double(Pt &r, const Pt &p) {
  Fp a, b, c, d, e, f, g, h, t1;
  fp_mul(a, p.x, p.x);
  fp_mul(b, p.y, p.y);
  fp_mul(t1, p.z, p.z);
  fp_add(c, t1, t1);
  fp_neg(d, a);
  fp_add(t1, p.x, p.y);
  fp_mul(e, t1, t1);
  fp_sub(e, e, a);
  fp_sub(e, e, b);
  fp_add(g, d, b);
  fp_sub(f, g, c);
  fp_sub(h, d, b);
  fp_mul(r.x, e, f);
  fp_mul(r.y, g, h);
  fp_mul(r.t, e, h);
  fp_mul(r.z, f, g);
}

static inline void pt_neg(Pt &r, const Pt &p) {
  fp_neg(r.x, p.x);
  r.y = p.y;
  fp_neg(r.t, p.t);
  r.z = p.z;
}

static void pt_scalar_mul(Pt &r, const Pt &p, const u64 k[4]) {
  pt_identity(r);
  Pt base = p;
  for (int limb = 0; limb < 4; ++limb) {
    u64 bits = k[limb];
    for (int b = 0; b < 64; ++b) {
      if ((bits >> b) & 1) {
        Pt t;
        pt_add(t, r, base);
        r = t;
      }
      Pt t2;
      pt_double(t2, base);
      base = t2;
    }
  }
}

static void init_constants() {
  // PINV = -p^{-1} mod 2^64 by Newton iteration.
  u64 inv = 1;
  for (int i = 0; i < 63; ++i) inv *= 2 - P_LIMBS[0] * inv;
  PINV = ~inv + 1;  // -(p^{-1})

  // R2 = 2^512 mod p: start from R mod p by repeated doubling.
  // 2^256 mod p: compute via long division emulation — simpler: start with
  // 1, double 512 times with reduction.
  u64 acc[4] = {1, 0, 0, 0};
  for (int i = 0; i < 512; ++i) {
    u64 carry = add256(acc, acc, acc);
    if (carry || cmp256(acc, P_LIMBS) >= 0) {
      u64 t[4];
      sub256(t, acc, P_LIMBS);
      std::memcpy(acc, t, sizeof t);
    }
  }
  std::memcpy(R2_LIMBS, acc, sizeof acc);

  std::memset(FP_ZERO.v, 0, sizeof FP_ZERO.v);
  u64 one_raw[4] = {1, 0, 0, 0};
  fp_from_raw(FP_ONE_MONT, one_raw);
  u64 d_raw[4] = {3021, 0, 0, 0};
  fp_from_raw(FP_D_MONT, d_raw);
  u64 two_raw[4] = {2, 0, 0, 0};
  fp_from_raw(FP_TWO_MONT, two_raw);
}

struct InitOnce {
  InitOnce() { init_constants(); }
} init_once;

// ---------------------------------------------------------------------------
// Serial signed-window Pippenger MSM.
// ---------------------------------------------------------------------------

static void decompose_digits(std::vector<std::vector<int>> &digits,
                             const u64 *scalars, std::size_t n, int c);
static void window_bucket_sum(Pt &g_out, const Pt *points,
                              const std::vector<std::vector<int>> &digits,
                              std::size_t n, int c, int w);

static void horner_windows(Pt &out, const std::vector<Pt> &window_sums, int c) {
  Pt acc = window_sums.back();
  for (int w = (int)window_sums.size() - 2; w >= 0; --w) {
    for (int b = 0; b < c; ++b) {
      Pt t;
      pt_double(t, acc);
      acc = t;
    }
    Pt t;
    pt_add(t, acc, window_sums[w]);
    acc = t;
  }
  out = acc;
}

static void msm_pippenger(Pt &out, const Pt *points, const u64 *scalars,
                          std::size_t n, int c) {
  const int num_windows = (256 + c - 1) / c;
  std::vector<std::vector<int>> digits(n);
  decompose_digits(digits, scalars, n, c);
  std::vector<Pt> window_sums(num_windows);
  for (int w = 0; w < num_windows; ++w)
    window_bucket_sum(window_sums[w], points, digits, n, c, w);
  horner_windows(out, window_sums, c);
}


// ---------------------------------------------------------------------------
// Multi-threaded Pippenger: one thread per scalar window (role parity with
// the reference's rayon-over-web-workers WASM path,
// reference: src/workers/wasmMSM.ts:1-13, aleo_wasm msm_parallel).
// ---------------------------------------------------------------------------

static void decompose_digits(std::vector<std::vector<int>> &digits,
                             const u64 *scalars, std::size_t n, int c) {
  const int num_windows = (256 + c - 1) / c;
  const u64 l = (u64)1 << c;
  const u64 mask = l - 1;
  for (std::size_t i = 0; i < n; ++i) {
    digits[i].resize(num_windows);
    u64 carry = 0;
    for (int w = 0; w < num_windows; ++w) {
      int bit = w * c;
      int limb = bit / 64, off = bit % 64;
      u64 v = scalars[i * 4 + limb] >> off;
      if (off + c > 64 && limb + 1 < 4) v |= scalars[i * 4 + limb + 1] << (64 - off);
      v = (v & mask) + carry;
      if (v >= l / 2) {
        digits[i][w] = (int)v - (int)l;
        carry = 1;
      } else {
        digits[i][w] = (int)v;
        carry = 0;
      }
    }
  }
}

static void window_bucket_sum(Pt &g_out, const Pt *points,
                              const std::vector<std::vector<int>> &digits,
                              std::size_t n, int c, int w) {
  const std::size_t nb = (std::size_t)1 << (c - 1);
  std::vector<Pt> buckets(nb);
  std::vector<bool> used(nb, false);
  for (std::size_t i = 0; i < n; ++i) {
    int d = digits[i][w];
    if (d == 0) continue;
    std::size_t idx = (std::size_t)(d > 0 ? d : -d) - 1;
    Pt addend = points[i];
    if (d < 0) pt_neg(addend, points[i]);
    if (!used[idx]) {
      buckets[idx] = addend;
      used[idx] = true;
    } else {
      Pt t;
      pt_add(t, buckets[idx], addend);
      buckets[idx] = t;
    }
  }
  Pt m, g;
  pt_identity(m);
  pt_identity(g);
  for (std::size_t b = nb; b-- > 0;) {
    if (used[b]) {
      Pt t;
      pt_add(t, m, buckets[b]);
      m = t;
    }
    Pt t;
    pt_add(t, g, m);
    g = t;
  }
  g_out = g;
}

static void msm_pippenger_parallel(Pt &out, const Pt *points,
                                   const u64 *scalars, std::size_t n, int c,
                                   int nthreads) {
  const int num_windows = (256 + c - 1) / c;
  std::vector<std::vector<int>> digits(n);
  decompose_digits(digits, scalars, n, c);
  std::vector<Pt> window_sums(num_windows);
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int w = next.fetch_add(1);
      if (w >= num_windows) break;
      window_bucket_sum(window_sums[w], points, digits, n, c, w);
    }
  };
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads && t < num_windows; ++t) threads.emplace_back(worker);
  for (auto &t : threads) t.join();
  horner_windows(out, window_sums, c);
}

static void pt_write_affine(u64 *out, const Pt &r) {
  // Affine: x/z, y/z with z^(p-2) (Fermat).
  u64 e[4];
  std::memcpy(e, P_LIMBS, sizeof e);
  if (e[0] >= 2) {
    e[0] -= 2;
  } else {
    u64 two[4] = {2, 0, 0, 0};
    sub256(e, P_LIMBS, two);
  }
  Fp zinv = FP_ONE_MONT;
  Fp base = r.z;
  for (int limb = 0; limb < 4; ++limb) {
    for (int b = 0; b < 64; ++b) {
      if ((e[limb] >> b) & 1) {
        Fp t;
        fp_mul(t, zinv, base);
        zinv = t;
      }
      Fp t2;
      fp_mul(t2, base, base);
      base = t2;
    }
  }
  Fp ax, ay;
  fp_mul(ax, r.x, zinv);
  fp_mul(ay, r.y, zinv);
  fp_to_raw(out, ax);
  fp_to_raw(out + 4, ay);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI.  All bigints cross the boundary as 4x64-bit LE raw (non-Montgomery)
// limbs.
// ---------------------------------------------------------------------------

extern "C" {

// points: n * 2 * 4 u64 (affine x, y); scalars: n * 4 u64.
// out: 2 * 4 u64 (affine x, y of the MSM result).
void oracle_msm(const u64 *points, const u64 *scalars, std::size_t n, int c,
                u64 *out) {
  std::vector<Pt> pts(n);
  for (std::size_t i = 0; i < n; ++i) {
    fp_from_raw(pts[i].x, points + i * 8);
    fp_from_raw(pts[i].y, points + i * 8 + 4);
    fp_mul(pts[i].t, pts[i].x, pts[i].y);
    pts[i].z = FP_ONE_MONT;
  }
  Pt r;
  msm_pippenger(r, pts.data(), scalars, n, c);
  pt_write_affine(out, r);
}

// Parallel variant of oracle_msm: one thread per scalar window.
void oracle_msm_parallel(const u64 *points, const u64 *scalars, std::size_t n,
                         int c, int nthreads, u64 *out) {
  std::vector<Pt> pts(n);
  for (std::size_t i = 0; i < n; ++i) {
    fp_from_raw(pts[i].x, points + i * 8);
    fp_from_raw(pts[i].y, points + i * 8 + 4);
    fp_mul(pts[i].t, pts[i].x, pts[i].y);
    pts[i].z = FP_ONE_MONT;
  }
  Pt r;
  msm_pippenger_parallel(r, pts.data(), scalars, n, c, nthreads);
  pt_write_affine(out, r);
}

// Deterministic fixture generation: an additive walk P_i = S + i*D from two
// seed-derived multiples of the generator, normalized to affine with one
// batched (Montgomery-trick) inversion.  Role parity with the reference's
// fixture generator (reference: src/ui/AllBenchmarks.tsx:103-139 random-input
// path + test-data saver), fast enough for n = 2^20.
// out: n * 2 * 4 u64 affine (x, y).
void oracle_gen_points(std::size_t n, u64 seed, u64 *out) {
  // Generator of the prime-order subgroup (params.py GENERATOR_X/Y).
  static const u64 GX[4] = {0x137e82844bbe49c5ULL, 0xe7608833a9dd83f3ULL,
                            0x16b294b80d905006ULL, 0x036824eb02475007ULL};
  static const u64 GY[4] = {0xd50dce7d8bcda9d4ULL, 0x7f6758f4c08bc255ULL,
                            0x37c0a81e810abce5ULL, 0x11b1d8d5c1d897a3ULL};
  Pt g;
  fp_from_raw(g.x, GX);
  fp_from_raw(g.y, GY);
  fp_mul(g.t, g.x, g.y);
  g.z = FP_ONE_MONT;

  u64 k1[4] = {seed * 6364136223846793005ULL + 1442695040888963407ULL, seed ^ 0x9e3779b97f4a7c15ULL,
               seed + 0x2545f4914f6cdd1dULL, 0};
  u64 k2[4] = {seed * 2862933555777941757ULL + 3037000493ULL, ~seed, seed ^ 0xdeadbeefcafebabeULL, 0};
  Pt start, delta;
  pt_scalar_mul(start, g, k1);
  pt_scalar_mul(delta, g, k2);

  std::vector<Pt> pts(n);
  Pt cur = start;
  for (std::size_t i = 0; i < n; ++i) {
    pts[i] = cur;
    Pt t;
    pt_add(t, cur, delta);
    cur = t;
  }
  // Batch inversion of all z's.
  std::vector<Fp> prefix(n);
  Fp acc = FP_ONE_MONT;
  for (std::size_t i = 0; i < n; ++i) {
    prefix[i] = acc;
    Fp t;
    fp_mul(t, acc, pts[i].z);
    acc = t;
  }
  // acc^-1 via Fermat.
  u64 e[4];
  u64 two[4] = {2, 0, 0, 0};
  sub256(e, P_LIMBS, two);
  Fp inv = FP_ONE_MONT, base = acc;
  for (int limb = 0; limb < 4; ++limb)
    for (int b = 0; b < 64; ++b) {
      if ((e[limb] >> b) & 1) {
        Fp t;
        fp_mul(t, inv, base);
        inv = t;
      }
      Fp t2;
      fp_mul(t2, base, base);
      base = t2;
    }
  for (std::size_t i = n; i-- > 0;) {
    Fp zinv;
    fp_mul(zinv, inv, prefix[i]);
    Fp t;
    fp_mul(t, inv, pts[i].z);
    inv = t;
    Fp ax, ay;
    fp_mul(ax, pts[i].x, zinv);
    fp_mul(ay, pts[i].y, zinv);
    fp_to_raw(out + i * 8, ax);
    fp_to_raw(out + i * 8 + 4, ay);
  }
}

// Field self-test helpers (for binding-level unit tests).
void oracle_fp_mul(const u64 *a, const u64 *b, u64 *out) {
  Fp fa, fb, fr;
  fp_from_raw(fa, a);
  fp_from_raw(fb, b);
  fp_mul(fr, fa, fb);
  fp_to_raw(out, fr);
}

void oracle_point_add(const u64 *p1, const u64 *p2, u64 *out) {
  Pt a, b, r;
  fp_from_raw(a.x, p1);
  fp_from_raw(a.y, p1 + 4);
  fp_mul(a.t, a.x, a.y);
  a.z = FP_ONE_MONT;
  fp_from_raw(b.x, p2);
  fp_from_raw(b.y, p2 + 4);
  fp_mul(b.t, b.x, b.y);
  b.z = FP_ONE_MONT;
  pt_add(r, a, b);
  u64 e[4];
  u64 two[4] = {2, 0, 0, 0};
  sub256(e, P_LIMBS, two);
  Fp zinv = FP_ONE_MONT, base = r.z;
  for (int limb = 0; limb < 4; ++limb)
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[limb] >> bit) & 1) {
        Fp t;
        fp_mul(t, zinv, base);
        zinv = t;
      }
      Fp t2;
      fp_mul(t2, base, base);
      base = t2;
    }
  Fp ax, ay;
  fp_mul(ax, r.x, zinv);
  fp_mul(ay, r.y, zinv);
  fp_to_raw(out, ax);
  fp_to_raw(out + 4, ay);
}

}  // extern "C"
