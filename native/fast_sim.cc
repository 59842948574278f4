// Optimized single-core CPU statevector simulator: the INDEPENDENT
// performance anchor for bench.py (BASELINE.md asks for ">=10x qsim-CPU";
// the reference publishes no numbers, so this plays qsim-CPU's part).
//
// Unlike native/qsim_oracle.cc (the scalar double-precision CORRECTNESS
// oracle), this file is written for throughput: float32 planar (re/im)
// state arrays, branchless strided loops that g++ -O3 -march=native
// auto-vectorizes to AVX-512, diagonal-gate fast paths (ZP touches half
// the state, CZP a quarter), and a fused per-gate adjoint sweep.  It
// implements the dominant work of one VQT train step at the bench
// workload: for each unique sampled bitstring, forward-simulate the
// ansatz, apply the TFIM PauliSum once (lambda = H|psi>), take the
// energy, and run the reverse adjoint sweep producing d<H>/d(angle) for
// every parameterized gate -- the same forward+adjoint step the JAX/TPU
// engine executes (qhbmlib_tpu/ops/adjoint.py).  Classical EBM/optimizer
// arithmetic (Bernoulli logits, eq. A5 weights, Adam) is O(n) per step
// and omitted as negligible at 24 qubits.
//
// Gate conventions are derived here from (kind, angle) exactly as in
// qsim_oracle.cc (cirq involution-power and rotation conventions), so
// cross-validation against the JAX engine is meaningful.
//
// Build: g++ -O3 -march=native -funroll-loops -shared -fPIC \
//            -o libfast_sim.so fast_sim.cc
// (done on demand by qhbmlib_tpu/ops/native_fast.py).

#include <cmath>
#include <complex>
#include <cstdint>
#include <vector>

namespace {

constexpr int KIND_XP = 0, KIND_YP = 1, KIND_ZP = 2;
constexpr int KIND_RX = 4, KIND_RY = 5, KIND_RZ = 6;
constexpr int KIND_CZP = 7;

using cplxd = std::complex<double>;
const cplxd Id(0.0, 1.0);

struct Mat2 {
  // Planar 2x2 complex matrix entries.
  float r00, i00, r01, i01, r10, i10, r11, i11;
};

// cirq involution power G**t = e^{i pi t/2}(cos(pi t/2) I - i sin(pi t/2) G)
// for G in {X, Y}; rotations follow the standard exp(-i theta G / 2).
Mat2 gate_matrix(int kind, double t) {
  cplxd m00, m01, m10, m11;
  if (kind == KIND_XP || kind == KIND_YP) {
    double phi = M_PI * t;
    cplxd ph = std::exp(Id * (phi / 2.0));
    cplxd c = std::cos(phi / 2.0), s = std::sin(phi / 2.0);
    m00 = m11 = ph * c;
    if (kind == KIND_XP) {
      m01 = m10 = ph * (-Id * s);
    } else {
      m01 = ph * (-s);  // -i*s*(-i) = -s
      m10 = ph * (+s);
    }
  } else if (kind == KIND_RX || kind == KIND_RY) {
    double c = std::cos(t / 2.0), s = std::sin(t / 2.0);
    m00 = m11 = c;
    if (kind == KIND_RX) {
      m01 = m10 = -Id * s;
    } else {
      m01 = -s;
      m10 = s;
    }
  } else {
    m00 = m01 = m10 = m11 = 0.0;  // diagonal kinds never come here
  }
  Mat2 m;
  m.r00 = (float)m00.real(); m.i00 = (float)m00.imag();
  m.r01 = (float)m01.real(); m.i01 = (float)m01.imag();
  m.r10 = (float)m10.real(); m.i10 = (float)m10.imag();
  m.r11 = (float)m11.real(); m.i11 = (float)m11.imag();
  return m;
}

// Applies a dense 2x2 on qubit q (q = 0 is MSB) to planar state (re, im).
// The pair loop is structured as (block, offset) so the inner loop is a
// contiguous run of `mask` elements -- unit-stride for the vectorizer
// whenever mask >= the vector width.
void apply_2x2(float* __restrict re, float* __restrict im, int n, int q,
               const Mat2& m) {
  const int64_t mask = int64_t(1) << (n - 1 - q);
  const int64_t dim = int64_t(1) << n;
  for (int64_t base = 0; base < dim; base += 2 * mask) {
    float* r0 = re + base;
    float* i0 = im + base;
    float* r1 = re + base + mask;
    float* i1 = im + base + mask;
    for (int64_t k = 0; k < mask; ++k) {
      float a0r = r0[k], a0i = i0[k], a1r = r1[k], a1i = i1[k];
      r0[k] = m.r00 * a0r - m.i00 * a0i + m.r01 * a1r - m.i01 * a1i;
      i0[k] = m.r00 * a0i + m.i00 * a0r + m.r01 * a1i + m.i01 * a1r;
      r1[k] = m.r10 * a0r - m.i10 * a0i + m.r11 * a1r - m.i11 * a1i;
      i1[k] = m.r10 * a0i + m.i10 * a0r + m.r11 * a1i + m.i11 * a1r;
    }
  }
}

// ZP(t) = diag(1, e^{i pi t}) on qubit q: scales only the bit-set half.
void apply_zp(float* __restrict re, float* __restrict im, int n, int q,
              double t) {
  const float c = (float)std::cos(M_PI * t), s = (float)std::sin(M_PI * t);
  const int64_t mask = int64_t(1) << (n - 1 - q);
  const int64_t dim = int64_t(1) << n;
  for (int64_t base = mask; base < dim; base += 2 * mask) {
    float* r = re + base;
    float* i = im + base;
    for (int64_t k = 0; k < mask; ++k) {
      float ar = r[k], ai = i[k];
      r[k] = c * ar - s * ai;
      i[k] = s * ar + c * ai;
    }
  }
}

// RZ(t) = diag(e^{-i t/2}, e^{i t/2}): two half-state scales.
void apply_rz(float* __restrict re, float* __restrict im, int n, int q,
              double t) {
  const int64_t mask = int64_t(1) << (n - 1 - q);
  const int64_t dim = int64_t(1) << n;
  const float c = (float)std::cos(t / 2.0);
  for (int half = 0; half < 2; ++half) {
    const float s = (float)((half ? 1.0 : -1.0) * std::sin(t / 2.0));
    for (int64_t base = half ? mask : 0; base < dim; base += 2 * mask) {
      float* r = re + base;
      float* i = im + base;
      for (int64_t k = 0; k < mask; ++k) {
        float ar = r[k], ai = i[k];
        r[k] = c * ar - s * ai;
        i[k] = s * ar + c * ai;
      }
    }
  }
}

// CZP(t) = diag(1,1,1,e^{i pi t}): scales the |11> quarter.  Iterates the
// 11-subspace as nested (outer-block, inner-run) with the LOWER qubit's
// mask as the contiguous run length.
void apply_czp(float* __restrict re, float* __restrict im, int n, int qa,
               int qb, double t) {
  const float c = (float)std::cos(M_PI * t), s = (float)std::sin(M_PI * t);
  int64_t ma = int64_t(1) << (n - 1 - qa);
  int64_t mb = int64_t(1) << (n - 1 - qb);
  if (ma < mb) { int64_t tmp = ma; ma = mb; mb = tmp; }  // ma = larger stride
  const int64_t dim = int64_t(1) << n;
  for (int64_t hi = ma; hi < dim; hi += 2 * ma) {
    for (int64_t mid = mb; mid < ma; mid += 2 * mb) {
      float* r = re + hi + mid;
      float* i = im + hi + mid;
      for (int64_t k = 0; k < mb; ++k) {
        float ar = r[k], ai = i[k];
        r[k] = c * ar - s * ai;
        i[k] = s * ar + c * ai;
      }
    }
  }
}

void apply_gate(float* re, float* im, int n, int kind, int qa, int qb,
                double t) {
  switch (kind) {
    case KIND_ZP: apply_zp(re, im, n, qa, t); break;
    case KIND_RZ: apply_rz(re, im, n, qa, t); break;
    case KIND_CZP: apply_czp(re, im, n, qa, qb, t); break;
    default: apply_2x2(re, im, n, qa, gate_matrix(kind, t));
  }
}

// <lam|psi> restricted to the bit-set half of qubit q (double accumulate).
cplxd dot_half(const float* lre, const float* lim, const float* pre,
               const float* pim, int n, int q) {
  const int64_t mask = int64_t(1) << (n - 1 - q);
  const int64_t dim = int64_t(1) << n;
  double ar = 0.0, ai = 0.0;
  for (int64_t base = mask; base < dim; base += 2 * mask) {
    const float* lr = lre + base;
    const float* li = lim + base;
    const float* pr = pre + base;
    const float* pi = pim + base;
    double br = 0.0, bi = 0.0;
    for (int64_t k = 0; k < mask; ++k) {
      br += (double)lr[k] * pr[k] + (double)li[k] * pi[k];
      bi += (double)lr[k] * pi[k] - (double)li[k] * pr[k];
    }
    ar += br;
    ai += bi;
  }
  return cplxd(ar, ai);
}

// <lam|psi> over the |11> quarter of (qa, qb).
cplxd dot_quarter(const float* lre, const float* lim, const float* pre,
                  const float* pim, int n, int qa, int qb) {
  int64_t ma = int64_t(1) << (n - 1 - qa);
  int64_t mb = int64_t(1) << (n - 1 - qb);
  if (ma < mb) { int64_t tmp = ma; ma = mb; mb = tmp; }
  const int64_t dim = int64_t(1) << n;
  double ar = 0.0, ai = 0.0;
  for (int64_t hi = ma; hi < dim; hi += 2 * ma) {
    for (int64_t mid = mb; mid < ma; mid += 2 * mb) {
      const int64_t base = hi + mid;
      double br = 0.0, bi = 0.0;
      for (int64_t k = 0; k < mb; ++k) {
        br += (double)lre[base + k] * pre[base + k] +
              (double)lim[base + k] * pim[base + k];
        bi += (double)lre[base + k] * pim[base + k] -
              (double)lim[base + k] * pre[base + k];
      }
      ar += br;
      ai += bi;
    }
  }
  return cplxd(ar, ai);
}

// <lam|psi> and <lam|G|psi> for G in {X, Y} on qubit q, in ONE pass.
void dot_full_and_g(const float* lre, const float* lim, const float* pre,
                    const float* pim, int n, int q, bool is_y, cplxd* d_full,
                    cplxd* d_g) {
  const int64_t mask = int64_t(1) << (n - 1 - q);
  const int64_t dim = int64_t(1) << n;
  double fr = 0.0, fi = 0.0, gr = 0.0, gi = 0.0;
  for (int64_t base = 0; base < dim; base += 2 * mask) {
    const float* lr0 = lre + base;
    const float* li0 = lim + base;
    const float* lr1 = lre + base + mask;
    const float* li1 = lim + base + mask;
    const float* pr0 = pre + base;
    const float* pi0 = pim + base;
    const float* pr1 = pre + base + mask;
    const float* pi1 = pim + base + mask;
    double bfr = 0.0, bfi = 0.0, bgr = 0.0, bgi = 0.0;
    for (int64_t k = 0; k < mask; ++k) {
      // full: conj(l0)p0 + conj(l1)p1
      bfr += (double)lr0[k] * pr0[k] + (double)li0[k] * pi0[k] +
             (double)lr1[k] * pr1[k] + (double)li1[k] * pi1[k];
      bfi += (double)lr0[k] * pi0[k] - (double)li0[k] * pr0[k] +
             (double)lr1[k] * pi1[k] - (double)li1[k] * pr1[k];
      if (!is_y) {
        // X|psi> swaps halves: conj(l0)p1 + conj(l1)p0
        bgr += (double)lr0[k] * pr1[k] + (double)li0[k] * pi1[k] +
               (double)lr1[k] * pr0[k] + (double)li1[k] * pi0[k];
        bgi += (double)lr0[k] * pi1[k] - (double)li0[k] * pr1[k] +
               (double)lr1[k] * pi0[k] - (double)li1[k] * pr0[k];
      } else {
        // Y|psi>: component0 = -i p1, component1 = +i p0.
        // conj(l0)(-i p1): re = l0r*p1i - l0i*p1r... computed as -i*(l0* p1)
        double ar = (double)lr0[k] * pr1[k] + (double)li0[k] * pi1[k];
        double ai = (double)lr0[k] * pi1[k] - (double)li0[k] * pr1[k];
        bgr += ai;   // -i*(ar + i ai) = ai - i ar
        bgi += -ar;
        double cr = (double)lr1[k] * pr0[k] + (double)li1[k] * pi0[k];
        double ci = (double)lr1[k] * pi0[k] - (double)li1[k] * pr0[k];
        bgr += -ci;  // +i*(cr + i ci) = -ci + i cr
        bgi += cr;
      }
    }
    fr += bfr; fi += bfi; gr += bgr; gi += bgi;
  }
  *d_full = cplxd(fr, fi);
  *d_g = cplxd(gr, gi);
}

// lam = H|psi> for H = sum_t zz_c[t] Z_a Z_b + sum_t x_c[t] X_q.
// Diagonal (ZZ) part: one pass with an inline two-bit-parity sign per
// term; X part: one shifted-add pass per term (block-contiguous).
void apply_hamiltonian(const float* __restrict pre, const float* __restrict pim,
                       float* __restrict lre, float* __restrict lim, int n,
                       int num_zz, const int* zz_a, const int* zz_b,
                       const double* zz_c, int num_x, const int* x_q,
                       const double* x_c) {
  const int64_t dim = int64_t(1) << n;
  // Diagonal pass.  diag(x) = sum_t c_t * (+-1); sign = parity of the two
  // term bits.  Shifts/masks are hoisted into small arrays.
  std::vector<int64_t> tmask(num_zz);
  std::vector<float> tcoef(num_zz);
  for (int t = 0; t < num_zz; ++t) {
    tmask[t] = (int64_t(1) << (n - 1 - zz_a[t])) |
               (int64_t(1) << (n - 1 - zz_b[t]));
    tcoef[t] = (float)zz_c[t];
  }
  for (int64_t x = 0; x < dim; ++x) {
    float d = 0.0f;
    for (int t = 0; t < num_zz; ++t) {
      // parity of the two selected bits: 0 -> +c, 1 -> -c
      int par = (int)__builtin_popcountll(x & tmask[t]) & 1;
      d += par ? -tcoef[t] : tcoef[t];
    }
    lre[x] = d * pre[x];
    lim[x] = d * pim[x];
  }
  // X terms: lam[x] += c * psi[x ^ mask].
  for (int t = 0; t < num_x; ++t) {
    const int64_t mask = int64_t(1) << (n - 1 - x_q[t]);
    const float c = (float)x_c[t];
    for (int64_t base = 0; base < dim; base += 2 * mask) {
      float* lr0 = lre + base;
      float* li0 = lim + base;
      float* lr1 = lre + base + mask;
      float* li1 = lim + base + mask;
      const float* pr0 = pre + base;
      const float* pi0 = pim + base;
      const float* pr1 = pre + base + mask;
      const float* pi1 = pim + base + mask;
      for (int64_t k = 0; k < mask; ++k) {
        lr0[k] += c * pr1[k];
        li0[k] += c * pi1[k];
        lr1[k] += c * pr0[k];
        li1[k] += c * pi0[k];
      }
    }
  }
}

cplxd dot_full(const float* lre, const float* lim, const float* pre,
               const float* pim, int64_t dim) {
  double ar = 0.0, ai = 0.0;
  for (int64_t k = 0; k < dim; ++k) {
    ar += (double)lre[k] * pre[k] + (double)lim[k] * pim[k];
    ai += (double)lre[k] * pim[k] - (double)lim[k] * pre[k];
  }
  return cplxd(ar, ai);
}

}  // namespace

extern "C" {

// One full VQT quantum step: for each of `batch` initial basis states,
// forward-simulate the gate list, compute E = <psi|H|psi> and the adjoint
// gradient dE/d(angle_g) for every gate.  Returns 0 on success.
//
// energy_out: [batch]; grads_out: [batch * num_gates] (row-major).
// Gate angles are the RESOLVED per-gate angles (the caller applies the
// symbol chain rule; for the bench ansatz every gate has its own symbol
// with coefficient 1).
int vqt_adjoint_step(int num_qubits, int num_gates, const int* kinds,
                     const int* q0, const int* q1, const double* angles,
                     int num_zz, const int* zz_a, const int* zz_b,
                     const double* zz_c, int num_x, const int* x_q,
                     const double* x_c, int batch,
                     const int64_t* init_indices, double* energy_out,
                     double* grads_out) {
  if (num_qubits < 1 || num_qubits > 30) return 1;
  const int n = num_qubits;
  const int64_t dim = int64_t(1) << n;
  std::vector<float> pre(dim), pim(dim), lre(dim), lim(dim);

  for (int b = 0; b < batch; ++b) {
    // |b> init + forward sweep.
    std::fill(pre.begin(), pre.end(), 0.0f);
    std::fill(pim.begin(), pim.end(), 0.0f);
    if (init_indices[b] < 0 || init_indices[b] >= dim) return 2;
    pre[init_indices[b]] = 1.0f;
    for (int g = 0; g < num_gates; ++g) {
      apply_gate(pre.data(), pim.data(), n, kinds[g], q0[g], q1[g],
                 angles[g]);
    }
    // lambda = H|psi>, E = Re<psi|lam>.
    apply_hamiltonian(pre.data(), pim.data(), lre.data(), lim.data(), n,
                      num_zz, zz_a, zz_b, zz_c, num_x, x_q, x_c);
    energy_out[b] =
        dot_full(pre.data(), pim.data(), lre.data(), lim.data(), dim).real();

    // Reverse adjoint sweep.  Loop invariant: psi = state AFTER gate g,
    // lam = (later gates)^dag H psi_final.  Gradient per gate from the
    // derivative forms of each kind, then un-apply g from both states.
    double* grow = grads_out + int64_t(b) * num_gates;
    for (int g = num_gates - 1; g >= 0; --g) {
      const int kind = kinds[g];
      const double t = angles[g];
      double grad;
      if (kind == KIND_ZP) {
        // dU = diag(0, i pi e^{i pi t}): grad = 2Re(i pi S) = -2 pi Im S,
        // S = sum_{bit set} conj(lam) psi_after.
        cplxd s = dot_half(lre.data(), lim.data(), pre.data(), pim.data(),
                           n, q0[g]);
        grad = -2.0 * M_PI * s.imag();
      } else if (kind == KIND_CZP) {
        cplxd s = dot_quarter(lre.data(), lim.data(), pre.data(), pim.data(),
                              n, q0[g], q1[g]);
        grad = -2.0 * M_PI * s.imag();
      } else if (kind == KIND_XP || kind == KIND_YP) {
        // dU/dt = i pi/2 (I - G) U: grad = -pi Im(<lam|psi> - <lam|G|psi>).
        cplxd df, dg;
        dot_full_and_g(lre.data(), lim.data(), pre.data(), pim.data(), n,
                       q0[g], kind == KIND_YP, &df, &dg);
        grad = -M_PI * (df.imag() - dg.imag());
      } else if (kind == KIND_RZ) {
        // dU/dt = -i/2 Z U: grad = 2Re(-i/2 <lam|Z|psi>) = +Im<lam|Z|psi>
        // <lam|Z|psi> = <lam|psi> - 2*<lam|psi>_half.
        cplxd df = dot_full(lre.data(), lim.data(), pre.data(), pim.data(),
                            dim);
        cplxd dh = dot_half(lre.data(), lim.data(), pre.data(), pim.data(),
                            n, q0[g]);
        grad = df.imag() - 2.0 * dh.imag();
      } else {  // RX / RY: same -i/2 G U derivative form
        cplxd df, dg;
        dot_full_and_g(lre.data(), lim.data(), pre.data(), pim.data(), n,
                       q0[g], kind == KIND_RY, &df, &dg);
        grad = dg.imag();
      }
      grow[g] = grad;
      // Un-apply: U(t)^{-1} = U(-t) for every supported kind.
      apply_gate(pre.data(), pim.data(), n, kind, q0[g], q1[g], -t);
      apply_gate(lre.data(), lim.data(), n, kind, q0[g], q1[g], -t);
    }
  }
  return 0;
}

}  // extern "C"
