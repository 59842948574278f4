// Independent C++ statevector oracle (double precision).
//
// Role: the cross-simulator correctness oracle for the JAX/TPU engine --
// the reference library validated against cirq.Simulator (reference
// tests/inference/qnn_test.py:183-264); this plays that part without a cirq
// dependency.  It is an INDEPENDENT implementation: gate matrices are built
// here from the (kind, angle) description using cirq's conventions, not
// imported from the Python engine, so agreement is meaningful.
//
// Build: g++ -O2 -shared -fPIC -o libqsim_oracle.so qsim_oracle.cc
// (done on demand by qhbmlib_tpu/ops/native_oracle.py).

#include <complex>
#include <cmath>
#include <cstdint>
#include <vector>

using cplx = std::complex<double>;

namespace {

constexpr int KIND_XP = 0, KIND_YP = 1, KIND_ZP = 2, KIND_HP = 3;
constexpr int KIND_RX = 4, KIND_RY = 5, KIND_RZ = 6;
constexpr int KIND_CZP = 7, KIND_CXP = 8;
constexpr int KIND_XXP = 9, KIND_YYP = 10, KIND_ZZP = 11;
constexpr int KIND_PROT = 12, KIND_GPHASE = 13;

const cplx I(0.0, 1.0);

// cirq-convention involution power: G**t = e^{i pi t/2} e^{-i pi t/2 G}
// for involution G, expressed per 2x2/4x4 matrix below.
void one_qubit_power(double t, const cplx g[4], cplx out[4]) {
  double phi = M_PI * t;
  cplx phase = std::exp(I * (phi / 2.0));
  cplx c = std::cos(phi / 2.0), s = std::sin(phi / 2.0);
  for (int k = 0; k < 4; ++k) {
    cplx eye = (k == 0 || k == 3) ? 1.0 : 0.0;
    out[k] = phase * (c * eye - I * s * g[k]);
  }
}

void one_qubit_rot(double theta, char axis, cplx out[4]) {
  cplx c = std::cos(theta / 2.0), s = std::sin(theta / 2.0);
  switch (axis) {
    case 'x':
      out[0] = c; out[1] = -I * s; out[2] = -I * s; out[3] = c;
      break;
    case 'y':
      out[0] = c; out[1] = -s; out[2] = s; out[3] = c;
      break;
    default:  // z
      out[0] = std::exp(-I * (theta / 2.0)); out[1] = 0.0;
      out[2] = 0.0; out[3] = std::exp(I * (theta / 2.0));
  }
}

void two_qubit_power(double t, const cplx g[16], cplx out[16]) {
  double phi = M_PI * t;
  cplx phase = std::exp(I * (phi / 2.0));
  cplx c = std::cos(phi / 2.0), s = std::sin(phi / 2.0);
  for (int k = 0; k < 16; ++k) {
    cplx eye = (k % 5 == 0) ? 1.0 : 0.0;  // k = 0,5,10,15 diagonal
    out[k] = phase * (c * eye - I * s * g[k]);
  }
}

void gate_matrix_1q(int kind, double angle, cplx out[4]) {
  const cplx X[4] = {0, 1, 1, 0};
  const cplx Y[4] = {0, -I, I, 0};
  const double r = 1.0 / std::sqrt(2.0);
  const cplx H[4] = {r, r, r, -r};
  switch (kind) {
    case KIND_XP: one_qubit_power(angle, X, out); break;
    case KIND_YP: one_qubit_power(angle, Y, out); break;
    case KIND_ZP:
      out[0] = 1.0; out[1] = 0.0; out[2] = 0.0;
      out[3] = std::exp(I * (M_PI * angle));
      break;
    case KIND_HP: one_qubit_power(angle, H, out); break;
    case KIND_RX: one_qubit_rot(angle, 'x', out); break;
    case KIND_RY: one_qubit_rot(angle, 'y', out); break;
    case KIND_RZ: one_qubit_rot(angle, 'z', out); break;
  }
}

void gate_matrix_2q(int kind, double angle, cplx out[16]) {
  for (int k = 0; k < 16; ++k) out[k] = 0.0;
  if (kind == KIND_CZP) {
    out[0] = out[5] = out[10] = 1.0;
    out[15] = std::exp(I * (M_PI * angle));
    return;
  }
  if (kind == KIND_CXP) {
    out[0] = out[5] = 1.0;
    cplx sub[4];
    const cplx X[4] = {0, 1, 1, 0};
    one_qubit_power(angle, X, sub);
    out[10] = sub[0]; out[11] = sub[1]; out[14] = sub[2]; out[15] = sub[3];
    return;
  }
  // XX, YY, ZZ powers: kron of the Pauli with itself.
  cplx p[4];
  if (kind == KIND_XXP) { p[0] = 0; p[1] = 1; p[2] = 1; p[3] = 0; }
  else if (kind == KIND_YYP) { p[0] = 0; p[1] = -I; p[2] = I; p[3] = 0; }
  else { p[0] = 1; p[1] = 0; p[2] = 0; p[3] = -1; }
  cplx g[16];
  for (int a = 0; a < 2; ++a)
    for (int b = 0; b < 2; ++b)
      for (int x = 0; x < 2; ++x)
        for (int y = 0; y < 2; ++y)
          g[(a * 2 + b) * 4 + (x * 2 + y)] = p[a * 2 + x] * p[b * 2 + y];
  two_qubit_power(angle, g, out);
}

// Applies a 1-qubit matrix on qubit q (q = 0 is the MSB of the basis index).
void apply_1q(std::vector<cplx>& psi, int n, int q, const cplx m[4]) {
  int64_t mask = int64_t(1) << (n - 1 - q);
  int64_t dim = int64_t(1) << n;
  for (int64_t x = 0; x < dim; ++x) {
    if (x & mask) continue;
    cplx a0 = psi[x], a1 = psi[x | mask];
    psi[x] = m[0] * a0 + m[1] * a1;
    psi[x | mask] = m[2] * a0 + m[3] * a1;
  }
}

void apply_2q(std::vector<cplx>& psi, int n, int q0, int q1,
              const cplx m[16]) {
  int64_t m0 = int64_t(1) << (n - 1 - q0);
  int64_t m1 = int64_t(1) << (n - 1 - q1);
  int64_t dim = int64_t(1) << n;
  for (int64_t x = 0; x < dim; ++x) {
    if ((x & m0) || (x & m1)) continue;
    int64_t i00 = x, i01 = x | m1, i10 = x | m0, i11 = x | m0 | m1;
    cplx a[4] = {psi[i00], psi[i01], psi[i10], psi[i11]};
    cplx out[4];
    for (int row = 0; row < 4; ++row) {
      out[row] = 0.0;
      for (int col = 0; col < 4; ++col) out[row] += m[row * 4 + col] * a[col];
    }
    psi[i00] = out[0]; psi[i01] = out[1]; psi[i10] = out[2]; psi[i11] = out[3];
  }
}

// exp(-i * angle * P) for Pauli string P (codes: 1=X, 2=Y, 3=Z per qubit).
void apply_prot(std::vector<cplx>& psi, int n, int len, const int* qubits,
                const int* codes, double angle) {
  int64_t dim = int64_t(1) << n;
  std::vector<cplx> p_psi(dim);
  for (int64_t x = 0; x < dim; ++x) {
    int64_t y = x;
    cplx phase = 1.0;
    for (int k = 0; k < len; ++k) {
      int64_t bit = int64_t(1) << (n - 1 - qubits[k]);
      int b = (x & bit) ? 1 : 0;
      switch (codes[k]) {
        case 1: y ^= bit; break;                          // X
        case 2: y ^= bit; phase *= b ? -I : I; break;      // Y (phase on input)
        case 3: phase *= b ? -1.0 : 1.0; break;            // Z
      }
    }
    // P|psi>: amplitude at y receives phase * psi[x]
    p_psi[y] += phase * psi[x];
  }
  cplx c = std::cos(angle), s = std::sin(angle);
  for (int64_t x = 0; x < dim; ++x) psi[x] = c * psi[x] - I * s * p_psi[x];
}

}  // namespace

extern "C" {

// Simulates a gate sequence from a basis state.  Gate g uses kinds[g],
// qubits (q0[g], q1[g] with -1 = unused), angle angles[g].  PROT gates take
// prot_offsets[g]..prot_offsets[g+1] entries of (prot_qubits, prot_codes).
// Outputs the final statevector into out_re/out_im (length 2^n).
int simulate_circuit(int num_qubits, int num_gates, const int* kinds,
                     const int* q0, const int* q1, const double* angles,
                     const int* prot_offsets, const int* prot_qubits,
                     const int* prot_codes, int64_t init_basis_index,
                     double* out_re, double* out_im) {
  if (num_qubits < 1 || num_qubits > 30) return 1;
  int64_t dim = int64_t(1) << num_qubits;
  std::vector<cplx> psi(dim, 0.0);
  psi[init_basis_index] = 1.0;
  for (int g = 0; g < num_gates; ++g) {
    int kind = kinds[g];
    double angle = angles[g];
    if (kind == KIND_GPHASE) {
      cplx ph = std::exp(I * angle);
      for (int64_t x = 0; x < dim; ++x) psi[x] *= ph;
    } else if (kind == KIND_PROT) {
      int start = prot_offsets[g], end = prot_offsets[g + 1];
      apply_prot(psi, num_qubits, end - start, prot_qubits + start,
                 prot_codes + start, angle);
    } else if (kind >= KIND_CZP && kind <= KIND_ZZP) {
      cplx m[16];
      gate_matrix_2q(kind, angle, m);
      apply_2q(psi, num_qubits, q0[g], q1[g], m);
    } else {
      cplx m[4];
      gate_matrix_1q(kind, angle, m);
      apply_1q(psi, num_qubits, q0[g], m);
    }
  }
  for (int64_t x = 0; x < dim; ++x) {
    out_re[x] = psi[x].real();
    out_im[x] = psi[x].imag();
  }
  return 0;
}

}  // extern "C"
