// Native PnP-RANSAC solver (C ABI, loaded via ctypes).
//
// TPU-native-framework replacement for the reference's OpenCV dependency
// (reference: src/misc/cam_utils.py:162-253 uses cv2.solvePnPRansac with
// SQPNP on pointmap/pixel correspondences for the pose-evaluation baseline).
// Implements: DLT minimal solves inside a RANSAC loop (reprojection-error
// inlier test) followed by Gauss-Newton refinement on SE(3) over the inlier
// set. Host-side eval-only code, so plain C++ (no torch/CUDA).
//
// Build: g++ -O3 -shared -fPIC -o libpnp.so pnp.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <random>
#include <vector>

namespace {

struct Mat3 {
  double m[9];
  static Mat3 identity() {
    Mat3 r{};
    r.m[0] = r.m[4] = r.m[8] = 1.0;
    return r;
  }
};

inline void matmul3(const double* a, const double* b, double* out) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[i * 3 + k] * b[k * 3 + j];
      out[i * 3 + j] = s;
    }
}

// Rodrigues: axis-angle -> rotation matrix.
void rodrigues(const double w[3], double R[9]) {
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  if (th < 1e-12) {
    std::memset(R, 0, sizeof(double) * 9);
    R[0] = R[4] = R[8] = 1.0;
    return;
  }
  double k[3] = {w[0] / th, w[1] / th, w[2] / th};
  double c = std::cos(th), s = std::sin(th), v = 1 - c;
  R[0] = c + k[0] * k[0] * v;
  R[1] = k[0] * k[1] * v - k[2] * s;
  R[2] = k[0] * k[2] * v + k[1] * s;
  R[3] = k[1] * k[0] * v + k[2] * s;
  R[4] = c + k[1] * k[1] * v;
  R[5] = k[1] * k[2] * v - k[0] * s;
  R[6] = k[2] * k[0] * v - k[1] * s;
  R[7] = k[2] * k[1] * v + k[0] * s;
  R[8] = c + k[2] * k[2] * v;
}

// Solve a dense least-squares system A x = b (n x 6) via normal equations
// with Cholesky; small fixed size keeps this dependency-free.
bool solve6(const double AtA_in[36], const double Atb[6], double x[6]) {
  double L[36];
  std::memcpy(L, AtA_in, sizeof(L));
  // Cholesky decomposition with diagonal damping.
  for (int i = 0; i < 6; ++i) L[i * 6 + i] += 1e-9;
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = L[i * 6 + j];
      for (int k = 0; k < j; ++k) s -= L[i * 6 + k] * L[j * 6 + k];
      if (i == j) {
        if (s <= 0) return false;
        L[i * 6 + i] = std::sqrt(s);
      } else {
        L[i * 6 + j] = s / L[j * 6 + j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = Atb[i];
    for (int k = 0; k < i; ++k) s -= L[i * 6 + k] * y[k];
    y[i] = s / L[i * 6 + i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= L[k * 6 + i] * x[k];
    x[i] = s / L[i * 6 + i];
  }
  return true;
}

// DLT pose from >= 6 normalized correspondences ((X,Y,Z) -> (u,v) in
// K-normalized camera coords). Produces [R|t] via SVD-free orthogonalization.
bool dlt_pose(const double* pts, const double* uv, const int* idx, int n,
              double R[9], double t[3]) {
  // Build the 2n x 12 system; solve via power iteration on the 12x12
  // normal matrix for the smallest eigenvector (shifted inverse-free:
  // use deflation against dominant directions -- adequate for RANSAC
  // hypotheses that are then refined).
  double N[144] = {0};
  for (int s = 0; s < n; ++s) {
    const double* P = pts + 3 * idx[s];
    const double* q = uv + 2 * idx[s];
    double r1[12] = {P[0], P[1], P[2], 1, 0, 0, 0, 0,
                     -q[0] * P[0], -q[0] * P[1], -q[0] * P[2], -q[0]};
    double r2[12] = {0, 0, 0, 0, P[0], P[1], P[2], 1,
                     -q[1] * P[0], -q[1] * P[1], -q[1] * P[2], -q[1]};
    for (int i = 0; i < 12; ++i)
      for (int j = 0; j < 12; ++j)
        N[i * 12 + j] += r1[i] * r1[j] + r2[i] * r2[j];
  }
  // Smallest eigenvector via inverse iteration substitute: use
  // (N + eps I)^-1 approximated by solving with Gauss elimination.
  double A[144];
  std::memcpy(A, N, sizeof(A));
  double trace = 0;
  for (int i = 0; i < 12; ++i) trace += A[i * 12 + i];
  for (int i = 0; i < 12; ++i) A[i * 12 + i] += 1e-9 * (trace / 12 + 1.0);
  double x[12];
  for (int i = 0; i < 12; ++i) x[i] = 1.0 / std::sqrt(12.0);
  double work[144], rhs[12];
  for (int it = 0; it < 30; ++it) {
    // Solve A y = x (Gauss elimination with partial pivoting).
    std::memcpy(work, A, sizeof(work));
    std::memcpy(rhs, x, sizeof(rhs));
    int piv[12];
    for (int c = 0; c < 12; ++c) {
      int best = c;
      for (int r = c + 1; r < 12; ++r)
        if (std::fabs(work[r * 12 + c]) > std::fabs(work[best * 12 + c]))
          best = r;
      piv[c] = best;
      if (best != c) {
        for (int k = 0; k < 12; ++k) std::swap(work[c * 12 + k], work[best * 12 + k]);
        std::swap(rhs[c], rhs[best]);
      }
      double d = work[c * 12 + c];
      if (std::fabs(d) < 1e-18) return false;
      for (int r = c + 1; r < 12; ++r) {
        double f = work[r * 12 + c] / d;
        for (int k = c; k < 12; ++k) work[r * 12 + k] -= f * work[c * 12 + k];
        rhs[r] -= f * rhs[c];
      }
    }
    double y[12];
    for (int r = 11; r >= 0; --r) {
      double s = rhs[r];
      for (int k = r + 1; k < 12; ++k) s -= work[r * 12 + k] * y[k];
      y[r] = s / work[r * 12 + r];
    }
    double norm = 0;
    for (int i = 0; i < 12; ++i) norm += y[i] * y[i];
    norm = std::sqrt(norm);
    if (norm < 1e-30) return false;
    for (int i = 0; i < 12; ++i) x[i] = y[i] / norm;
  }
  // x now spans the near-null space -> projection matrix P = [R|t] up to scale.
  double P[12];
  std::memcpy(P, x, sizeof(P));
  // Fix sign: points must land in front of the camera (positive depth).
  double zsum = 0;
  for (int s = 0; s < n; ++s) {
    const double* Q = pts + 3 * idx[s];
    zsum += P[8] * Q[0] + P[9] * Q[1] + P[10] * Q[2] + P[11];
  }
  if (zsum < 0)
    for (int i = 0; i < 12; ++i) P[i] = -P[i];
  // Orthogonalize the rotation part (Gram-Schmidt on rows) and recover scale.
  double r0[3] = {P[0], P[1], P[2]};
  double r1[3] = {P[4], P[5], P[6]};
  double n0 = std::sqrt(r0[0] * r0[0] + r0[1] * r0[1] + r0[2] * r0[2]);
  double n1 = std::sqrt(r1[0] * r1[0] + r1[1] * r1[1] + r1[2] * r1[2]);
  double scale = 2.0 / (n0 + n1 + 1e-30);
  for (int i = 0; i < 3; ++i) {
    r0[i] /= n0;
  }
  double dot = r0[0] * r1[0] + r0[1] * r1[1] + r0[2] * r1[2];
  for (int i = 0; i < 3; ++i) r1[i] -= dot * r0[i];
  double n1b = std::sqrt(r1[0] * r1[0] + r1[1] * r1[1] + r1[2] * r1[2]);
  for (int i = 0; i < 3; ++i) r1[i] /= n1b;
  double r2[3] = {r0[1] * r1[2] - r0[2] * r1[1], r0[2] * r1[0] - r0[0] * r1[2],
                  r0[0] * r1[1] - r0[1] * r1[0]};
  R[0] = r0[0]; R[1] = r0[1]; R[2] = r0[2];
  R[3] = r1[0]; R[4] = r1[1]; R[5] = r1[2];
  R[6] = r2[0]; R[7] = r2[1]; R[8] = r2[2];
  t[0] = P[3] * scale;
  t[1] = P[7] * scale;
  t[2] = P[11] * scale;
  return true;
}

int count_inliers(const double* pts, const double* uv, int n, const double R[9],
                  const double t[3], double thresh2, uint8_t* inliers) {
  int count = 0;
  for (int i = 0; i < n; ++i) {
    const double* P = pts + 3 * i;
    double X = R[0] * P[0] + R[1] * P[1] + R[2] * P[2] + t[0];
    double Y = R[3] * P[0] + R[4] * P[1] + R[5] * P[2] + t[1];
    double Z = R[6] * P[0] + R[7] * P[1] + R[8] * P[2] + t[2];
    bool ok = false;
    if (Z > 1e-9) {
      double du = X / Z - uv[2 * i];
      double dv = Y / Z - uv[2 * i + 1];
      ok = (du * du + dv * dv) < thresh2;
    }
    inliers[i] = ok;
    count += ok;
  }
  return count;
}

// Gauss-Newton refinement of (w, t) over the inlier set.
void refine(const double* pts, const double* uv, const uint8_t* inliers, int n,
            double R[9], double t[3], int iters) {
  for (int it = 0; it < iters; ++it) {
    double AtA[36] = {0}, Atb[6] = {0};
    for (int i = 0; i < n; ++i) {
      if (!inliers[i]) continue;
      const double* P = pts + 3 * i;
      double X = R[0] * P[0] + R[1] * P[1] + R[2] * P[2] + t[0];
      double Y = R[3] * P[0] + R[4] * P[1] + R[5] * P[2] + t[1];
      double Z = R[6] * P[0] + R[7] * P[1] + R[8] * P[2] + t[2];
      if (Z <= 1e-9) continue;
      double iz = 1.0 / Z, iz2 = iz * iz;
      double u = X * iz, v = Y * iz;
      double ru = uv[2 * i] - u, rv = uv[2 * i + 1] - v;
      // d(u,v)/d(delta) with left-multiplied se3 delta on the camera frame:
      // dcam = dw x cam + dt
      double Ju[6] = {iz, 0, -X * iz2,
                      -X * Y * iz2, 1 + X * X * iz2, -Y * iz};
      double Jv[6] = {0, iz, -Y * iz2,
                      -(1 + Y * Y * iz2), X * Y * iz2, X * iz};
      for (int a = 0; a < 6; ++a) {
        Atb[a] += Ju[a] * ru + Jv[a] * rv;
        for (int b = 0; b <= a; ++b) AtA[a * 6 + b] += Ju[a] * Ju[b] + Jv[a] * Jv[b];
      }
    }
    for (int a = 0; a < 6; ++a)
      for (int b = a + 1; b < 6; ++b) AtA[a * 6 + b] = AtA[b * 6 + a];
    double d[6];
    if (!solve6(AtA, Atb, d)) return;
    // Update: t += dt ; R = exp(dw) R, with cam = R p + t convention and
    // delta [dt, dw].
    double dR[9];
    double w[3] = {d[3], d[4], d[5]};
    rodrigues(w, dR);
    double Rn[9];
    matmul3(dR, R, Rn);
    double tn[3] = {
        dR[0] * t[0] + dR[1] * t[1] + dR[2] * t[2] + d[0],
        dR[3] * t[0] + dR[4] * t[1] + dR[5] * t[2] + d[1],
        dR[6] * t[0] + dR[7] * t[1] + dR[8] * t[2] + d[2],
    };
    std::memcpy(R, Rn, sizeof(Rn));
    std::memcpy(t, tn, sizeof(tn));
  }
}

}  // namespace

extern "C" {

// pts (n, 3) world points, uv (n, 2) K-NORMALIZED image coords
// ((px - cx)/fx, (py - cy)/fy). Returns 1 on success; fills w2c (4, 4)
// row-major and inlier mask (n,).
int pnp_ransac(const double* pts, const double* uv, int n, int iterations,
               double reproj_thresh, uint64_t seed, double* w2c_out,
               uint8_t* inliers_out) {
  if (n < 6) return 0;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);
  double thresh2 = reproj_thresh * reproj_thresh;

  std::vector<uint8_t> inliers(n), best_inliers(n);
  double best_R[9], best_t[3];
  int best_count = -1;

  for (int it = 0; it < iterations; ++it) {
    int idx[6];
    for (int k = 0; k < 6; ++k) {
      int candidate;
      bool dup;
      do {
        candidate = pick(rng);
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (idx[j] == candidate);
      } while (dup);
      idx[k] = candidate;
    }
    double R[9], t[3];
    if (!dlt_pose(pts, uv, idx, 6, R, t)) continue;
    int count = count_inliers(pts, uv, n, R, t, thresh2, inliers.data());
    if (count > best_count) {
      best_count = count;
      std::memcpy(best_R, R, sizeof(R));
      std::memcpy(best_t, t, sizeof(t));
      best_inliers = inliers;
    }
  }
  if (best_count < 6) return 0;

  refine(pts, uv, best_inliers.data(), n, best_R, best_t, 10);
  count_inliers(pts, uv, n, best_R, best_t, thresh2, best_inliers.data());
  refine(pts, uv, best_inliers.data(), n, best_R, best_t, 10);
  int final_count =
      count_inliers(pts, uv, n, best_R, best_t, thresh2, best_inliers.data());
  if (final_count < 6) return 0;

  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) w2c_out[i * 4 + j] = best_R[i * 3 + j];
    w2c_out[i * 4 + 3] = best_t[i];
  }
  w2c_out[12] = w2c_out[13] = w2c_out[14] = 0.0;
  w2c_out[15] = 1.0;
  if (inliers_out) std::memcpy(inliers_out, best_inliers.data(), n);
  return 1;
}

}  // extern "C"
