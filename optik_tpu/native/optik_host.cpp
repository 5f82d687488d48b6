// optik_host: native host-side kinematics + single-solve IK runtime.
//
// Role in the framework: the TPU path (JAX/XLA) is the throughput engine;
// this C++ library is the *latency* engine for single queries, where a
// device round-trip (~100us+) would dominate the solve itself, and the
// native counterpart of the reference's C ABI / C++ layer
// (kylc/optik crates/optik-cpp/src/lib.rs:26-183, include/optik.hpp:29-105).
//
// Same math as optik_tpu/math + ops (which carry the reference citations):
// SE(3) log + right Jacobian with Taylor guards, folded-chain FK, EE-frame
// geometric Jacobian, and a damped Gauss-Newton (Levenberg-Marquardt) solver
// with box projection and Nielsen damping — the scalar twin of
// solver/lm_soa.py.  Exposed through a minimal C ABI consumed by ctypes
// (optik_tpu/native/host.py).
//
// No external dependencies: plain C++17, hand-rolled 3x3/6x6 linear algebra.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

constexpr double kEps = 1e-6;  // Taylor switch threshold (math.rs:7)

struct Vec3 {
  double x, y, z;
};

struct Mat3 {
  double m[3][3];
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

inline Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[i][k] * b.m[k][j];
      r.m[i][j] = s;
    }
  return r;
}

inline Vec3 matvec(const Mat3& a, Vec3 v) {
  return {a.m[0][0] * v.x + a.m[0][1] * v.y + a.m[0][2] * v.z,
          a.m[1][0] * v.x + a.m[1][1] * v.y + a.m[1][2] * v.z,
          a.m[2][0] * v.x + a.m[2][1] * v.y + a.m[2][2] * v.z};
}

inline Vec3 mattvec(const Mat3& a, Vec3 v) {
  return {a.m[0][0] * v.x + a.m[1][0] * v.y + a.m[2][0] * v.z,
          a.m[0][1] * v.x + a.m[1][1] * v.y + a.m[2][1] * v.z,
          a.m[0][2] * v.x + a.m[1][2] * v.y + a.m[2][2] * v.z};
}

inline Mat3 identity3() { return {{{1, 0, 0}, {0, 1, 0}, {0, 0, 1}}}; }

// R = I + sin(q) K + (1 - cos(q)) K^2 for unit axis k.
Mat3 rodrigues(Vec3 k, double q) {
  const double s = std::sin(q), c1 = 1.0 - std::cos(q);
  Mat3 r;
  r.m[0][0] = 1.0 + c1 * (-k.y * k.y - k.z * k.z);
  r.m[0][1] = -s * k.z + c1 * k.x * k.y;
  r.m[0][2] = s * k.y + c1 * k.x * k.z;
  r.m[1][0] = s * k.z + c1 * k.x * k.y;
  r.m[1][1] = 1.0 + c1 * (-k.x * k.x - k.z * k.z);
  r.m[1][2] = -s * k.x + c1 * k.y * k.z;
  r.m[2][0] = -s * k.y + c1 * k.x * k.z;
  r.m[2][1] = s * k.x + c1 * k.y * k.z;
  r.m[2][2] = 1.0 + c1 * (-k.x * k.x - k.y * k.y);
  return r;
}

// Rotation matrix -> rotation vector (Shepperd quaternion + atan2 log).
Vec3 mat_log(const Mat3& r) {
  const double tw = 1.0 + r.m[0][0] + r.m[1][1] + r.m[2][2];
  const double tx = 1.0 + r.m[0][0] - r.m[1][1] - r.m[2][2];
  const double ty = 1.0 - r.m[0][0] + r.m[1][1] - r.m[2][2];
  const double tz = 1.0 - r.m[0][0] - r.m[1][1] + r.m[2][2];
  double q[4];  // x, y, z, w
  if (tw >= tx && tw >= ty && tw >= tz) {
    const double s = std::sqrt(tw > 0 ? tw : 0) * 2.0;  // 4w
    q[0] = (r.m[2][1] - r.m[1][2]) / s;
    q[1] = (r.m[0][2] - r.m[2][0]) / s;
    q[2] = (r.m[1][0] - r.m[0][1]) / s;
    q[3] = 0.25 * s;
  } else if (tx >= ty && tx >= tz) {
    const double s = std::sqrt(tx) * 2.0;
    q[0] = 0.25 * s;
    q[1] = (r.m[0][1] + r.m[1][0]) / s;
    q[2] = (r.m[0][2] + r.m[2][0]) / s;
    q[3] = (r.m[2][1] - r.m[1][2]) / s;
  } else if (ty >= tz) {
    const double s = std::sqrt(ty) * 2.0;
    q[0] = (r.m[0][1] + r.m[1][0]) / s;
    q[1] = 0.25 * s;
    q[2] = (r.m[1][2] + r.m[2][1]) / s;
    q[3] = (r.m[0][2] - r.m[2][0]) / s;
  } else {
    const double s = std::sqrt(tz) * 2.0;
    q[0] = (r.m[0][2] + r.m[2][0]) / s;
    q[1] = (r.m[1][2] + r.m[2][1]) / s;
    q[2] = 0.25 * s;
    q[3] = (r.m[1][0] - r.m[0][1]) / s;
  }
  double n = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  double x = q[0] / n, y = q[1] / n, z = q[2] / n, w = q[3] / n;
  if (w < 0) { x = -x; y = -y; z = -z; w = -w; }
  const double v2 = x * x + y * y + z * z;
  double t;
  if (v2 > kEps) {
    const double vn = std::sqrt(v2);
    t = std::atan2(vn, w) / vn;
  } else {
    const double w3 = w * w * w;
    t = 1.0 / w - v2 / (3.0 * w3) + v2 * v2 / (5.0 * w3 * w * w);
  }
  return {2.0 * x * t, 2.0 * y * t, 2.0 * z * t};
}

// diag + a*[w]_x + b*[w]_x^2
Mat3 hat_terms(double diag, Vec3 w, double a, double b) {
  const double w11 = w.x * w.x, w22 = w.y * w.y, w33 = w.z * w.z;
  const double w12 = w.x * w.y, w13 = w.x * w.z, w23 = w.y * w.z;
  Mat3 r;
  r.m[0][0] = diag + b * (-w22 - w33);
  r.m[0][1] = -a * w.z + b * w12;
  r.m[0][2] = a * w.y + b * w13;
  r.m[1][0] = a * w.z + b * w12;
  r.m[1][1] = diag + b * (-w11 - w33);
  r.m[1][2] = -a * w.x + b * w23;
  r.m[2][0] = -a * w.y + b * w13;
  r.m[2][1] = a * w.x + b * w23;
  r.m[2][2] = diag + b * (-w11 - w22);
  return r;
}

Mat3 so3_right_jacobian(Vec3 w) {
  const double t2 = dot(w, w), t4 = t2 * t2;
  double a, b, c;
  if (t2 > kEps) {
    const double t = std::sqrt(t2), s = std::sin(t), co = std::cos(t);
    a = s / t;
    b = (1.0 - co) / t2;
    c = (1.0 - a) / t2;
  } else {
    a = 1.0 - t2 / 6.0 + t4 / 120.0;
    b = 0.5 - t2 / 24.0 + t4 / 720.0;
    c = 1.0 / 6.0 - t2 / 120.0 + t4 / 5040.0;
  }
  const double e = (b - 2.0 * c) / (2.0 * a);
  return hat_terms(1.0, w, 0.5, e);
}

// [v; w] = log6 of (r, t), with w precomputed.
void se3_log(const Vec3& w, Vec3 t, double out[6]) {
  const double t2 = dot(w, w);
  double coef;
  if (t2 > kEps * kEps) {
    const double th = std::sqrt(t2), s = std::sin(th), c = std::cos(th);
    coef = (1.0 - 0.5 * th * s / (1.0 - c)) / t2;
  } else {
    coef = 1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0;
  }
  Mat3 vinv = hat_terms(1.0, w, -0.5, coef);
  Vec3 v = matvec(vinv, t);
  out[0] = v.x; out[1] = v.y; out[2] = v.z;
  out[3] = w.x; out[4] = w.y; out[5] = w.z;
}

// Q block of the SE(3) log right Jacobian (Pinocchio-style; math.rs:135-170).
Mat3 se3_q_block(Vec3 v, Vec3 w) {
  const double t2 = dot(w, w), t4 = t2 * t2;
  double a, b;
  if (t2 > kEps) {
    const double th = std::sqrt(t2), s = std::sin(th), c = std::cos(th);
    const double s_t = s / th, inv1mc = 1.0 / (2.0 * (1.0 - c));
    a = 1.0 / t2 - s_t * inv1mc;
    b = -2.0 / t4 + (1.0 + s_t) * inv1mc / t2;
  } else {
    a = 1.0 / 12.0 + t2 / 720.0;
    b = 1.0 / 360.0;
  }
  const double d = dot(w, v);
  Vec3 cv = (b * d) * w - (t2 * b + 2.0 * a) * v;
  Mat3 C;
  const double da = d * a;
  C.m[0][0] = cv.x * w.x + a * w.x * v.x + da;
  C.m[0][1] = -0.5 * v.z + cv.x * w.y + a * w.x * v.y;
  C.m[0][2] = 0.5 * v.y + cv.x * w.z + a * w.x * v.z;
  C.m[1][0] = 0.5 * v.z + cv.y * w.x + a * w.y * v.x;
  C.m[1][1] = cv.y * w.y + a * w.y * v.y + da;
  C.m[1][2] = -0.5 * v.x + cv.y * w.z + a * w.y * v.z;
  C.m[2][0] = -0.5 * v.y + cv.z * w.x + a * w.z * v.x;
  C.m[2][1] = 0.5 * v.x + cv.z * w.y + a * w.z * v.y;
  C.m[2][2] = cv.z * w.z + a * w.z * v.z + da;
  return matmul(C, so3_right_jacobian(w));
}

struct Chain {
  int n = 0;                    // articulated joints
  std::vector<Mat3> org_r;
  std::vector<Vec3> org_t;
  std::vector<Vec3> axis;
  std::vector<uint8_t> prismatic;
  std::vector<double> lower, upper;
  Mat3 tip_r = identity3();
  Vec3 tip_t{0, 0, 0};
};

struct Frame {
  Mat3 r;
  Vec3 t;
};

// FK: frames for all joints + EE pose (tip applied).
void fk(const Chain& c, const double* q, std::vector<Frame>& frames,
        Mat3& r_ee, Vec3& t_ee) {
  Mat3 r = identity3();
  Vec3 t{0, 0, 0};
  frames.resize(c.n);
  for (int j = 0; j < c.n; ++j) {
    Mat3 lr;
    Vec3 lt;
    if (c.prismatic[j]) {
      lr = c.org_r[j];
      lt = c.org_t[j] + matvec(c.org_r[j], q[j] * c.axis[j]);
    } else {
      lr = matmul(c.org_r[j], rodrigues(c.axis[j], q[j]));
      lt = c.org_t[j];
    }
    t = t + matvec(r, lt);
    r = matmul(r, lr);
    frames[j] = {r, t};
  }
  t_ee = t + matvec(r, c.tip_t);
  r_ee = matmul(r, c.tip_r);
}

// Residual e = log6(T_tgt^-1 T(q)) and task Jacobian Jlog6 * Jgeo (6 x n).
void residual_jac(const Chain& c, const double* q, const Mat3& tr,
                  const Vec3& tv, std::vector<Frame>& frames, double* e,
                  double* jt /* 6*n row-major, may be null */) {
  Mat3 r_ee;
  Vec3 t_ee;
  fk(c, q, frames, r_ee, t_ee);

  // X = T_tgt^-1 * T_ee
  Mat3 xr;
  {
    Mat3 trt;  // tr transposed
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) trt.m[i][j] = tr.m[j][i];
    xr = matmul(trt, r_ee);
  }
  Vec3 xt = mattvec(tr, t_ee - tv);
  Vec3 w = mat_log(xr);
  se3_log(w, xt, e);

  if (!jt) return;

  Mat3 jr = so3_right_jacobian(w);
  Mat3 qq = se3_q_block(xt, w);
  for (int j = 0; j < c.n; ++j) {
    Vec3 dir_w = matvec(frames[j].r, c.axis[j]);
    Vec3 lin_w, ang_w;
    if (c.prismatic[j]) {
      lin_w = dir_w;
      ang_w = {0, 0, 0};
    } else {
      ang_w = dir_w;
      lin_w = cross(dir_w, t_ee - frames[j].t);
    }
    Vec3 lin_l = mattvec(r_ee, lin_w);
    Vec3 ang_l = mattvec(r_ee, ang_w);
    const double col[6] = {lin_l.x, lin_l.y, lin_l.z, ang_l.x, ang_l.y,
                           ang_l.z};
    for (int i = 0; i < 3; ++i) {
      double top = 0, bot = 0;
      for (int k = 0; k < 3; ++k) {
        top += jr.m[i][k] * col[k] + qq.m[i][k] * col[3 + k];
        bot += jr.m[i][k] * col[3 + k];
      }
      jt[i * c.n + j] = top;
      jt[(3 + i) * c.n + j] = bot;
    }
  }
}

// 6x6 SPD solve (Cholesky), in place.
bool solve6(double a[6][6], const double b[6], double x[6]) {
  double l[6][6];
  for (int j = 0; j < 6; ++j) {
    double s = a[j][j];
    for (int k = 0; k < j; ++k) s -= l[j][k] * l[j][k];
    if (s <= 0) return false;
    l[j][j] = std::sqrt(s);
    for (int i = j + 1; i < 6; ++i) {
      double v = a[i][j];
      for (int k = 0; k < j; ++k) v -= l[i][k] * l[j][k];
      l[i][j] = v / l[j][j];
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= l[i][k] * y[k];
    y[i] = s / l[i][i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= l[k][i] * x[k];
    x[i] = s / l[i][i];
  }
  return true;
}

double cost_at(const Chain& c, const double* q, const Mat3& tr,
               const Vec3& tv, std::vector<Frame>& frames) {
  double e[6];
  residual_jac(c, q, tr, tv, frames, e, nullptr);
  double f = 0;
  for (double v : e) f += v * v;
  return f;
}

}  // namespace

extern "C" {

// --- chain construction ----------------------------------------------------

void* optik_host_chain_new(int n, const double* origin_r /* n*9 */,
                           const double* origin_t /* n*3 */,
                           const double* axis /* n*3 */,
                           const uint8_t* prismatic /* n */,
                           const double* lower, const double* upper,
                           const double* tip_r /* 9 */,
                           const double* tip_t /* 3 */) {
  auto* c = new Chain();
  c->n = n;
  c->org_r.resize(n);
  c->org_t.resize(n);
  c->axis.resize(n);
  c->prismatic.assign(prismatic, prismatic + n);
  c->lower.assign(lower, lower + n);
  c->upper.assign(upper, upper + n);
  for (int j = 0; j < n; ++j) {
    std::memcpy(c->org_r[j].m, origin_r + 9 * j, 9 * sizeof(double));
    c->org_t[j] = {origin_t[3 * j], origin_t[3 * j + 1], origin_t[3 * j + 2]};
    c->axis[j] = {axis[3 * j], axis[3 * j + 1], axis[3 * j + 2]};
  }
  std::memcpy(c->tip_r.m, tip_r, 9 * sizeof(double));
  c->tip_t = {tip_t[0], tip_t[1], tip_t[2]};
  return c;
}

void optik_host_chain_free(void* chain) { delete static_cast<Chain*>(chain); }

// --- kinematics ------------------------------------------------------------

void optik_host_fk(const void* chain, const double* q,
                   double* pose /* 16, row-major 4x4 */) {
  const auto& c = *static_cast<const Chain*>(chain);
  std::vector<Frame> frames;
  Mat3 r;
  Vec3 t;
  fk(c, q, frames, r, t);
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) pose[i * 4 + j] = r.m[i][j];
  }
  pose[3] = t.x; pose[7] = t.y; pose[11] = t.z;
  pose[12] = pose[13] = pose[14] = 0.0;
  pose[15] = 1.0;
  pose[3] = t.x; pose[7] = t.y; pose[11] = t.z;
}

void optik_host_jacobian(const void* chain, const double* q,
                         double* jac /* 6*n row-major, EE frame */) {
  const auto& c = *static_cast<const Chain*>(chain);
  std::vector<Frame> frames;
  Mat3 r_ee;
  Vec3 t_ee;
  fk(c, q, frames, r_ee, t_ee);
  for (int j = 0; j < c.n; ++j) {
    Vec3 dir_w = matvec(frames[j].r, c.axis[j]);
    Vec3 lin_w, ang_w;
    if (c.prismatic[j]) {
      lin_w = dir_w;
      ang_w = {0, 0, 0};
    } else {
      ang_w = dir_w;
      lin_w = cross(dir_w, t_ee - frames[j].t);
    }
    Vec3 lin_l = mattvec(r_ee, lin_w);
    Vec3 ang_l = mattvec(r_ee, ang_w);
    jac[0 * c.n + j] = lin_l.x;
    jac[1 * c.n + j] = lin_l.y;
    jac[2 * c.n + j] = lin_l.z;
    jac[3 * c.n + j] = ang_l.x;
    jac[4 * c.n + j] = ang_l.y;
    jac[5 * c.n + j] = ang_l.z;
  }
}

// --- single-solve IK (latency path) ---------------------------------------
//
// Damped Gauss-Newton with box projection and Nielsen damping; restart i
// draws uniformly from the limits with a deterministic per-restart stream
// (mt19937 seeded rng_seed + i), restart 0 = x0.  Returns 1 + writes the
// solution/cost on success (f <= tol_f), else 0.

int optik_host_ik(const void* chain, const double* target /* 16 row-major */,
                  const double* x0, double tol_f, int max_iters,
                  int max_restarts, uint64_t rng_seed, double* x_out,
                  double* f_out) {
  const auto& c = *static_cast<const Chain*>(chain);
  const int n = c.n;

  Mat3 tr;
  Vec3 tv{target[3], target[7], target[11]};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) tr.m[i][j] = target[i * 4 + j];

  std::vector<Frame> frames;
  std::vector<double> x(n), e(6), jt(6 * n), xt(n);
  const double tol_df = 1e-3 * tol_f;  // stall heuristic (lib.rs:283-293)

  for (int restart = 0; restart < max_restarts; ++restart) {
    if (restart == 0) {
      std::memcpy(x.data(), x0, n * sizeof(double));
    } else {
      std::mt19937_64 rng(rng_seed + restart);
      for (int j = 0; j < n; ++j) {
        double lo = c.lower[j], hi = c.upper[j];
        if (!std::isfinite(lo)) lo = -3.14159265358979;
        if (!std::isfinite(hi)) hi = 3.14159265358979;
        std::uniform_real_distribution<double> d(lo, hi);
        x[j] = d(rng);
      }
    }

    residual_jac(c, x.data(), tr, tv, frames, e.data(), jt.data());
    double f = 0;
    for (double v : e) f += v * v;
    double lam = 1e-4, nu = 2.0;

    for (int it = 0; it < max_iters && f > tol_f; ++it) {
      double a[6][6];
      for (int i = 0; i < 6; ++i)
        for (int k = 0; k <= i; ++k) {
          double s = 0;
          for (int p = 0; p < n; ++p) s += jt[i * n + p] * jt[k * n + p];
          a[i][k] = a[k][i] = s;
        }
      for (int i = 0; i < 6; ++i) a[i][i] += lam;
      double z[6];
      if (!solve6(a, e.data(), z)) { lam *= nu; nu *= 2; continue; }
      for (int p = 0; p < n; ++p) {
        double d = 0;
        for (int i = 0; i < 6; ++i) d -= jt[i * n + p] * z[i];
        double v = x[p] + d;
        if (v < c.lower[p]) v = c.lower[p];
        if (v > c.upper[p]) v = c.upper[p];
        xt[p] = v;
      }
      double e_new[6];
      std::vector<double> jt_new(6 * n);
      residual_jac(c, xt.data(), tr, tv, frames, e_new, jt_new.data());
      double f_new = 0;
      for (double v : e_new) f_new += v * v;

      if (f_new < f) {
        // Gain ratio on the projected step.
        double wv[6] = {0, 0, 0, 0, 0, 0};
        for (int i = 0; i < 6; ++i)
          for (int p = 0; p < n; ++p)
            wv[i] += jt[i * n + p] * (xt[p] - x[p]);
        double pred = 0, rw = 0;
        for (int i = 0; i < 6; ++i) {
          rw += e[i] * wv[i];
          pred -= wv[i] * wv[i];
        }
        pred -= 2.0 * rw;
        const double df = f - f_new;
        if (pred > 0) {
          const double rho = df / pred;
          const double sh = 1.0 - std::pow(2.0 * rho - 1.0, 3.0);
          lam *= (sh > 1.0 / 3.0 ? sh : 1.0 / 3.0);
          nu = 2.0;
        }
        x = xt;
        std::memcpy(e.data(), e_new, 6 * sizeof(double));
        jt = jt_new;
        f = f_new;
        if (df < tol_df) break;  // stalled
      } else {
        lam *= nu;
        nu = std::min(nu * 2.0, 64.0);
        if (lam > 1e10) break;  // stuck
      }
    }

    if (f <= tol_f) {
      std::memcpy(x_out, x.data(), n * sizeof(double));
      *f_out = f;
      return 1;
    }
  }
  return 0;
}

}  // extern "C"
