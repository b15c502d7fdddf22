// Native float64 oracle: the reference iLQR semantics in plain C++17.
//
// Role in this framework (mirrors the reference's C++ core, which lives at
// /root/reference/src/{quadrotor_model.cc,cost.hh,ilqr.hh} — re-derived here
// from the math, not translated): an independent, fast, single-threaded
// host-side implementation used (a) as the correctness oracle for the TPU
// engine's parity tests and (b) as the honest CPU baseline for bench.py's
// vs_baseline ratio. Exposed through a C ABI consumed via ctypes
// (quadrotorilqr_tpu/oracle/native.py) — no pybind11 dependency.
//
// Conventions match the JAX engine and manif: state x = (pose in SE(3),
// body velocity in R^6), tangent ordered [lin(3), ang(3)]; right-plus
// x (+) tau = x * Exp(tau); right-minus lhs (-) rhs = Log(rhs^-1 lhs);
// Euler discretization with chain-ruled analytic Jacobians.

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

constexpr int SD = 12;  // state tangent dim
constexpr int CD = 4;   // control dim
constexpr double kSmall = 1e-3;

// ---------------------------------------------------------------- small mats
// Row-major fixed-size helpers over raw double pointers.

template <int N, int M, int K>
void matmul(const double* a, const double* b, double* c) {
  for (int i = 0; i < N; ++i)
    for (int k = 0; k < K; ++k) {
      double s = 0;
      for (int j = 0; j < M; ++j) s += a[i * M + j] * b[j * K + k];
      c[i * K + k] = s;
    }
}

template <int N, int M>
void matvec(const double* a, const double* x, double* y) {
  for (int i = 0; i < N; ++i) {
    double s = 0;
    for (int j = 0; j < M; ++j) s += a[i * M + j] * x[j];
    y[i] = s;
  }
}

template <int N, int M>
void transpose(const double* a, double* at) {
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < M; ++j) at[j * N + i] = a[i * M + j];
}

template <int N>
void eye(double* a, double s = 1.0) {
  std::memset(a, 0, sizeof(double) * N * N);
  for (int i = 0; i < N; ++i) a[i * N + i] = s;
}

void cross(const double* a, const double* b, double* c) {
  c[0] = a[1] * b[2] - a[2] * b[1];
  c[1] = a[2] * b[0] - a[0] * b[2];
  c[2] = a[0] * b[1] - a[1] * b[0];
}

void hat(const double* v, double* m) {
  m[0] = 0;      m[1] = -v[2]; m[2] = v[1];
  m[3] = v[2];   m[4] = 0;     m[5] = -v[0];
  m[6] = -v[1];  m[7] = v[0];  m[8] = 0;
}

// Cholesky solve for SPD n x n (the engine's ops/linalg.py in C++).
template <int N, int K>
bool chol_solve(const double* a, const double* b, double* x) {
  double l[N * N] = {0};
  for (int j = 0; j < N; ++j) {
    double s = a[j * N + j];
    for (int k = 0; k < j; ++k) s -= l[j * N + k] * l[j * N + k];
    if (s <= 0) return false;
    const double d = std::sqrt(s);
    l[j * N + j] = d;
    for (int i = j + 1; i < N; ++i) {
      double t = a[i * N + j];
      for (int k = 0; k < j; ++k) t -= l[i * N + k] * l[j * N + k];
      l[i * N + j] = t / d;
    }
  }
  double y[N * K];
  for (int col = 0; col < K; ++col) {
    for (int i = 0; i < N; ++i) {
      double s = b[i * K + col];
      for (int j = 0; j < i; ++j) s -= l[i * N + j] * y[j * K + col];
      y[i * K + col] = s / l[i * N + i];
    }
    for (int i = N - 1; i >= 0; --i) {
      double s = y[i * K + col];
      for (int j = i + 1; j < N; ++j) s -= l[j * N + i] * x[j * K + col];
      x[i * K + col] = s / l[i * N + i];
    }
  }
  return true;
}

// ------------------------------------------------------------------- SO(3)
// Rotations stored as row-major 3x3 matrices.

void so3_exp(const double* theta, double* r) {
  const double t2 = theta[0] * theta[0] + theta[1] * theta[1] + theta[2] * theta[2];
  double w[9], w2[9];
  hat(theta, w);
  matmul<3, 3, 3>(w, w, w2);
  double a, b;
  if (t2 < kSmall * kSmall) {
    a = 1.0 - t2 / 6.0 + t2 * t2 / 120.0;
    b = 0.5 - t2 / 24.0 + t2 * t2 / 720.0;
  } else {
    const double t = std::sqrt(t2);
    a = std::sin(t) / t;
    b = (1.0 - std::cos(t)) / t2;
  }
  eye<3>(r);
  for (int i = 0; i < 9; ++i) r[i] += a * w[i] + b * w2[i];
}

void so3_log(const double* r, double* theta) {
  const double tr = r[0] + r[4] + r[8];
  const double c = std::min(1.0, std::max(-1.0, (tr - 1.0) * 0.5));
  const double angle = std::acos(c);
  const double v[3] = {r[7] - r[5], r[2] - r[6], r[3] - r[1]};  // vee(R - R^T)
  if (angle < 1e-9) {
    theta[0] = 0.5 * v[0];
    theta[1] = 0.5 * v[1];
    theta[2] = 0.5 * v[2];
    return;
  }
  if (angle > M_PI - 1e-6) {
    // near pi: axis from diagonal of (R + I)/2
    double axis[3];
    axis[0] = std::sqrt(std::max(0.0, (r[0] + 1.0) * 0.5));
    axis[1] = std::sqrt(std::max(0.0, (r[4] + 1.0) * 0.5));
    axis[2] = std::sqrt(std::max(0.0, (r[8] + 1.0) * 0.5));
    // fix signs from off-diagonals relative to the largest component
    int m = 0;
    if (axis[1] > axis[m]) m = 1;
    if (axis[2] > axis[m]) m = 2;
    if (m == 0) {
      axis[1] = std::copysign(axis[1], r[1] + r[3]);
      axis[2] = std::copysign(axis[2], r[2] + r[6]);
    } else if (m == 1) {
      axis[0] = std::copysign(axis[0], r[1] + r[3]);
      axis[2] = std::copysign(axis[2], r[5] + r[7]);
    } else {
      axis[0] = std::copysign(axis[0], r[2] + r[6]);
      axis[1] = std::copysign(axis[1], r[5] + r[7]);
    }
    // overall sign from vee(R - R^T) when usable
    const double dot = axis[0] * v[0] + axis[1] * v[1] + axis[2] * v[2];
    const double s = (dot < 0) ? -1.0 : 1.0;
    const double n =
        std::sqrt(axis[0] * axis[0] + axis[1] * axis[1] + axis[2] * axis[2]);
    for (int i = 0; i < 3; ++i) theta[i] = s * angle * axis[i] / n;
    return;
  }
  const double k = angle / (2.0 * std::sin(angle));
  theta[0] = k * v[0];
  theta[1] = k * v[1];
  theta[2] = k * v[2];
}

void so3_left_jac(const double* theta, double* j) {
  const double t2 = theta[0] * theta[0] + theta[1] * theta[1] + theta[2] * theta[2];
  double w[9], w2[9], b, c;
  hat(theta, w);
  matmul<3, 3, 3>(w, w, w2);
  if (t2 < kSmall * kSmall) {
    b = 0.5 - t2 / 24.0 + t2 * t2 / 720.0;
    c = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0;
  } else {
    const double t = std::sqrt(t2);
    b = (1.0 - std::cos(t)) / t2;
    c = (t - std::sin(t)) / (t2 * t);
  }
  eye<3>(j);
  for (int i = 0; i < 9; ++i) j[i] += b * w[i] + c * w2[i];
}

void so3_left_jac_inv(const double* theta, double* j) {
  const double t2 = theta[0] * theta[0] + theta[1] * theta[1] + theta[2] * theta[2];
  double w[9], w2[9], d;
  hat(theta, w);
  matmul<3, 3, 3>(w, w, w2);
  if (t2 < kSmall * kSmall) {
    d = 1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0;
  } else {
    const double t = std::sqrt(t2);
    d = 1.0 / t2 - (1.0 + std::cos(t)) / (2.0 * t * std::sin(t));
  }
  eye<3>(j);
  for (int i = 0; i < 9; ++i) j[i] += -0.5 * w[i] + d * w2[i];
}

// ------------------------------------------------------------------- SE(3)

struct SE3 {
  double r[9];
  double t[3];
};

void se3_compose(const SE3& a, const SE3& b, SE3* out) {
  matmul<3, 3, 3>(a.r, b.r, out->r);
  matvec<3, 3>(a.r, b.t, out->t);
  for (int i = 0; i < 3; ++i) out->t[i] += a.t[i];
}

void se3_inverse(const SE3& x, SE3* out) {
  transpose<3, 3>(x.r, out->r);
  double tmp[3];
  matvec<3, 3>(out->r, x.t, tmp);
  for (int i = 0; i < 3; ++i) out->t[i] = -tmp[i];
}

void se3_exp(const double* tau, SE3* out) {  // tau = [rho, theta]
  so3_exp(tau + 3, out->r);
  double v[9];
  so3_left_jac(tau + 3, v);
  matvec<3, 3>(v, tau, out->t);
}

void se3_log(const SE3& x, double* tau) {
  so3_log(x.r, tau + 3);
  double vinv[9];
  so3_left_jac_inv(tau + 3, vinv);
  matvec<3, 3>(vinv, x.t, tau);
}

void se3_adjoint(const SE3& x, double* adj /*6x6*/) {  // [[R, hat(t)R],[0,R]]
  double ht[9], htr[9];
  hat(x.t, ht);
  matmul<3, 3, 3>(ht, x.r, htr);
  std::memset(adj, 0, sizeof(double) * 36);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      adj[i * 6 + j] = x.r[i * 3 + j];
      adj[i * 6 + 3 + j] = htr[i * 3 + j];
      adj[(i + 3) * 6 + 3 + j] = x.r[i * 3 + j];
    }
}

// Barfoot Q-matrix (TRO'14 eq. 102)
void se3_q_matrix(const double* tau, double* q) {
  const double* rho = tau;
  const double* theta = tau + 3;
  const double t2 = theta[0] * theta[0] + theta[1] * theta[1] + theta[2] * theta[2];
  double b, c, e;
  if (t2 < kSmall * kSmall) {
    b = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0;
    c = -1.0 / 24.0 + t2 / 720.0 - t2 * t2 / 40320.0;
    e = -1.0 / 120.0 + t2 / 5040.0 - t2 * t2 / 362880.0;
  } else {
    const double t = std::sqrt(t2);
    const double st = std::sin(t), ct = std::cos(t);
    b = (t - st) / (t2 * t);
    c = (1.0 - 0.5 * t2 - ct) / (t2 * t2);
    e = (t - st - t2 * t / 6.0) / (t2 * t2 * t);
  }
  const double d = c - 3.0 * e;
  double v[9], w[9], vw[9], wv[9], wvw[9], vww[9], wwv[9], wvww[9], wwvw[9];
  hat(rho, v);
  hat(theta, w);
  matmul<3, 3, 3>(v, w, vw);
  matmul<3, 3, 3>(w, v, wv);
  matmul<3, 3, 3>(wv, w, wvw);
  matmul<3, 3, 3>(vw, w, vww);
  matmul<3, 3, 3>(w, wv, wwv);
  matmul<3, 3, 3>(wvw, w, wvww);
  matmul<3, 3, 3>(w, wvw, wwvw);
  for (int i = 0; i < 9; ++i)
    q[i] = 0.5 * v[i] + b * (wv[i] + vw[i] + wvw[i]) -
           c * (wwv[i] + vww[i] - 3.0 * wvw[i]) - 0.5 * d * (wvww[i] + wwvw[i]);
}

void block66(const double* a, const double* q, const double* d, double* out) {
  std::memset(out, 0, sizeof(double) * 36);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      out[i * 6 + j] = a[i * 3 + j];
      out[i * 6 + 3 + j] = q[i * 3 + j];
      out[(i + 3) * 6 + 3 + j] = d[i * 3 + j];
    }
}

void se3_right_jac(const double* tau, double* j) {  // Jl(-tau)
  double ntau[6];
  for (int i = 0; i < 6; ++i) ntau[i] = -tau[i];
  double jl[9], q[9];
  so3_left_jac(ntau + 3, jl);
  se3_q_matrix(ntau, q);
  block66(jl, q, jl, j);
}

void se3_right_jac_inv(const double* tau, double* j) {  // Jl(-tau)^-1
  double ntau[6];
  for (int i = 0; i < 6; ++i) ntau[i] = -tau[i];
  double jli[9], q[9], t1[9], t2[9];
  so3_left_jac_inv(ntau + 3, jli);
  se3_q_matrix(ntau, q);
  matmul<3, 3, 3>(jli, q, t1);
  matmul<3, 3, 3>(t1, jli, t2);
  for (int i = 0; i < 9; ++i) t2[i] = -t2[i];
  block66(jli, t2, jli, j);
}

// ------------------------------------------------------------------- model

struct Model {
  double mass, g;
  double inertia[9];
  double inertia_inv[9];
  double moment_arms[12];  // 3x4
};

struct State {
  SE3 pose;
  double vel[6];  // [lin, ang]
};

void model_init(Model* m, double mass, const double* inertia, double arm,
                double kappa, double g) {
  m->mass = mass;
  m->g = g;
  std::memcpy(m->inertia, inertia, sizeof(double) * 9);
  double id[9];
  eye<3>(id);
  chol_solve<3, 3>(inertia, id, m->inertia_inv);
  const double ma[12] = {0, -arm, 0, arm, arm, 0, -arm, 0, -kappa, kappa, -kappa, kappa};
  std::memcpy(m->moment_arms, ma, sizeof(ma));
}

// xdot (12) and optional analytic Jacobians (quadrotor_model.cc:65-122)
void continuous_dynamics(const Model& m, const State& x, const double* u,
                         double* xdot, double* jx /*12x12 or null*/,
                         double* ju /*12x4 or null*/) {
  double rt[9];
  transpose<3, 3>(x.pose.r, rt);
  const double rt_ez[3] = {rt[2], rt[5], rt[8]};  // R^T e_z
  const double thrust = (u[0] + u[1] + u[2] + u[3]) / m.mass;
  double acc_lin[3];
  for (int i = 0; i < 3; ++i) acc_lin[i] = -m.g * rt_ez[i];
  acc_lin[2] += thrust;
  const double* omega = x.vel + 3;
  double i_omega[3], tau[3], wxiw[3], acc_ang[3];
  matvec<3, 3>(m.inertia, omega, i_omega);
  matvec<3, 4>(m.moment_arms, u, tau);
  cross(omega, i_omega, wxiw);
  double rhs[3] = {tau[0] - wxiw[0], tau[1] - wxiw[1], tau[2] - wxiw[2]};
  matvec<3, 3>(m.inertia_inv, rhs, acc_ang);
  for (int i = 0; i < 6; ++i) xdot[i] = x.vel[i];
  for (int i = 0; i < 3; ++i) xdot[6 + i] = acc_lin[i];
  for (int i = 0; i < 3; ++i) xdot[9 + i] = acc_ang[i];

  if (jx) {
    std::memset(jx, 0, sizeof(double) * SD * SD);
    for (int i = 0; i < 6; ++i) jx[i * SD + 6 + i] = 1.0;  // d(qdot)/dv
    double h[9];
    hat(rt_ez, h);
    for (int i = 0; i < 3; ++i)  // d(acc_lin)/d(pose_ang) = -g hat(R^T ez)
      for (int j = 0; j < 3; ++j) jx[(6 + i) * SD + 3 + j] = -m.g * h[i * 3 + j];
    double hw[9], hiw[9], t1[9], t2[9];
    hat(omega, hw);
    hat(i_omega, hiw);
    matmul<3, 3, 3>(hw, m.inertia, t1);
    for (int i = 0; i < 9; ++i) t1[i] -= hiw[i];
    matmul<3, 3, 3>(m.inertia_inv, t1, t2);
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) jx[(9 + i) * SD + 9 + j] = -t2[i * 3 + j];
  }
  if (ju) {
    std::memset(ju, 0, sizeof(double) * SD * CD);
    for (int j = 0; j < CD; ++j) ju[8 * CD + j] = 1.0 / m.mass;
    double ima[12];
    matmul<3, 3, 4>(m.inertia_inv, m.moment_arms, ima);
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < CD; ++j) ju[(9 + i) * CD + j] = ima[i * 4 + j];
  }
}

// x (+) tangent with optional J_lhs / J_rhs (quadrotor_model.cc:174-200)
void state_add(const State& x, const double* tangent, State* out,
               double* j_lhs, double* j_rhs) {
  SE3 e;
  se3_exp(tangent, &e);
  se3_compose(x.pose, e, &out->pose);
  for (int i = 0; i < 6; ++i) out->vel[i] = x.vel[i] + tangent[6 + i];
  if (j_lhs) {  // I12 with pose block Adj(Exp(tau))^-1
    SE3 einv;
    se3_inverse(e, &einv);
    double adj[36];
    se3_adjoint(einv, adj);
    eye<SD>(j_lhs);
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) j_lhs[i * SD + j] = adj[i * 6 + j];
  }
  if (j_rhs) {  // I12 with pose block Jr(tau)
    double jr[36];
    se3_right_jac(tangent, jr);
    eye<SD>(j_rhs);
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) j_rhs[i * SD + j] = jr[i * 6 + j];
  }
}

// lhs (-) rhs with optional J w.r.t. lhs (quadrotor_model.cc:221-250)
void state_minus(const State& lhs, const State& rhs, double* diff,
                 double* j_lhs) {
  SE3 rinv, rel;
  se3_inverse(rhs.pose, &rinv);
  se3_compose(rinv, lhs.pose, &rel);
  se3_log(rel, diff);
  for (int i = 0; i < 6; ++i) diff[6 + i] = lhs.vel[i] - rhs.vel[i];
  if (j_lhs) {
    double jri[36];
    se3_right_jac_inv(diff, jri);
    eye<SD>(j_lhs);
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j) j_lhs[i * SD + j] = jri[i * 6 + j];
  }
}

// Euler step with chain-ruled Jacobians (quadrotor_model.cc:33-49, 266-277)
void discrete_dynamics(const Model& m, const State& x, const double* u,
                       double dt, State* out, double* jx, double* ju) {
  double xdot[SD];
  if (!jx && !ju) {
    continuous_dynamics(m, x, u, xdot, nullptr, nullptr);
    double tangent[SD];
    for (int i = 0; i < SD; ++i) tangent[i] = dt * xdot[i];
    state_add(x, tangent, out, nullptr, nullptr);
    return;
  }
  double jcx[SD * SD], jcu[SD * CD];
  continuous_dynamics(m, x, u, xdot, jcx, jcu);
  double tangent[SD];
  for (int i = 0; i < SD; ++i) tangent[i] = dt * xdot[i];
  double j_lhs[SD * SD], j_rhs[SD * SD];
  state_add(x, tangent, out, j_lhs, j_rhs);
  for (int i = 0; i < SD * SD; ++i) j_rhs[i] *= dt;  // dt * J_rhs
  if (jx) {
    matmul<SD, SD, SD>(j_rhs, jcx, jx);
    for (int i = 0; i < SD * SD; ++i) jx[i] += j_lhs[i];
  }
  if (ju) matmul<SD, SD, CD>(j_rhs, jcu, ju);
}

// ------------------------------------------------------------------- cost

struct Cost {
  const double* Q;  // 12x12
  const double* R;  // 4x4
  const State* desired_states;
  const double* desired_controls;  // N x 4
};

double stage_cost(const Cost& c, const State& x, const double* u, int i,
                  double* cx, double* cu, double* cxx, double* cuu) {
  double dx[SD], jdx[SD * SD];
  state_minus(x, c.desired_states[i], dx, (cx || cxx) ? jdx : nullptr);
  double du[CD];
  for (int k = 0; k < CD; ++k) du[k] = u[k] - c.desired_controls[i * CD + k];
  double qdx[SD], rdu[CD];
  matvec<SD, SD>(c.Q, dx, qdx);
  matvec<CD, CD>(c.R, du, rdu);
  double j = 0;
  for (int k = 0; k < SD; ++k) j += dx[k] * qdx[k];
  for (int k = 0; k < CD; ++k) j += du[k] * rdu[k];
  if (cx) {  // 2 dx' Q J_dx
    for (int k = 0; k < SD; ++k) {
      double s = 0;
      for (int l = 0; l < SD; ++l) s += qdx[l] * jdx[l * SD + k];
      cx[k] = 2.0 * s;
    }
  }
  if (cxx) {  // 2 J' Q J (Gauss-Newton)
    double qj[SD * SD], jt[SD * SD];
    matmul<SD, SD, SD>(c.Q, jdx, qj);
    transpose<SD, SD>(jdx, jt);
    matmul<SD, SD, SD>(jt, qj, cxx);
    for (int k = 0; k < SD * SD; ++k) cxx[k] *= 2.0;
  }
  if (cu)
    for (int k = 0; k < CD; ++k) cu[k] = 2.0 * rdu[k];
  if (cuu)
    for (int k = 0; k < CD * CD; ++k) cuu[k] = 2.0 * c.R[k];
  return j;
}

// ------------------------------------------------------------------- iLQR

double cost_trajectory(const Cost& c, const State* xs, const double* us, int n) {
  double total = 0;
  for (int i = 0; i < n; ++i)
    total += stage_cost(c, xs[i], us + i * CD, i, nullptr, nullptr, nullptr, nullptr);
  return total;
}

// Riccati recursion (ilqr.hh:97-147). Returns false if Quu not SPD.
bool backwards_pass(const Model& m, const Cost& c, const State* xs,
                    const double* us, int n, double dt, double* ks,
                    double* big_ks, double* qutk, double* ktquuk) {
  double vx[SD] = {0}, vxx[SD * SD] = {0};
  *qutk = 0;
  *ktquuk = 0;
  for (int i = n - 1; i >= 0; --i) {
    State xn;
    double jx[SD * SD], ju[SD * CD];
    discrete_dynamics(m, xs[i], us + i * CD, dt, &xn, jx, ju);
    double cx[SD], cu[CD], cxx[SD * SD], cuu[CD * CD];
    stage_cost(c, xs[i], us + i * CD, i, cx, cu, cxx, cuu);

    double jxt[SD * SD], jut[CD * SD];
    transpose<SD, SD>(jx, jxt);
    transpose<SD, CD>(ju, jut);
    double qx[SD], qu[CD];
    matvec<SD, SD>(jxt, vx, qx);
    for (int k = 0; k < SD; ++k) qx[k] += cx[k];
    matvec<CD, SD>(jut, vx, qu);
    for (int k = 0; k < CD; ++k) qu[k] += cu[k];
    double vjx[SD * SD], vju[SD * CD];
    matmul<SD, SD, SD>(vxx, jx, vjx);
    matmul<SD, SD, CD>(vxx, ju, vju);
    double qxx[SD * SD];
    matmul<SD, SD, SD>(jxt, vjx, qxx);
    for (int k = 0; k < SD * SD; ++k) qxx[k] += cxx[k];
    double quu[CD * CD], qxu[SD * CD];
    matmul<CD, SD, CD>(jut, vju, quu);
    for (int k = 0; k < CD * CD; ++k) quu[k] += cuu[k];
    matmul<SD, SD, CD>(jxt, vju, qxu);  // C.xu == 0

    // solve Quu [k | K] = -[qu | qxu'] (4 x 13)
    double rhs[CD * (1 + SD)], sol[CD * (1 + SD)];
    for (int r = 0; r < CD; ++r) {
      rhs[r * (1 + SD)] = qu[r];
      for (int col = 0; col < SD; ++col)
        rhs[r * (1 + SD) + 1 + col] = qxu[col * CD + r];
    }
    if (!chol_solve<CD, 1 + SD>(quu, rhs, sol)) return false;
    double* k_i = ks + i * CD;
    double* bk_i = big_ks + i * CD * SD;
    for (int r = 0; r < CD; ++r) {
      k_i[r] = -sol[r * (1 + SD)];
      for (int col = 0; col < SD; ++col)
        bk_i[r * SD + col] = -sol[r * (1 + SD) + 1 + col];
    }

    double quu_k[CD];
    matvec<CD, CD>(quu, k_i, quu_k);
    double bkt[SD * CD];
    transpose<CD, SD>(bk_i, bkt);
    double t1[SD];
    matvec<SD, CD>(bkt, quu_k, t1);
    for (int k = 0; k < SD; ++k) vx[k] = qx[k] - t1[k];
    double qb[CD * SD], t2[SD * SD];
    matmul<CD, CD, SD>(quu, bk_i, qb);
    matmul<SD, CD, SD>(bkt, qb, t2);
    for (int k = 0; k < SD * SD; ++k) vxx[k] = qxx[k] - t2[k];
    for (int r = 0; r < CD; ++r) *qutk += qu[r] * k_i[r];
    for (int r = 0; r < CD; ++r) *ktquuk += k_i[r] * quu_k[r];
  }
  return true;
}

void forward_sim(const Model& m, const State* xs, const double* us,
                 const double* ks, const double* big_ks, double alpha, int n,
                 double dt, State* out_xs, double* out_us) {
  State x = xs[0];
  for (int i = 0; i < n; ++i) {
    double dx[SD];
    state_minus(x, xs[i], dx, nullptr);
    double* u = out_us + i * CD;
    for (int r = 0; r < CD; ++r) {
      double fb = 0;
      for (int col = 0; col < SD; ++col)
        fb += big_ks[i * CD * SD + r * SD + col] * dx[col];
      u[r] = us[i * CD + r] + alpha * ks[i * CD + r] + fb;
    }
    out_xs[i] = x;
    State xn;
    discrete_dynamics(m, x, u, dt, &xn, nullptr, nullptr);
    x = xn;
  }
}

}  // namespace

extern "C" {

// States packed per stage as 13 doubles: quat wxyz(4), trans(3), vel(6).
// Returns status: 0 = max_iters, 1 = converged, 2 = line search failed,
// -1 = Quu not positive definite (reference LDLT would also fail there).
int qilqr_solve(double mass, const double* inertia, double arm_length,
                double kappa, double g, const double* q_mat,
                const double* r_mat, const double* desired_states_packed,
                const double* desired_controls, const double* init_states_packed,
                const double* init_controls, int n, double dt,
                double ls_step_update, double ls_frac, int ls_max_iters,
                double rtol, double atol, int max_iters, double* out_states_packed,
                double* out_controls, double* out_cost, int* out_iters) {
  Model model;
  model_init(&model, mass, inertia, arm_length, kappa, g);

  auto unpack = [](const double* p, State* s, int n_pts) {
    for (int i = 0; i < n_pts; ++i) {
      const double* q = p + i * 13;
      const double w = q[0], x = q[1], y = q[2], z = q[3];
      double* r = s[i].pose.r;
      r[0] = 1 - 2 * (y * y + z * z); r[1] = 2 * (x * y - w * z); r[2] = 2 * (x * z + w * y);
      r[3] = 2 * (x * y + w * z); r[4] = 1 - 2 * (x * x + z * z); r[5] = 2 * (y * z - w * x);
      r[6] = 2 * (x * z - w * y); r[7] = 2 * (y * z + w * x); r[8] = 1 - 2 * (x * x + y * y);
      for (int k = 0; k < 3; ++k) s[i].pose.t[k] = q[4 + k];
      for (int k = 0; k < 6; ++k) s[i].vel[k] = q[7 + k];
    }
  };

  State* desired = new State[n];
  State* xs = new State[n];
  State* cand = new State[n];
  double* us = new double[n * CD];
  double* cand_us = new double[n * CD];
  double* ks = new double[n * CD];
  double* big_ks = new double[n * CD * SD];
  unpack(desired_states_packed, desired, n);
  unpack(init_states_packed, xs, n);
  std::memcpy(us, init_controls, sizeof(double) * n * CD);

  Cost cost{q_mat, r_mat, desired, desired_controls};
  int status = 0;
  double new_cost = cost_trajectory(cost, xs, us, n);
  int it = 0;
  // ilqr.hh:53-87 semantics: trip-0 full step; pre/post checks for i > 0.
  for (; it < max_iters;) {
    double qutk, ktquuk;
    if (!backwards_pass(model, cost, xs, us, n, dt, ks, big_ks, &qutk, &ktquuk)) {
      status = -1;
      break;
    }
    const double current = new_cost;
    const double expected = current + qutk + 0.5 * ktquuk;
    auto converged = [&](double a, double b) {
      const double d = std::fabs(a - b);
      return d / std::fabs(a) < rtol || d < atol;
    };
    if (it > 0 && converged(current, expected)) {
      status = 1;
      break;
    }
    if (it == 0) {
      forward_sim(model, xs, us, ks, big_ks, 1.0, n, dt, cand, cand_us);
      std::swap(xs, cand);
      std::swap(us, cand_us);
      new_cost = cost_trajectory(cost, xs, us, n);
      ++it;
      continue;
    }
    // backtracking line search (ilqr.hh:174-194)
    double alpha = 1.0;
    bool accepted = false;
    for (int j = 0; j < ls_max_iters; ++j) {
      forward_sim(model, xs, us, ks, big_ks, alpha, n, dt, cand, cand_us);
      const double cand_cost = cost_trajectory(cost, cand, cand_us, n);
      const double desired_red = ls_frac * (alpha * qutk + 0.5 * alpha * alpha * ktquuk);
      if (cand_cost - current < desired_red) {
        accepted = true;
        new_cost = cand_cost;
        break;
      }
      alpha *= ls_step_update;
    }
    std::swap(xs, cand);
    std::swap(us, cand_us);
    ++it;
    if (!accepted) {
      new_cost = cost_trajectory(cost, xs, us, n);
      status = 2;
      break;
    }
    if (converged(current, new_cost)) {
      status = 1;
      break;
    }
  }

  // pack outputs (rotation matrix -> quaternion wxyz)
  for (int i = 0; i < n; ++i) {
    const double* r = xs[i].pose.r;
    double* o = out_states_packed + i * 13;
    const double tr = r[0] + r[4] + r[8];
    double w, x, y, z;
    if (tr > 0) {
      const double s = std::sqrt(tr + 1.0) * 2;
      w = 0.25 * s; x = (r[7] - r[5]) / s; y = (r[2] - r[6]) / s; z = (r[3] - r[1]) / s;
    } else if (r[0] > r[4] && r[0] > r[8]) {
      const double s = std::sqrt(1.0 + r[0] - r[4] - r[8]) * 2;
      w = (r[7] - r[5]) / s; x = 0.25 * s; y = (r[1] + r[3]) / s; z = (r[2] + r[6]) / s;
    } else if (r[4] > r[8]) {
      const double s = std::sqrt(1.0 + r[4] - r[0] - r[8]) * 2;
      w = (r[2] - r[6]) / s; x = (r[1] + r[3]) / s; y = 0.25 * s; z = (r[5] + r[7]) / s;
    } else {
      const double s = std::sqrt(1.0 + r[8] - r[0] - r[4]) * 2;
      w = (r[3] - r[1]) / s; x = (r[2] + r[6]) / s; y = (r[5] + r[7]) / s; z = 0.25 * s;
    }
    o[0] = w; o[1] = x; o[2] = y; o[3] = z;
    for (int k = 0; k < 3; ++k) o[4 + k] = xs[i].pose.t[k];
    for (int k = 0; k < 6; ++k) o[7 + k] = xs[i].vel[k];
  }
  std::memcpy(out_controls, us, sizeof(double) * n * CD);
  *out_cost = new_cost;
  *out_iters = it;

  delete[] desired;
  delete[] xs;
  delete[] cand;
  delete[] us;
  delete[] cand_us;
  delete[] ks;
  delete[] big_ks;
  return status;
}

}  // extern "C"
