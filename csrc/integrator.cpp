// gpmpc_tpu native host integrator.
//
// First-party C++ replacement for the role SUNDIALS CVODES plays in the
// reference stack (adaptive-step ODE integration for plant simulation /
// "exact" discretization / training-data generation; SURVEY.md section 2.2).
// The TPU compute path uses fixed-step RK4 under lax.scan; this library is
// the high-accuracy HOST-side truth source: an embedded Dormand-Prince
// RK5(4) pair with PI step-size control and dense multi-step simulation.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).  The shipped
// plant families (four-tank, kinematic car) are implemented natively and
// selected by id; arbitrary Python ODEs can be integrated through the
// callback entry point.
//
// Build: make -C csrc   (produces gpmpc_tpu/native/libgpmpc.so)

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

constexpr int kMaxDim = 32;

// ---------------------------------------------------------------- systems

// Quadruple-tank (Johansson) — params layout:
// [A1 A2 A3 A4 a1 a2 a3 a4 g k1 k2 gamma1 gamma2]
void four_tank_ode(const double* p, const double* x, const double* u,
                   double* dx) {
  auto q = [&](int i) {
    return std::sqrt(2.0 * p[8] * std::max(x[i], 1e-6));
  };
  dx[0] = -p[4] / p[0] * q(0) + p[6] / p[0] * q(2)
          + p[11] * p[9] / p[0] * u[0];
  dx[1] = -p[5] / p[1] * q(1) + p[7] / p[1] * q(3)
          + p[12] * p[10] / p[1] * u[1];
  dx[2] = -p[6] / p[2] * q(2) + (1.0 - p[12]) * p[10] / p[2] * u[1];
  dx[3] = -p[7] / p[3] * q(3) + (1.0 - p[11]) * p[9] / p[3] * u[0];
}

// Kinematic bicycle car — params layout: [lf lr]
void car_ode(const double* p, const double* x, const double* u, double* dx) {
  const double beta = std::atan(p[1] / (p[0] + p[1]) * std::tan(u[1]));
  dx[0] = x[3] * std::cos(x[2] + beta);
  dx[1] = x[3] * std::sin(x[2] + beta);
  dx[2] = x[3] / p[1] * std::sin(beta);
  dx[3] = u[0];
}

typedef void (*ode_cb)(const double* x, const double* u, double* dx,
                       void* ctx);

struct OdeSpec {
  int system_id;        // 0 = callback, 1 = four-tank, 2 = car
  const double* params;
  ode_cb cb;
  void* ctx;
};

inline void eval_ode(const OdeSpec& s, const double* x, const double* u,
                     double* dx) {
  switch (s.system_id) {
    case 1: four_tank_ode(s.params, x, u, dx); break;
    case 2: car_ode(s.params, x, u, dx); break;
    default: s.cb(x, u, dx, s.ctx); break;
  }
}

// --------------------------------------------- Dormand-Prince RK5(4) pair

// Butcher tableau (DOPRI5)
const double kC[7] = {0.0, 1.0 / 5, 3.0 / 10, 4.0 / 5, 8.0 / 9, 1.0, 1.0};
const double kA[7][6] = {
    {},
    {1.0 / 5},
    {3.0 / 40, 9.0 / 40},
    {44.0 / 45, -56.0 / 15, 32.0 / 9},
    {19372.0 / 6561, -25360.0 / 2187, 64448.0 / 6561, -212.0 / 729},
    {9017.0 / 3168, -355.0 / 33, 46732.0 / 5247, 49.0 / 176,
     -5103.0 / 18656},
    {35.0 / 384, 0.0, 500.0 / 1113, 125.0 / 192, -2187.0 / 6784,
     11.0 / 84},
};
const double kB5[7] = {35.0 / 384, 0.0, 500.0 / 1113, 125.0 / 192,
                       -2187.0 / 6784, 11.0 / 84, 0.0};
const double kB4[7] = {5179.0 / 57600, 0.0, 7571.0 / 16695, 393.0 / 640,
                       -92097.0 / 339200, 187.0 / 2100, 1.0 / 40};

// Integrate from t=0 to t=t1 with fixed control input u.
// Returns 0 on success, 1 if max_steps exhausted.
int dopri5(const OdeSpec& spec, int nx, const double* x0, const double* u,
           double t1, double rtol, double atol, double* x_out,
           long max_steps = 100000) {
  double x[kMaxDim], xs[kMaxDim], xe[kMaxDim], k[7][kMaxDim];
  std::memcpy(x, x0, nx * sizeof(double));
  double t = 0.0;
  double h = t1 / 100.0;
  const double hmin = t1 * 1e-14;
  long steps = 0;
  double err_prev = 1.0;

  while (t < t1) {
    if (steps++ > max_steps) return 1;
    h = std::min(h, t1 - t);
    // stages
    eval_ode(spec, x, u, k[0]);
    for (int s = 1; s < 7; ++s) {
      for (int i = 0; i < nx; ++i) {
        double acc = x[i];
        for (int j = 0; j < s; ++j) acc += h * kA[s][j] * k[j][i];
        xs[i] = acc;
      }
      eval_ode(spec, xs, u, k[s]);
    }
    // 5th-order solution + embedded error
    double err = 0.0;
    for (int i = 0; i < nx; ++i) {
      double x5 = x[i], x4 = x[i];
      for (int s = 0; s < 7; ++s) {
        x5 += h * kB5[s] * k[s][i];
        x4 += h * kB4[s] * k[s][i];
      }
      xe[i] = x5;
      const double sc = atol + rtol * std::max(std::fabs(x[i]),
                                               std::fabs(x5));
      const double e = (x5 - x4) / sc;
      err += e * e;
    }
    err = std::sqrt(err / nx);

    if (err <= 1.0 || h <= hmin) {
      t += h;
      std::memcpy(x, xe, nx * sizeof(double));
      err_prev = std::max(err, 1e-10);
    }
    // PI step-size controller (beta = 0.04 stabilization)
    const double fac = 0.9 * std::pow(std::max(err, 1e-10), -0.2)
                       * std::pow(err_prev, 0.04);
    h *= std::min(5.0, std::max(0.2, fac));
    h = std::max(h, hmin);
  }
  std::memcpy(x_out, x, nx * sizeof(double));
  return 0;
}

}  // namespace

extern "C" {

// One-step integration over dt with constant input.
int gpmpc_integrate(int system_id, const double* params,
                    ode_cb cb, void* ctx,
                    const double* x0, int nx, const double* u, int nu,
                    double dt, double rtol, double atol, double* x_out) {
  (void)nu;
  if (nx > kMaxDim) return 2;
  OdeSpec spec{system_id, params, cb, ctx};
  return dopri5(spec, nx, x0, u, dt, rtol, atol, x_out);
}

// Multi-step simulation under a control sequence u_seq (n_steps x nu),
// writing the trajectory (n_steps+1 x nx) including x0.
int gpmpc_sim(int system_id, const double* params,
              ode_cb cb, void* ctx,
              const double* x0, int nx, const double* u_seq, int nu,
              int n_steps, double dt, double rtol, double atol,
              int clip_negative, double* traj_out) {
  if (nx > kMaxDim) return 2;
  OdeSpec spec{system_id, params, cb, ctx};
  std::memcpy(traj_out, x0, nx * sizeof(double));
  double x[kMaxDim];
  std::memcpy(x, x0, nx * sizeof(double));
  for (int s = 0; s < n_steps; ++s) {
    double xn[kMaxDim];
    int rc = dopri5(spec, nx, x, u_seq + s * nu, dt, rtol, atol, xn);
    if (rc) return rc;
    if (clip_negative) {
      for (int i = 0; i < nx; ++i) xn[i] = std::max(xn[i], 0.0);
    }
    std::memcpy(x, xn, nx * sizeof(double));
    std::memcpy(traj_out + (s + 1) * nx, x, nx * sizeof(double));
  }
  return 0;
}

}  // extern "C"
