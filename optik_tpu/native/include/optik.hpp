// optik.hpp — C++ RAII wrapper over the optik_tpu native host runtime.
//
// The C++ counterpart of the reference's Eigen wrapper
// (kylc/optik include/optik.hpp:29-105), dependency-free: poses are
// row-major 4x4 std::array<double, 16>, vectors are std::vector<double>.
// Move-only ownership of the underlying chain handle, exceptions for
// construction errors, bool + out-params for solver results (mirroring the
// reference's DoIk/DoDiffIk contract).
//
// Link against liboptik_host (see optik_tpu/native/CMakeLists.txt);
// examples/example.cpp is the reference driver.

#ifndef OPTIK_HPP_
#define OPTIK_HPP_

#include <array>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

#include "optik_host.h"

namespace optik {

using Pose = std::array<double, 16>;  // row-major 4x4

inline Pose IdentityPose() {
  return {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
}

// Solver parameters for Robot::DoIk.  The reference's wall-clock max_time is
// replaced by deterministic iteration/restart budgets (its SolverConfig
// counterpart lives at crates/optik-cpp/include/optik.hpp:18-27).
struct SolverConfig {
  double tol_f = 1e-6;
  int max_iters = 64;
  int max_restarts = 64;
  uint64_t rng_seed = 42;
};

class Robot {
 public:
  Robot(const Robot&) = delete;
  Robot& operator=(const Robot&) = delete;
  Robot(Robot&& other) noexcept : inner_(other.inner_) {
    other.inner_ = nullptr;
  }
  Robot& operator=(Robot&& other) noexcept {
    if (this != &other) {
      release();
      inner_ = other.inner_;
      other.inner_ = nullptr;
    }
    return *this;
  }
  ~Robot() { release(); }

  // Throws std::runtime_error with the parse/extraction message on failure.
  static Robot FromUrdfFile(const std::string& path,
                            const std::string& base_link,
                            const std::string& ee_link) {
    char err[512] = {0};
    void* ptr = optik_host_chain_from_urdf_file(
        path.c_str(), base_link.c_str(), ee_link.c_str(), err, sizeof(err));
    if (!ptr) throw std::runtime_error(err);
    return Robot(ptr);
  }

  static Robot FromUrdfStr(const std::string& urdf,
                           const std::string& base_link,
                           const std::string& ee_link) {
    char err[512] = {0};
    void* ptr = optik_host_chain_from_urdf_str(
        urdf.c_str(), base_link.c_str(), ee_link.c_str(), err, sizeof(err));
    if (!ptr) throw std::runtime_error(err);
    return Robot(ptr);
  }

  unsigned int num_positions() const noexcept {
    return static_cast<unsigned int>(optik_host_num_positions(inner_));
  }

  // (lower, upper) joint limit vectors; entries may be +-infinity.
  std::pair<std::vector<double>, std::vector<double>> JointLimits() const {
    const unsigned int n = num_positions();
    std::vector<double> lo(n), hi(n);
    optik_host_joint_limits(inner_, lo.data(), hi.data());
    return {std::move(lo), std::move(hi)};
  }

  // Deterministic uniform draw within the joint limits.
  std::vector<double> RandomConfiguration(uint64_t seed = 0) const {
    std::vector<double> q(num_positions());
    optik_host_random_configuration(inner_, seed, q.data());
    return q;
  }

  Pose DoFk(const std::vector<double>& q,
            const Pose* ee_offset = nullptr) const {
    Pose out;
    optik_host_fk(inner_, q.data(), ee_offset ? ee_offset->data() : nullptr,
                  out.data());
    return out;
  }

  // Row-major 6 x n Jacobian in the EE (local) frame, rows [linear; angular].
  std::vector<double> JointJacobian(const std::vector<double>& q,
                                    const Pose* ee_offset = nullptr) const {
    std::vector<double> jac(6 * num_positions());
    optik_host_jacobian(inner_, q.data(),
                        ee_offset ? ee_offset->data() : nullptr, jac.data());
    return jac;
  }

  // Random-restart IK; true + (q_out, cost_out) on success.
  bool DoIk(const SolverConfig& config, const Pose& target,
            const std::vector<double>& x0, std::vector<double>* q_out,
            double* cost_out, const Pose* ee_offset = nullptr) const {
    q_out->resize(num_positions());
    return optik_host_ik(inner_, target.data(), x0.data(),
                         ee_offset ? ee_offset->data() : nullptr, config.tol_f,
                         config.max_iters, config.max_restarts,
                         config.rng_seed, q_out->data(), cost_out) != 0;
  }

  // Velocity-limited differential IK; true + (alpha, v) on success.
  bool DoDiffIk(const std::vector<double>& x0,
                const std::array<double, 6>& v_we,
                const std::vector<double>& v_max, double* alpha_out,
                std::vector<double>* v_out,
                const Pose* ee_offset = nullptr) const {
    v_out->resize(num_positions());
    return optik_host_diff_ik(inner_, x0.data(), v_we.data(), v_max.data(),
                              ee_offset ? ee_offset->data() : nullptr,
                              alpha_out, v_out->data()) != 0;
  }

 private:
  explicit Robot(void* inner) : inner_(inner) {}
  void release() {
    if (inner_) {
      optik_host_chain_free(inner_);
      inner_ = nullptr;
    }
  }

  void* inner_ = nullptr;
};

}  // namespace optik

#endif  // OPTIK_HPP_
