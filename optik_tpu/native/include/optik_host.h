/* optik_host.h — C ABI of the optik_tpu native host runtime.
 *
 * The native counterpart of the reference's C layer
 * (kylc/optik crates/optik-cpp/src/lib.rs:26-183): serial-chain FK, EE-frame
 * geometric Jacobian, random-restart IK (latency path), and the
 * velocity-limited differential-IK step, over an opaque chain handle built
 * either from raw per-joint arrays or directly from URDF.
 *
 * Conventions:
 *  - poses are row-major 4x4 doubles (16 values);
 *  - Jacobians are row-major 6 x n, rows = [linear; angular] in the EE frame;
 *  - `ee_offset` pose pointers may be NULL (identity);
 *  - functions returning int use 1 = success, 0 = failure;
 *  - the caller owns all output buffers (no allocation crosses the ABI).
 */

#ifndef OPTIK_HOST_H_
#define OPTIK_HOST_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* --- chain construction -------------------------------------------------- */

/* Build a chain from folded per-joint arrays (n articulated joints):
 * origin_r n*9 row-major rotations, origin_t n*3, axis n*3 unit axes,
 * prismatic n flags, lower/upper n limits (may be +-inf), tip_r 9 / tip_t 3
 * trailing fixed transform.  Never fails; returns an owned handle. */
void* optik_host_chain_new(int n, const double* origin_r,
                           const double* origin_t, const double* axis,
                           const uint8_t* prismatic, const double* lower,
                           const double* upper, const double* tip_r,
                           const double* tip_t);

/* Parse URDF text / file and extract the base->ee chain (fixed joints are
 * folded).  On failure returns NULL and writes a NUL-terminated message into
 * err (truncated to err_len). */
void* optik_host_chain_from_urdf_str(const char* xml, const char* base_link,
                                     const char* ee_link, char* err,
                                     int err_len);
void* optik_host_chain_from_urdf_file(const char* path, const char* base_link,
                                      const char* ee_link, char* err,
                                      int err_len);

void optik_host_chain_free(void* chain);

/* --- introspection --------------------------------------------------------*/

int optik_host_num_positions(const void* chain);
void optik_host_joint_limits(const void* chain, double* lower, double* upper);

/* Uniform draw within the joint limits; deterministic per seed (unbounded
 * joints draw from [-pi, pi]). */
void optik_host_random_configuration(const void* chain, uint64_t seed,
                                     double* out);

/* --- kinematics ------------------------------------------------------------*/

void optik_host_fk(const void* chain, const double* q,
                   const double* ee_offset, double* pose16);
void optik_host_jacobian(const void* chain, const double* q,
                         const double* ee_offset, double* jac6xn);

/* --- solvers ---------------------------------------------------------------*/

/* Random-restart damped Gauss-Newton IK.  Restart 0 starts at x0; restart i
 * draws deterministically from stream rng_seed + i.  Success means the
 * squared log-pose error reached tol_f. */
int optik_host_ik(const void* chain, const double* target16, const double* x0,
                  const double* ee_offset, double tol_f, int max_iters,
                  int max_restarts, uint64_t rng_seed, double* x_out,
                  double* f_out);

/* Velocity-limited differential IK:
 *   max alpha  s.t.  0 <= alpha <= 1, -v_max <= v <= v_max,
 *                    J_W(x0) v = alpha * V_WE
 * v_we is the commanded world-frame spatial velocity [linear; angular]. */
int optik_host_diff_ik(const void* chain, const double* x0,
                       const double* v_we, const double* v_max,
                       const double* ee_offset, double* alpha_out,
                       double* v_out);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* OPTIK_HOST_H_ */
