"""IK objective: weighted squared SE(3) log pose error + analytic gradient.

Parity targets (kylc/optik crates/optik/src/objective.rs):

  * pose error e = log6(T_target^-1 * T_actual)      -> objective.rs:47-51
  * per-axis weighting by conjugation with R_target   -> objective.rs:7-38
    (rotate the error block into the world frame, scale, rotate back;
    skipped entirely when the weights are identity — here that skip is a
    *trace-time* decision because weights are static config)
  * cost = ||e||^2                                    -> objective.rs:54-57
  * gradient = 2 (W^2-weighted e)^T (Jlog6(X) J(q))   -> objective.rs:60-110,
    with the squared-weight subtlety at objective.rs:102-104.

The solver consumes the residual/Jacobian pair instead of the scalar
cost/gradient: with M = blockdiag(R^T diag(wl) R, R^T diag(wa) R) the cost is
||M e||^2, the residual r = M e and its Jacobian J_r = M Jlog6 J, so
grad = 2 J_r^T r reproduces the reference gradient exactly (M is symmetric
and M^2 conjugates the squared weights).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..math import se3
from . import kinematics as K

# Weight-is-identity threshold, matching objective.rs:5.
IDENTITY_EPS = 1e-20


def weights_are_identity(w) -> bool:
    """Static check (objective.rs:13,25) — decided at trace time."""
    if w is None:
        return True
    import numpy as np

    return bool(np.all(np.abs(np.asarray(w) - 1.0) <= IDENTITY_EPS))


def weight_matrix(tgt_r: jnp.ndarray, wl, wa) -> Optional[jnp.ndarray]:
    """The 6x6 symmetric weighting operator M, or None when identity.

    M = blockdiag(R^T diag(wl) R, R^T diag(wa) R) where R rotates target-frame
    vectors to world (the reference rotates into world, scales, rotates back:
    objective.rs:14-22).
    """
    lin_id = weights_are_identity(wl)
    ang_id = weights_are_identity(wa)
    if lin_id and ang_id:
        return None
    dtype = tgt_r.dtype
    eye = jnp.eye(3, dtype=dtype)

    def conj(w):
        wv = jnp.asarray(w, dtype=dtype)
        return jnp.einsum("...ji,j,...jk->...ik", tgt_r, wv, tgt_r)

    m_lin = eye if lin_id else conj(wl)
    m_ang = eye if ang_id else conj(wa)
    if lin_id:
        m_lin = jnp.broadcast_to(eye, m_ang.shape)
    if ang_id:
        m_ang = jnp.broadcast_to(eye, m_lin.shape)
    zero = jnp.zeros_like(m_lin)
    top = jnp.concatenate([m_lin, zero], axis=-1)
    bot = jnp.concatenate([zero, m_ang], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def pose_error(ee_r, ee_t, tgt_r, tgt_t) -> jnp.ndarray:
    """e = log6(T_target^-1 * T_actual), (..., 6) ordered [linear; angular]."""
    xr, xt = se3.inv_compose(tgt_r, tgt_t, ee_r, ee_t)
    return se3.log(xr, xt)


def objective(params: K.ChainParams, q, tgt_r, tgt_t,
              ee_r=None, ee_t=None, wl=None, wa=None) -> jnp.ndarray:
    """Scalar cost ||M e||^2 for a single configuration (objective.rs:40-57)."""
    r, t = K.fk_ee(params, q, ee_r, ee_t)
    e = pose_error(r, t, tgt_r, tgt_t)
    m = weight_matrix(tgt_r, wl, wa)
    if m is not None:
        e = m @ e
    return jnp.sum(e * e)


def residual_and_jacobian(params: K.ChainParams, q, tgt_r, tgt_t,
                          ee_r=None, ee_t=None, wl=None, wa=None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (residual, task Jacobian): r = M e (6,), J_r = M Jlog6 J (6, A).

    One FK scan feeds the pose error, the geometric Jacobian and the SE(3)
    log right-Jacobian — the whole hot loop of the reference's SLSQP callback
    (lib.rs:305-337) as a single fused function.  cost = sum(r*r) and
    grad = 2 r @ J_r.
    """
    r, t, jac = K.fk_and_jacobian(params, q, ee_r, ee_t)
    xr, xt = se3.inv_compose(tgt_r, tgt_t, r, t)
    e = se3.log(xr, xt)
    jlog = se3.right_jacobian(xr, xt)
    j_task = jlog @ jac
    m = weight_matrix(tgt_r, wl, wa)
    if m is not None:
        e = m @ e
        j_task = m @ j_task
    return e, j_task


def objective_grad(params: K.ChainParams, q, tgt_r, tgt_t,
                   ee_r=None, ee_t=None, wl=None, wa=None) -> jnp.ndarray:
    """Analytic gradient (A,), exactly the reference's closed form.

    Equals 2 r^T J_r from :func:`residual_and_jacobian`; kept as a separate
    entry point to mirror objective.rs:60-110 and for test oracles.
    """
    r, j = residual_and_jacobian(params, q, tgt_r, tgt_t, ee_r, ee_t, wl, wa)
    return 2.0 * (r @ j)
