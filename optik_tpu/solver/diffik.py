"""Differential IK: velocity-limited Cartesian tracking as a batched QP.

Parity target: kylc/optik ``Robot::diff_ik`` (lib.rs:101-239), which solves

    max_{v, alpha} alpha
      s.t.  0 <= alpha <= 1                (move as far as possible ...)
            -v_max <= v <= v_max           (... within joint velocity limits)
            J_W(q) v = alpha * V_WE        (... along the commanded direction)

as a Clarabel conic LP.  Here it is one lane of the batched ADMM QP solver
(solver/qp.py): decision vector x = [v; alpha], a tiny Tikhonov term
(1e-9 |v|^2) makes P positive definite for ADMM without measurably moving the
LP optimum, and the -100 alpha reward mirrors the reference's cost
(lib.rs:206).  The local-frame Jacobian is rotated into the world frame
exactly as lib.rs:184-189 does.

Returns (alpha, v, ok); ``ok`` mirrors Clarabel's Solved status and is based
on the final KKT residuals.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import kinematics as K
from . import qp
from ..utils.precision import with_f32_matmuls

# Residual threshold for declaring a solve successful.  The reference's
# contract checks alpha/velocity bounds at 1e-6 (test_ik.rs:200-205); polish
# typically leaves residuals ~1e-10.
_RES_TOL = 1e-6
_REG = 1e-9
_ALPHA_REWARD = -100.0


def _build_qp(params: K.ChainParams, x0, v_we, v_max, ee_r, ee_t):
    n = params.num_positions
    dtype = x0.dtype

    ee_rot, ee_pos, j_local = K.fk_and_jacobian(params, x0, ee_r, ee_t)
    # Rotate the local (EE-frame) Jacobian into the world frame: both the
    # linear and angular row blocks are premultiplied by R_WE (lib.rs:184-189).
    j_w = jnp.concatenate([ee_rot @ j_local[:3], ee_rot @ j_local[3:]], axis=0)

    p = _REG * jnp.eye(n + 1, dtype=dtype)
    qv = jnp.concatenate([jnp.zeros(n, dtype),
                          jnp.asarray([_ALPHA_REWARD], dtype)])

    # Rows: [J_W | -V] (equality), [I | 0] (velocity box), [0 | 1] (alpha box)
    a_eq = jnp.concatenate([j_w, -v_we[:, None]], axis=1)          # (6, n+1)
    a_v = jnp.concatenate([jnp.eye(n, dtype=dtype),
                           jnp.zeros((n, 1), dtype)], axis=1)       # (n, n+1)
    a_alpha = jnp.concatenate([jnp.zeros((1, n), dtype),
                               jnp.ones((1, 1), dtype)], axis=1)    # (1, n+1)
    a = jnp.concatenate([a_eq, a_v, a_alpha], axis=0)

    zero6 = jnp.zeros(6, dtype)
    l = jnp.concatenate([zero6, -v_max, jnp.zeros(1, dtype)])
    u = jnp.concatenate([zero6, v_max, jnp.ones(1, dtype)])
    return p, qv, a, l, u


def diff_ik_one(params: K.ChainParams, x0, v_we, v_max,
                ee_r: Optional[jnp.ndarray] = None,
                ee_t: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single diff-IK step: returns (alpha, v (A,), ok)."""
    return _diff_ik_jit(params, x0, v_we, v_max, ee_r, ee_t)


@with_f32_matmuls
@jax.jit
def _diff_ik_jit(params, x0, v_we, v_max, ee_r, ee_t):
    p, qv, a, l, u = _build_qp(params, x0, v_we, v_max, ee_r, ee_t)
    sol = qp.solve(p, qv, a, l, u)
    n = params.num_positions
    ok = (sol.primal_res < _RES_TOL) & jnp.all(jnp.isfinite(sol.x))
    return sol.x[n], sol.x[:n], ok


@with_f32_matmuls
@jax.jit
def diff_ik_batch(params, x0, v_we, v_max, ee_r=None, ee_t=None):
    """Batched diff-IK: (B, A), (B, 6), (B, A) -> (alpha (B,), v (B, A), ok (B,))."""
    def build(x0i, vi, vmi):
        return _build_qp(params, x0i, vi, vmi, ee_r, ee_t)

    p, qv, a, l, u = jax.vmap(build)(x0, v_we, v_max)
    sol = qp.solve(p, qv, a, l, u)
    n = params.num_positions
    ok = (sol.primal_res < _RES_TOL) & jnp.all(jnp.isfinite(sol.x), axis=-1)
    return sol.x[:, n], sol.x[:, :n], ok
