"""Differential IK: velocity-limited Cartesian tracking as a batched QP.

Parity target: kylc/optik ``Robot::diff_ik`` (lib.rs:101-239), which solves

    max_{v, alpha} alpha
      s.t.  0 <= alpha <= 1                (move as far as possible ...)
            -v_max <= v <= v_max           (... within joint velocity limits)
            J_W(q) v = alpha * V_WE        (... along the commanded direction)

as a Clarabel conic LP.  Here it is one lane of the batched ADMM QP solver
(solver/qp.py): decision vector x = [v; alpha], a tiny Tikhonov term
(1e-9 |v|^2) makes P positive definite for ADMM without measurably moving the
LP optimum.  The alpha reward is -1, NOT the reference's -100 (lib.rs:206):
for an LP any negative coefficient yields the same argmax, the -100 is a
Clarabel-era scaling, and it inflates the equality duals by 100x — enough
to stall f32 ADMM below the success tolerance on loosely-constrained
states (measured: v_max=10 on the Panda fails at -100, converges to
alpha=1.0 exactly at -1).  The local-frame Jacobian is rotated into the
world frame exactly as lib.rs:184-189 does.

Returns (alpha, v, ok).  The returned iterate is PROJECTED onto the box
constraints (v clipped to +-v_max, alpha to [0, 1]) — a zero-cost exact
feasibility step, so the reference's bound contracts (alpha in [0,1]+-1e-6,
|v_i| <= v_max + 1e-6, test_ik.rs:200-205) hold by construction.  ``ok``
mirrors Clarabel's Solved status and gates on what remains after the
projection: the Cartesian tracking residual |J_W v - alpha V_WE| (primal)
and the KKT stationarity residual (optimality — this is what catches an
unconverged ADMM that parked at a feasible but suboptimal alpha).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import kinematics as K
from . import qp
from ..utils.precision import with_f32_matmuls

# Success thresholds (see module docstring).  Tracking: the behavioral
# contract asserts J_W v == alpha V_WE at 1e-5 (reference example + tests);
# polish typically leaves ~1e-8, but f32 cholesky rounding under vmap can
# reach ~3e-6 on marginal lanes, so the gate sits at the contract, not at
# the typical case.  Stationarity: with the -1 reward the duals are O(1),
# and an unconverged lane shows dr >> 1e-2 (measured 0.87).
_TRACK_TOL = 1e-5
_STAT_TOL = 1e-3
_REG = 1e-9
_ALPHA_REWARD = -1.0  # see module docstring: -100 breaks f32 dual scaling


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


def _finalize(a, v_max, sol, n):
    """Project onto the box, then judge success on one problem (vmap-able).

    v -> clip(+-v_max), alpha -> clip([0, 1]); tracking = |[J_W|-V] x|_inf
    on the projected point; stationarity = final KKT dual residual.
    """
    v = jnp.clip(sol.x[:n], -v_max, v_max)
    alpha = jnp.clip(sol.x[n], 0.0, 1.0)
    xc = jnp.concatenate([v, alpha[None]])
    track = jnp.max(jnp.abs(a[:6] @ xc))
    ok = ((track < _TRACK_TOL) & (sol.dual_res < _STAT_TOL)
          & jnp.all(jnp.isfinite(xc)))
    return alpha, v, ok


@with_f32_matmuls
@jax.jit
def _diff_ik_jit(params, x0, v_we, v_max, ee_r, ee_t):
    p, qv, a, l, u = _build_qp(params, x0, v_we, v_max, ee_r, ee_t)
    sol = qp.solve(p, qv, a, l, u)
    return _finalize(a, v_max, sol, params.num_positions)


@with_f32_matmuls
@jax.jit
def diff_ik_batch(params, x0, v_we, v_max, ee_r=None, ee_t=None):
    """Batched diff-IK: (B, A), (B, 6), (B, A) -> (alpha (B,), v (B, A), ok (B,))."""
    def build(x0i, vi, vmi):
        return _build_qp(params, x0i, vi, vmi, ee_r, ee_t)

    p, qv, a, l, u = jax.vmap(build)(x0, v_we, v_max)
    sol = qp.solve(p, qv, a, l, u)
    return jax.vmap(_finalize, in_axes=(0, 0, 0, None))(
        a, v_max, sol, params.num_positions)
