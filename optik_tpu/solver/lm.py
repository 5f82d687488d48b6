"""Batched, lockstep, bound-projected Levenberg-Marquardt for IK.

This replaces the reference's NLopt/SLSQP inner loop (kylc/optik
lib.rs:302-356 + the external C library): every restart seed of every pose
query is a *lane* of a flat batch that advances through fixed-shape LM
iterations in lockstep.  Per-lane stopping criteria become masks; the whole
loop is one ``lax.while_loop`` whose condition is "any lane still active and
iteration budget remains", so a converged batch exits early while shapes stay
static for XLA.

Why LM instead of SLSQP: the IK objective is a genuine least-squares problem
with a cheap analytic 6xA task Jacobian, so damped Gauss-Newton steps
(delta = -J^T (J J^T + lam I)^{-1} r, via the push-through identity — always a
6x6 solve regardless of DoF) converge in far fewer iterations than a
quasi-Newton method, and every step is a handful of tiny matmuls that
vectorize perfectly across lanes.  Bound constraints are handled by projecting
the step onto the joint-limit box (the reference hands bounds to SLSQP,
lib.rs:348-349).

Stopping-criterion semantics mirror NLopt's as configured by the reference
(lib.rs:345-356, success classification lib.rs:376-388):
  * ``f <= tol_f``                      -> stop, success (stopval)
  * ``|df| < tol_df`` on an accepted step -> stop; success only if the user
    set tol_df >= 0 (otherwise it is the stall heuristic, lib.rs:283-293)
  * ``max|dx| < tol_dx`` on an accepted step -> stop; success only if the
    user set tol_dx >= 0 (criterion disabled when tol_dx < 0, like NLopt)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import kinematics as K
from ..ops import objective as O


class LMOptions(NamedTuple):
    """Static solver options (closed over by jit)."""

    max_iters: int = 64
    tol_f: float = 1e-6
    tol_df: float = 1e-9       # effective value (stall heuristic applied)
    tol_dx: float = -1.0
    df_is_success: bool = False
    dx_is_success: bool = False
    f_is_success: bool = True  # tol_f >= 0 (lib.rs:376-377)
    lam_init: float = 1e-4
    lam_min: float = 1e-14
    lam_max: float = 1e10


class LMResult(NamedTuple):
    x: jnp.ndarray        # (L, A) final iterates
    f: jnp.ndarray        # (L,) final costs
    success: jnp.ndarray  # (L,) bool
    iters: jnp.ndarray    # () iterations executed
    # Restart index each lane ended on (continuous-reseed path only);
    # None when each lane ran exactly one restart.
    restart_index: Optional[jnp.ndarray] = None
    # Per-lane attempt iterations at first success, 0 if never (SoA path).
    succ_iters: Optional[jnp.ndarray] = None


def _cost_only(params, q, tgt_r, tgt_t, ee_r, ee_t, wl, wa):
    return O.objective(params, q, tgt_r, tgt_t, ee_r, ee_t, wl, wa)


def solve(params: K.ChainParams,
          x0: jnp.ndarray,              # (L, A) initial lanes
          tgt_r: jnp.ndarray,           # (L, 3, 3) or (3, 3)
          tgt_t: jnp.ndarray,           # (L, 3) or (3,)
          opts: LMOptions,
          ee_r: Optional[jnp.ndarray] = None,
          ee_t: Optional[jnp.ndarray] = None,
          wl=None, wa=None) -> LMResult:
    """Run lockstep projected LM on L lanes.

    Targets may be per-lane or a single broadcast pose.  Joint limits come
    from ``params``; lanes are clipped into the box at every step.
    """
    L, A = x0.shape
    dtype = x0.dtype
    lb, ub = params.lower, params.upper

    per_lane_tgt = tgt_r.ndim == 3

    def rj(q, tr, tt):
        return O.residual_and_jacobian(params, q, tr, tt, ee_r, ee_t, wl, wa)

    def cost(q, tr, tt):
        return _cost_only(params, q, tr, tt, ee_r, ee_t, wl, wa)

    if per_lane_tgt:
        rj_b = jax.vmap(rj, in_axes=(0, 0, 0))
        cost_b = jax.vmap(cost, in_axes=(0, 0, 0))
    else:
        rj_b = jax.vmap(rj, in_axes=(0, None, None))
        cost_b = jax.vmap(cost, in_axes=(0, None, None))

    eye6 = jnp.eye(6, dtype=dtype)

    f0 = cost_b(x0, tgt_r, tgt_t)
    # NLopt's stopval check applies to every evaluation including the first.
    success0 = (f0 <= opts.tol_f) if opts.f_is_success else jnp.zeros_like(f0, bool)
    stopped0 = success0
    # Guard NaN/inf seeds (e.g. unreachable targets producing degenerate FK).
    bad0 = ~jnp.isfinite(f0)
    stopped0 = stopped0 | bad0

    class Carry(NamedTuple):
        x: jnp.ndarray
        f: jnp.ndarray
        lam: jnp.ndarray
        nu: jnp.ndarray
        stopped: jnp.ndarray
        success: jnp.ndarray
        it: jnp.ndarray

    init = Carry(
        x=x0,
        f=f0,
        lam=jnp.full((L,), opts.lam_init, dtype=dtype),
        nu=jnp.full((L,), 2.0, dtype=dtype),
        stopped=stopped0,
        success=success0,
        it=jnp.zeros((), jnp.int32),
    )

    def cond(c: Carry):
        return (c.it < opts.max_iters) & ~jnp.all(c.stopped)

    def body(c: Carry) -> Carry:
        r, j = rj_b(c.x, tgt_r, tgt_t)            # (L, 6), (L, 6, A)
        # Damped GN via push-through: delta = -J^T (J J^T + lam I)^{-1} r.
        jjt = jnp.einsum("lia,lja->lij", j, j)     # (L, 6, 6)
        lam = c.lam[:, None, None]
        sys = jjt + lam * eye6
        # 6x6 SPD solve per lane (batched Cholesky).
        chol = jax.lax.linalg.cholesky(sys)
        y = jax.lax.linalg.triangular_solve(
            chol, r[..., None], left_side=True, lower=True)
        z = jax.lax.linalg.triangular_solve(
            chol, y, left_side=True, lower=True, transpose_a=True)
        delta = -jnp.einsum("lia,li->la", j, z[..., 0])  # (L, A)

        x_new = jnp.clip(c.x + delta, lb, ub)
        step = x_new - c.x                         # actual (projected) step
        f_new = cost_b(x_new, tgt_r, tgt_t)

        finite = jnp.isfinite(f_new)
        accept = (f_new < c.f) & finite

        # Nielsen gain-ratio damping: compare the actual decrease against the
        # GN model's predicted decrease -(2 r^T J d + |J d|^2) for the
        # *projected* step.  rho near 1 -> aggressive lambda shrink (fast
        # quadratic tail); rho small/negative -> grow lambda geometrically
        # with escalation factor nu (classic Marquardt would loop; lockstep
        # lanes just take the next iteration).
        w = jnp.einsum("lia,la->li", j, step)
        pred = -(2.0 * jnp.sum(r * w, axis=-1) + jnp.sum(w * w, axis=-1))
        rho = (c.f - f_new) / jnp.maximum(pred, 1e-300)
        good = accept & (pred > 0)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)

        x_next = jnp.where(accept[:, None], x_new, c.x)
        f_next = jnp.where(accept, f_new, c.f)
        lam_next = jnp.clip(
            jnp.where(good, c.lam * shrink, c.lam * c.nu),
            opts.lam_min, opts.lam_max)
        nu_next = jnp.where(good, 2.0, jnp.minimum(c.nu * 2.0, 64.0))

        # --- stopping criteria (only for lanes still running) -------------
        newly_f = (f_next <= opts.tol_f) if opts.f_is_success else jnp.zeros_like(accept)
        df = jnp.abs(c.f - f_next)
        newly_df = accept & (df < opts.tol_df)
        if opts.tol_dx >= 0.0:
            newly_dx = accept & jnp.all(jnp.abs(step) < opts.tol_dx, axis=-1)
        else:
            newly_dx = jnp.zeros_like(accept)
        # A lane whose damping has exploded is permanently stuck: stop it
        # (analogous to SLSQP line-search failure freeing the thread for a
        # new restart, lib.rs:283-293).
        newly_stuck = lam_next >= opts.lam_max

        run = ~c.stopped
        succ_now = newly_f
        if opts.df_is_success:
            succ_now = succ_now | newly_df
        if opts.dx_is_success:
            succ_now = succ_now | newly_dx
        success = c.success | (run & succ_now)
        stopped = c.stopped | (run & (newly_f | newly_df | newly_dx | newly_stuck))

        # Frozen lanes keep their state.
        x_out = jnp.where(c.stopped[:, None], c.x, x_next)
        f_out = jnp.where(c.stopped, c.f, f_next)
        lam_out = jnp.where(c.stopped, c.lam, lam_next)
        nu_out = jnp.where(c.stopped, c.nu, nu_next)

        return Carry(x=x_out, f=f_out, lam=lam_out, nu=nu_out,
                     stopped=stopped, success=success, it=c.it + 1)

    out = jax.lax.while_loop(cond, body, init)
    return LMResult(x=out.x, f=out.f, success=out.success, iters=out.it)
