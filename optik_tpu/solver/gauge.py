"""Exact zonotope-gauge solver for the differential-IK LP (SoA, batched).

The reference solves diff-IK as a Clarabel conic LP per call
(kylc/optik crates/optik/src/lib.rs:101-239):

    max_{v, alpha} alpha
      s.t.  J_W(q) v = alpha * V,   |v_i| <= vmax_i,   0 <= alpha <= 1.

Round-3 replaced Clarabel with a batched 800-iteration ADMM (solver/qp.py)
— correct, but CPU-class on TPU (~24k steps/s: tiny (n+7)-dim AoS matrices
hit the tile-padding pathology ops/soa.py documents).  This module replaces
the *algorithm* instead of the backend, exploiting the LP's geometry:

The image of the velocity box under J_W is a **zonotope**
Z = { sum_i u_i * g_i : |u_i| <= 1 } with generators g_i = vmax_i * J_i.
The optimal alpha is min(1, t*) where t* = max { t : t V in Z } is the exit
parameter of the ray {t V} through Z — the reciprocal gauge of V.  For any
direction w with w.V != 0, convexity gives the *cut*

    t_w = h_Z(w) / |w.V|  >=  t*,      h_Z(w) = sum_i |w.g_i|,

with equality when w supports the exit facet.  Every facet of a
full-dimensional zonotope in R^6 is spanned by 5 generators, so enumerating
the C(n, 5) five-subsets' normals and taking the minimum cut yields t*
exactly (generic position) and a feasible upper bound always — the method
can never overshoot the LP optimum.  The boundary point recovers in closed
form: out-of-facet coordinates sit at their bounds (u_i = sign(w.g_i)), the
5 in-facet coordinates solve a tiny consistent least-squares system, and
scaling by alpha / t* maps the facet point to the solution (the box is
symmetric and star-shaped, so the scaled point stays feasible).

Everything is a fixed unrolled computation over lane-shaped arrays (SoA:
small dims in Python lists, the batch as the only array axis) — zero
iterations, zero data-dependent control flow, exact answers.  This is the
same redesign step the IK path took: replace the iterative host algorithm
with the problem's closed-form batched geometry.

Degenerate cases (rank-deficient J, V orthogonal to the reachable space,
ties) can make the minimum cut conservative (t < t*) but never infeasible;
the caller's tracking-residual gate stays the honest success contract.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import soa

# Largest joint count served by the exact facet enumeration: C(n, 5)
# subsets are unrolled at trace time (n=6 -> 6, n=7 -> 21).  n=8 (56
# subsets, ~50k-op graph) measured PATHOLOGICAL XLA:CPU compile times
# (>9 min even in f32 — the optimizer chokes on the long Gram-Schmidt
# dependency chains), so 8+ joints fall back to the iterative ADMM path
# (solver/diffik.py handles the routing).
MAX_EXACT_N = 7
MIN_EXACT_N = 5

_TINY = 1e-30


def _facet_normal(cols: Sequence[soa.Vec]):
    """Unit normal to span(cols) (5 six-vectors), lane-wise.

    Modified Gram-Schmidt orthonormalizes the columns, then the normal is
    the largest column of the complement projector I - Q Q^T — picked by
    residual norm, which is stable for any conditioning (a degenerate
    subset yields *some* unit direction, which still produces a valid cut;
    see module docstring).
    """
    qvecs = []
    for col in cols:
        c = list(col)
        for qv in qvecs:
            d = soa.vec_dot(qv, c)
            c = [c[i] - d * qv[i] for i in range(6)]
        inv = jax.lax.rsqrt(jnp.maximum(soa.vec_dot(c, c), _TINY))
        qvecs.append([c[i] * inv for i in range(6)])

    # ||(I - QQ^T) e_k||^2 = 1 - sum_m Q[k,m]^2 (orthonormal columns).
    nk = [1.0 - sum(qv[k] * qv[k] for qv in qvecs) for k in range(6)]

    # argmax_k nk, then w = e_k* - sum_m Q[k*,m] q_m, normalized.
    best = nk[0]
    coef = [qv[0] for qv in qvecs]
    ek: List = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    for k in range(1, 6):
        better = nk[k] > best
        best = jnp.where(better, nk[k], best)
        coef = [jnp.where(better, qv[k], cm) for qv, cm in zip(qvecs, coef)]
        ek = [jnp.where(better, 1.0 if j == k else 0.0, ek[j])
              for j in range(6)]
    w = [ek[j] - sum(cm * qv[j] for cm, qv in zip(coef, qvecs))
         for j in range(6)]
    inv = jax.lax.rsqrt(jnp.maximum(best, _TINY))
    return [w[j] * inv for j in range(6)]


def gauge_solve(gens: Sequence[soa.Vec], v: soa.Vec
                ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Exit parameter and boundary coordinates of the ray {t v} through
    the zonotope spanned by ``gens``.

    ``gens`` is a length-n list of 6-component generator vectors (lane
    arrays); ``v`` a 6-component direction.  Returns ``(t, u)``: ``t``
    (lane-shaped; +inf when every cut degenerates) such that ``t * v`` is
    on the zonotope boundary, and unit-box coordinates ``u`` (length n)
    with ``sum_i u_i gens[i] ~= t * v`` and ``|u_i| <= 1`` (up to
    roundoff) at any finite ``t``.
    """
    n = len(gens)
    if n < MIN_EXACT_N:
        raise ValueError(f"gauge_solve needs >= {MIN_EXACT_N} generators")
    subsets = list(itertools.combinations(range(n), 5))

    lane = jnp.broadcast_shapes(*[jnp.shape(c) for c in v])
    dtype = v[0].dtype if hasattr(v[0], "dtype") else jnp.float32

    best_t = jnp.full(lane, jnp.inf, dtype)
    best_w = [jnp.zeros(lane, dtype) for _ in range(6)]
    best_id = jnp.zeros(lane, jnp.int32)

    # Cut-validity floor: |w.v| must clear the f32 noise floor of the dot
    # products, RELATIVE to |v|.  At rank-deficient J (exactly singular
    # configurations), every spanning subset's normal is orthogonal to
    # range(J); if v lies in the range, both w.v and h are pure roundoff
    # and their ratio is garbage — those cuts must be excluded, leaving
    # t = +inf, which the caller reports as ok=False (the facet
    # enumeration cannot certify flat zonotopes; measure-zero configs).
    # A *genuine* near-parallel facet whose cut this floor excludes has
    # t = h/|d| >= h / (floor) — huge, so exclusion never tightens alpha
    # below min(1, t*); any overshoot is caught by the caller's tracking
    # gate.
    vinf = jnp.abs(v[0])
    for k in range(1, 6):
        vinf = jnp.maximum(vinf, jnp.abs(v[k]))
    d_floor = 1e-5 * vinf

    for c, sub in enumerate(subsets):
        w = _facet_normal([gens[i] for i in sub])
        d = soa.vec_dot(w, v)
        s = jnp.where(d < 0, -1.0, 1.0)
        dabs = jnp.abs(d)
        h = soa.ssum([jnp.abs(soa.vec_dot(w, gens[i])) for i in range(n)])
        t_c = jnp.where(dabs > d_floor, h / jnp.maximum(dabs, _TINY),
                        jnp.inf)
        better = t_c < best_t
        best_t = jnp.where(better, t_c, best_t)
        best_w = [jnp.where(better, s * w[j], best_w[j]) for j in range(6)]
        best_id = jnp.where(better, c, best_id)

    # --- boundary-point recovery on the winning facet ---------------------
    # Membership mask mu_i = 1 when column i spans the winning facet.
    mu = [soa.ssum([(best_id == c).astype(dtype)
                    for c, sub in enumerate(subsets) if i in sub])
          for i in range(n)]
    a_dots = [soa.vec_dot(best_w, gens[i]) for i in range(n)]
    u_out = [jnp.where(a >= 0, 1.0, -1.0) for a in a_dots]

    # Finite stand-in for t on degenerate (all-cuts-invalid) lanes so the
    # recovery math stays NaN-free; the caller masks those lanes out.
    t_f = jnp.where(jnp.isfinite(best_t), best_t, 0.0)

    # Residual target: r = t v - sum_{i not in facet} u_out_i g_i.
    r = [t_f * v[k]
         - soa.ssum([(1.0 - mu[i]) * u_out[i] * gens[i][k]
                     for i in range(n)]) for k in range(6)]

    # Masked normal equations over all n coordinates: facet rows solve the
    # least-squares system, non-facet rows are pinned to u_out (identity).
    gram = [[soa.vec_dot(gens[i], gens[j]) for j in range(n)]
            for i in range(n)]
    tr = soa.ssum([mu[i] * gram[i][i] for i in range(n)]) + _TINY
    reg = 1e-7 * tr
    kkt = [[mu[i] * mu[j] * gram[i][j] for j in range(n)] for i in range(n)]
    for i in range(n):
        kkt[i][i] = kkt[i][i] + jnp.where(mu[i] > 0, 0.0, 1.0)
    rhs = [mu[i] * soa.vec_dot(gens[i], r) + (1.0 - mu[i]) * u_out[i]
           for i in range(n)]
    kkt_reg = [[kkt[i][j] + (reg if i == j else 0.0) for j in range(n)]
               for i in range(n)]
    u = soa.cholesky_solve(kkt_reg, rhs)
    # Two iterative-refinement steps against the UNregularized system kill
    # both the Tikhonov bias (~reg / sigma_min^2 relative, measured at
    # ~1e-4 on short-link arms) and f32 factorization roundoff.
    for _ in range(2):
        resid = [rhs[i] - soa.ssum([kkt[i][j] * u[j] for j in range(n)])
                 for i in range(n)]
        du = soa.cholesky_solve(kkt_reg, resid)
        u = [u[i] + du[i] for i in range(n)]
    return best_t, [jnp.clip(ui, -1.0, 1.0) for ui in u]
