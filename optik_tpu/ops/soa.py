"""Structure-of-arrays (SoA) compute path: all math as scalar components.

Why this exists: the natural (L, 3, 3)/(L, 6, 6) array-of-structures layout
puts tiny 3/6-sized dimensions in the TPU tile minor positions, so every
3x3 matrix pads to an (8, 128) vector tile — ~40x wasted VPU work (measured:
the fused residual+Jacobian ran at ~5 GFLOP/s, see
benchmarks/profile_parts.py).  Here every small matrix and vector is a
Python list whose entries are (L,)-shaped arrays (or plain Python floats for
static chain constants, which XLA constant-folds), so the *lane* dimension is
the only array axis: XLA sees nothing but element-wise ops on (L,) vectors,
tiles them perfectly, and fuses the whole pipeline.

These functions are pure Python over anything that supports jnp arithmetic,
so the *same code* later runs inside a Pallas kernel body on VMEM blocks.

All formulas mirror optik_tpu.math.so3/se3 (which carry the reference
citations); equivalence with the array path is pinned by tests/test_soa.py.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..math.so3 import EPSILON

# A small matrix is a list of rows; a vector is a list of components.
# Components are (L,) arrays or python floats (static constants).
Mat = List[List]
Vec = List

# atan2 backend: Mosaic (Pallas TPU) has no atan2 primitive, so kernels
# switch to a branchless Cephes-style polynomial (f32-accurate, ~1e-7);
# everywhere else the exact jnp.arctan2 is used (f64 golden tests).
_APPROX_ATAN2 = False


class approx_atan2:
    """Context manager: trace atan2 as the polynomial approximation."""

    def __enter__(self):
        global _APPROX_ATAN2
        self._prev = _APPROX_ATAN2
        _APPROX_ATAN2 = True

    def __exit__(self, *exc):
        global _APPROX_ATAN2
        _APPROX_ATAN2 = self._prev


def _atan_nonneg(t):
    """atan(t) for t >= 0, branchless (Cephes atanf range reduction +
    degree-4 polynomial in t^2; public-domain constants)."""
    big = t > 2.414213562373095    # tan(3*pi/8)
    mid = (t > 0.4142135623730950) & ~big  # tan(pi/8)
    x = jnp.where(big, -1.0 / jnp.maximum(t, 1e-30),
                  jnp.where(mid, (t - 1.0) / (t + 1.0), t))
    y0 = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = x * x
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    return y0 + p * z * x + x


def atan2_nonneg(y, x):
    """atan2(y, x) restricted to y >= 0 (quadrants I/II), kernel-safe."""
    if not _APPROX_ATAN2:
        return jnp.arctan2(y, x)
    r = _atan_nonneg(y / jnp.maximum(jnp.abs(x), 1e-30))
    return jnp.where(x < 0, jnp.pi - r, r)


# --- generic small linear algebra (unrolled at trace time) -----------------


def mat_mul(a: Mat, b: Mat) -> Mat:
    n, k, m = len(a), len(b), len(b[0])
    return [[sum(a[i][p] * b[p][j] for p in range(k)) for j in range(m)]
            for i in range(n)]


def mat_vec(a: Mat, v: Vec) -> Vec:
    return [sum(a[i][j] * v[j] for j in range(len(v))) for i in range(len(a))]


def mat_tvec(a: Mat, v: Vec) -> Vec:
    """a^T v."""
    return [sum(a[j][i] * v[j] for j in range(len(a)))
            for i in range(len(a[0]))]


def mat_t(a: Mat) -> Mat:
    return [[a[j][i] for j in range(len(a))] for i in range(len(a[0]))]


def vec_add(u: Vec, v: Vec) -> Vec:
    return [ui + vi for ui, vi in zip(u, v)]


def vec_sub(u: Vec, v: Vec) -> Vec:
    return [ui - vi for ui, vi in zip(u, v)]


def vec_scale(u: Vec, s) -> Vec:
    return [ui * s for ui in u]


def vec_dot(u: Vec, v: Vec):
    return sum(ui * vi for ui, vi in zip(u, v))


def vec_cross(u: Vec, v: Vec) -> Vec:
    return [u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0]]


def cholesky_solve(a: Mat, b: Vec) -> Vec:
    """Unrolled SPD solve on components (same scheme as math/linalg.py)."""
    n = len(b)
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        inv_d = jnp.sqrt(jnp.maximum(s, 1e-30)) ** -1.0
        l[j][j] = inv_d
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s * l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s * l[i][i]
    return x


# --- SO(3) -----------------------------------------------------------------


def rodrigues(axis: Vec, angle) -> Mat:
    """R = I + sin(q) K + (1-cos(q)) K^2 for a (static) unit axis."""
    s = jnp.sin(angle)
    c1 = 1.0 - jnp.cos(angle)
    kx, ky, kz = axis
    return [
        [1.0 + c1 * (-(ky * ky) - kz * kz), -s * kz + c1 * kx * ky,
         s * ky + c1 * kx * kz],
        [s * kz + c1 * kx * ky, 1.0 + c1 * (-(kx * kx) - kz * kz),
         -s * kx + c1 * ky * kz],
        [-s * ky + c1 * kx * kz, s * kx + c1 * ky * kz,
         1.0 + c1 * (-(kx * kx) - ky * ky)],
    ]


def mat_to_quat(r: Mat) -> Vec:
    """Branchless Shepperd (see math/so3.py): returns (x, y, z, w)."""
    r00, r01, r02 = r[0]
    r10, r11, r12 = r[1]
    r20, r21, r22 = r[2]
    tw = 1.0 + r00 + r11 + r22
    tx = 1.0 + r00 - r11 - r22
    ty = 1.0 - r00 + r11 - r22
    tz = 1.0 - r00 - r11 + r22

    def ss(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    sw, sx, sy, sz = ss(tw), ss(tx), ss(ty), ss(tz)
    qw = [(r21 - r12) / sw, (r02 - r20) / sw, (r10 - r01) / sw, sw]
    qx = [sx, (r01 + r10) / sx, (r02 + r20) / sx, (r21 - r12) / sx]
    qy = [(r01 + r10) / sy, sy, (r12 + r21) / sy, (r02 - r20) / sy]
    qz = [(r02 + r20) / sz, (r12 + r21) / sz, sz, (r10 - r01) / sz]

    m_w = (tw >= tx) & (tw >= ty) & (tw >= tz)
    m_x = (~m_w) & (tx >= ty) & (tx >= tz)
    m_y = (~m_w) & (~m_x) & (ty >= tz)
    q = [jnp.where(m_w, qw[i], jnp.where(m_x, qx[i],
                                         jnp.where(m_y, qy[i], qz[i])))
         for i in range(4)]
    norm = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return [qi / norm for qi in q]


def quat_log(q: Vec) -> Vec:
    """Rotation-vector log of a unit quaternion (x, y, z, w)."""
    x, y, z, w = q
    sign = jnp.where(w < 0.0, -1.0, 1.0)
    x, y, z, w = x * sign, y * sign, z * sign, w * sign
    v2 = x * x + y * y + z * z
    small = v2 <= EPSILON
    v2s = jnp.where(small, 1.0, v2)
    vn = jnp.sqrt(v2s)
    exact = atan2_nonneg(vn, w) / vn
    w3 = w * w * w
    taylor = 1.0 / w - v2 / (3.0 * w3) + (v2 * v2) / (5.0 * w3 * w * w)
    t = 2.0 * jnp.where(small, taylor, exact)
    return [x * t, y * t, z * t]


def mat_log(r: Mat) -> Vec:
    return quat_log(mat_to_quat(r))


def add_hat_terms(diag, w: Vec, c_hat, c_hat2) -> Mat:
    """diag*I + c_hat*[w]_x + c_hat2*[w]_x^2, expanded."""
    wx, wy, wz = w
    w11, w22, w33 = wx * wx, wy * wy, wz * wz
    w12, w13, w23 = wx * wy, wx * wz, wy * wz
    return [
        [diag + c_hat2 * (-w22 - w33),
         -c_hat * wz + c_hat2 * w12,
         c_hat * wy + c_hat2 * w13],
        [c_hat * wz + c_hat2 * w12,
         diag + c_hat2 * (-w11 - w33),
         -c_hat * wx + c_hat2 * w23],
        [-c_hat * wy + c_hat2 * w13,
         c_hat * wx + c_hat2 * w23,
         diag + c_hat2 * (-w11 - w22)],
    ]


def _hat_coeffs(theta2):
    """a = sin(t)/t, b = (1-cos t)/t^2, branchless (math/so3.py)."""
    small = theta2 <= EPSILON
    t2s = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2s)
    s, c = jnp.sin(t), jnp.cos(t)
    t4 = theta2 * theta2
    a = jnp.where(small, 1.0 - theta2 / 6.0 + t4 / 120.0, s / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0 + t4 / 720.0, (1.0 - c) / t2s)
    return a, b, small, t2s


def so3_right_jacobian_from_w(w: Vec) -> Mat:
    theta2 = vec_dot(w, w)
    a, b, small, t2s = _hat_coeffs(theta2)
    t4 = theta2 * theta2
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0,
                  (1.0 - a) / t2s)
    e = (b - 2.0 * c) / (2.0 * a)
    return add_hat_terms(1.0, w, 0.5, e)


# --- SE(3) -----------------------------------------------------------------


def se3_log_from_w(w: Vec, t: Vec) -> Vec:
    """[v; w] with v = V^{-1} t, given w = log(R) (see math/se3.py)."""
    theta2 = vec_dot(w, w)
    small = theta2 <= EPSILON * EPSILON
    t2s = jnp.where(small, 1.0, theta2)
    th = jnp.sqrt(t2s)
    s, c = jnp.sin(th), jnp.cos(th)
    coef_exact = (1.0 - 0.5 * th * s / (1.0 - c)) / t2s
    t4 = theta2 * theta2
    coef_taylor = 1.0 / 12.0 + theta2 / 720.0 + t4 / 30240.0
    coef = jnp.where(small, coef_taylor, coef_exact)
    v_inv = add_hat_terms(1.0, w, -0.5, coef)
    v = mat_vec(v_inv, t)
    return v + list(w)


def se3_log(r: Mat, t: Vec) -> Vec:
    return se3_log_from_w(mat_log(r), t)


def se3_right_jacobian_blocks(w: Vec, t: Vec):
    """(J_r(w), Q(t, w)) blocks of the 6x6 right Jacobian, given w = log(R)."""
    theta2 = vec_dot(w, w)
    small = theta2 <= EPSILON
    t2s = jnp.where(small, 1.0, theta2)
    th = jnp.sqrt(t2s)
    t4s = t2s * t2s
    s, c = jnp.sin(th), jnp.cos(th)

    s_t = s / th
    inv_1mc = 1.0 / (2.0 * (1.0 - c))
    a_exact = 1.0 / t2s - s_t * inv_1mc
    b_exact = -2.0 / t4s + (1.0 + s_t) * inv_1mc / t2s
    a = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, a_exact)
    b = jnp.where(small, 1.0 / 360.0, b_exact)

    d = vec_dot(w, t)
    cvec = vec_sub(vec_scale(w, b * d), vec_scale(t, theta2 * b + 2.0 * a))

    # C = 0.5 [t]_x + cvec w^T + a w t^T + d a I
    da = d * a
    tx, ty, tz = t
    wx, wy, wz = w
    C = [
        [cvec[0] * wx + a * wx * tx + da,
         -0.5 * tz + cvec[0] * wy + a * wx * ty,
         0.5 * ty + cvec[0] * wz + a * wx * tz],
        [0.5 * tz + cvec[1] * wx + a * wy * tx,
         cvec[1] * wy + a * wy * ty + da,
         -0.5 * tx + cvec[1] * wz + a * wy * tz],
        [-0.5 * ty + cvec[2] * wx + a * wz * tx,
         0.5 * tx + cvec[2] * wy + a * wz * ty,
         cvec[2] * wz + a * wz * tz + da],
    ]
    jr = so3_right_jacobian_from_w(w)
    q = mat_mul(C, jr)
    return jr, q


# --- chain kinematics ------------------------------------------------------


def chain_constants(spec):
    """Static per-joint constants as plain Python floats.

    XLA folds them into the trace, so joint origins cost nothing at runtime.
    Returns (origins_r, origins_t, axes, prismatic, tip_r, tip_t, has_tip).
    """
    import numpy as np

    a = spec.origin_r.shape[0]
    org_r = [[[float(spec.origin_r[j, i, k]) for k in range(3)]
              for i in range(3)] for j in range(a)]
    org_t = [[float(spec.origin_t[j, i]) for i in range(3)] for j in range(a)]
    axes = [[float(spec.axis[j, i]) for i in range(3)] for j in range(a)]
    pris = [bool(spec.prismatic[j] > 0.5) for j in range(a)]
    tip_r = [[float(spec.tip_r[i, k]) for k in range(3)] for i in range(3)]
    tip_t = [float(spec.tip_t[i]) for i in range(3)]
    has_tip = not (np.allclose(spec.tip_r, np.eye(3))
                   and np.allclose(spec.tip_t, 0.0))
    return org_r, org_t, axes, pris, tip_r, tip_t, has_tip


def fk_joints(consts, q: Vec):
    """FK over the chain; q is a list of A (L,) arrays.

    Returns (frames, r_ee, t_ee): frames[j] = (R_j, p_j) world joint frames
    (tip applied to the EE only) — same contract as ops/kinematics.fk_joints.
    """
    org_r, org_t, axes, pris, tip_r, tip_t, has_tip = consts
    a = len(q)

    r, t = None, None  # None = identity prefix
    frames = []
    for j in range(a):
        if pris[j]:
            lr = org_r[j]
            lt = vec_add(org_t[j], mat_vec(org_r[j], vec_scale(axes[j], q[j])))
        else:
            lr = mat_mul(org_r[j], rodrigues(axes[j], q[j]))
            lt = org_t[j]
        if r is None:
            r, t = lr, list(lt)
        else:
            t = vec_add(mat_vec(r, lt), t)
            r = mat_mul(r, lr)
        frames.append((r, t))

    r_ee, t_ee = r, t
    if has_tip:
        t_ee = vec_add(mat_vec(r_ee, tip_t), t_ee)
        r_ee = mat_mul(r_ee, tip_r)
    return frames, r_ee, t_ee


def fk_with_ee(consts, q: Vec, ee_r: Mat = None, ee_t: Vec = None):
    """FK + optional EE offset: (frames, r_ee, t_ee)."""
    frames, r_ee, t_ee = fk_joints(consts, q)
    if ee_r is not None:
        t_ee = vec_add(mat_vec(r_ee, ee_t), t_ee)
        r_ee = mat_mul(r_ee, ee_r)
    return frames, r_ee, t_ee


def jacobian_cols(consts, frames, r_ee: Mat, t_ee: Vec):
    """Geometric Jacobian columns (EE/local frame), one 6-list per joint."""
    axes = consts[2]
    pris = consts[3]
    cols = []
    for j in range(len(frames)):
        rj, pj = frames[j]
        dir_w = mat_vec(rj, axes[j])
        if pris[j]:
            lin_l = mat_tvec(r_ee, dir_w)
            cols.append(lin_l + [0.0, 0.0, 0.0])
        else:
            lin_w = vec_cross(dir_w, vec_sub(t_ee, pj))
            lin_l = mat_tvec(r_ee, lin_w)
            ang_l = mat_tvec(r_ee, dir_w)
            cols.append(lin_l + ang_l)
    return cols


def residual_and_jtask(consts, q: Vec, tgt_r: Mat, tgt_t: Vec,
                       ee_r: Mat = None, ee_t: Vec = None,
                       weight6: Mat = None):
    """Fused hot path: (residual [6], J_task [6][A]).

    Everything one LM iteration needs from one FK pass: the weighted pose
    error r = M log6(T_tgt^-1 T(q)) and its Jacobian M Jlog6 Jgeo — the
    component-form equivalent of ops/objective.residual_and_jacobian.
    """
    frames, r_ee, t_ee = fk_with_ee(consts, q, ee_r, ee_t)

    # X = T_tgt^-1 * T_ee
    xr = mat_mul(mat_t(tgt_r), r_ee)
    xt = mat_tvec(tgt_r, vec_sub(t_ee, tgt_t))

    w_log = mat_log(xr)
    e = se3_log_from_w(w_log, xt)

    a = len(q)
    cols = jacobian_cols(consts, frames, r_ee, t_ee)

    jr, qq = se3_right_jacobian_blocks(w_log, xt)
    # J_task = [[jr, qq], [0, jr]] @ Jgeo  -> 6 x A
    jt = [[None] * a for _ in range(6)]
    for j in range(a):
        col = cols[j]
        for i in range(3):
            jt[i][j] = (sum(jr[i][k] * col[k] for k in range(3))
                        + sum(qq[i][k] * col[3 + k] for k in range(3)))
            jt[3 + i][j] = sum(jr[i][k] * col[3 + k] for k in range(3))

    if weight6 is not None:
        e = mat_vec(weight6, e)
        jt = mat_mul(weight6, jt)
    return e, jt


def weight6_from_config(tgt_r: Mat, wl, wa):
    """6x6 weighting M = blockdiag(R^T diag(wl) R, R^T diag(wa) R) or None.

    ``tgt_r`` components may be (L,) arrays; weights are static floats.
    """
    from .objective import weights_are_identity

    lin_id = weights_are_identity(wl)
    ang_id = weights_are_identity(wa)
    if lin_id and ang_id:
        return None

    def conj(w):
        return [[sum(tgt_r[k][i] * float(w[k]) * tgt_r[k][j]
                     for k in range(3)) for j in range(3)] for i in range(3)]

    def ident():
        return [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

    m_l = ident() if lin_id else conj(wl)
    m_a = ident() if ang_id else conj(wa)
    out = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = m_l[i][j]
            out[3 + i][3 + j] = m_a[i][j]
    return out
