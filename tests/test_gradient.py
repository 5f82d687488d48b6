"""Analytic gradient vs numerical oracles.

Port of kylc/optik crates/optik/tests/test_gradient.rs: central finite
differences (step = machine_eps^(1/3)) vs the analytic gradient over 100
random (x0, target) pairs with non-trivial asymmetric weights — the case that
catches the squared-weight subtlety (objective.rs:102-104).  Epsilon 1e-6.

Additional oracle beyond the reference: jax.grad of the objective must match
the analytic closed form (the whole pipeline is differentiable by
construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.math import so3
from optik_tpu.models import asset_path
from optik_tpu.ops import objective as O

UR3E = asset_path("ur3e.urdf").read_text()

LIN_W = (0.0, 5.0, 0.25)
ANG_W = (0.005, 1.0, 0.99)


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_str(UR3E, "ur_base_link", "ur_ee_link")


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    r = np.asarray(so3.quat_to_mat(jnp.asarray(q)))
    t = rng.uniform(-1, 1, size=3)
    return jnp.asarray(r), jnp.asarray(t)


def finite_difference(f, x):
    n = x.shape[0]
    eps = np.finfo(np.float64).eps ** (1.0 / 3.0)
    g = np.zeros(n)
    for i in range(n):
        xp = x.copy()
        xm = x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (f(xp) - f(xm)) / (2.0 * eps)
    return g


@pytest.mark.parametrize("weights", [(None, None), (LIN_W, ANG_W)])
def test_gradient_analytic_vs_numerical(robot, weights):
    wl, wa = weights
    params = robot.params
    rng = np.random.default_rng(42)

    cost = jax.jit(lambda q, tr, tt: O.objective(
        params, q, tr, tt, wl=wl, wa=wa))
    grad = jax.jit(lambda q, tr, tt: O.objective_grad(
        params, q, tr, tt, wl=wl, wa=wa))

    for _ in range(100):
        x0 = rng.normal(size=6)
        tr, tt = random_pose(rng)

        g_a = np.asarray(grad(jnp.asarray(x0), tr, tt))
        g_n = finite_difference(
            lambda x: float(cost(jnp.asarray(x), tr, tt)), x0)
        np.testing.assert_allclose(g_a, g_n, atol=1e-6)


def test_gradient_vs_jax_autodiff(robot):
    """jax.grad through FK+log must equal the analytic closed form."""
    params = robot.params
    rng = np.random.default_rng(7)

    analytic = jax.jit(lambda q, tr, tt: O.objective_grad(
        params, q, tr, tt, wl=LIN_W, wa=ANG_W))
    auto = jax.jit(jax.grad(lambda q, tr, tt: O.objective(
        params, q, tr, tt, wl=LIN_W, wa=ANG_W)))

    for _ in range(25):
        x0 = jnp.asarray(rng.normal(size=6))
        tr, tt = random_pose(rng)
        np.testing.assert_allclose(np.asarray(analytic(x0, tr, tt)),
                                   np.asarray(auto(x0, tr, tt)), atol=1e-8)


def test_jacobian_vs_autodiff_fk(robot):
    """Geometric (local-frame) Jacobian vs autodiff of FK through the log.

    For a perturbation dq, d log(T_ee^{-1} T(q+dq)) = J_local dq at dq=0 in
    the body frame; verify columns against jax.jacfwd.
    """
    from optik_tpu.ops import kinematics as K

    params = robot.params
    rng = np.random.default_rng(3)

    def body_twist(q0):
        r0, t0 = K.fk_ee(params, q0)

        def f(dq):
            r1, t1 = K.fk_ee(params, q0 + dq)
            from optik_tpu.math import se3
            xr, xt = se3.inv_compose(r0, t0, r1, t1)
            return se3.log(xr, xt)

        return jax.jacfwd(f)(jnp.zeros_like(q0))

    for _ in range(10):
        q0 = jnp.asarray(rng.normal(size=6))
        j_geo = np.asarray(K.joint_jacobian(params, q0))
        j_auto = np.asarray(body_twist(q0))
        np.testing.assert_allclose(j_geo, j_auto, atol=1e-8)
