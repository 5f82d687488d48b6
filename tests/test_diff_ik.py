"""Differential-IK tests.

Ports the reference contracts:
  * test_ik.rs:184-209 — 20 random states: alpha in [0,1] +- 1e-6 and
    |v_i| <= v_max + 1e-6;
  * examples/example_diff_ik.py:52-53 — V_tgt == (J_W v)/alpha to 1e-6 over a
    sweep of v_max values (direction-only scaling semantics);

plus an LP-optimality check against scipy.linprog when scipy is available,
and batch/scalar agreement.
"""

import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.models import asset_path

UR3E = asset_path("ur3e.urdf").read_text()


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_str(UR3E, "ur_base_link", "ur_ee_link")


def world_jacobian(robot, q):
    j = robot.joint_jacobian(q)
    r = robot.fk(q)[:3, :3]
    return np.vstack([r @ j[:3], r @ j[3:]])


def test_diff_ik_contracts(robot):
    """alpha and velocity bounds hold for 20 random states."""
    rng = np.random.default_rng(42)
    n = robot.num_positions()
    eps = 1e-6
    for _ in range(20):
        x0 = robot.random_configuration(rng)
        v_max = np.ones(n)
        v_we = rng.standard_normal(6)

        sol = robot.diff_ik(x0, v_we, v_max)
        assert sol is not None
        alpha, v = sol
        v = np.array(v)
        assert -eps <= alpha <= 1.0 + eps
        assert np.all(np.abs(v) <= v_max + eps)
        # Cartesian tracking: J_W v = alpha * V (the reference's acknowledged
        # TODO, test_ik.rs:207 — asserted here).
        np.testing.assert_allclose(world_jacobian(robot, x0) @ v,
                                   alpha * v_we, atol=1e-5)


def test_diff_ik_direction_scaling(robot):
    """The example_diff_ik.py sweep: V* / alpha == V_tgt across v_max."""
    rng = np.random.default_rng(42)
    n = robot.num_positions()
    x0 = robot.random_configuration(rng)
    v_tgt = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 1.0])

    alphas = []
    for v_max in [0.1, 0.5, 1.0, 10.0]:
        sol = robot.diff_ik(x0, v_tgt, [v_max] * n)
        assert sol is not None
        alpha, v = sol
        assert 0.0 <= alpha <= 1.0 + 1e-6
        assert alpha > 1e-3  # must make some progress
        v_star = world_jacobian(robot, x0) @ np.array(v)
        np.testing.assert_allclose(v_tgt, v_star / alpha, atol=1e-5)
        alphas.append(alpha)
    # Larger velocity limits can only help, and generous limits achieve the
    # full command.
    assert all(a2 >= a1 - 1e-8 for a1, a2 in zip(alphas, alphas[1:]))
    assert alphas[-1] > 1.0 - 1e-6


def test_diff_ik_alpha_saturates(robot):
    """With huge limits alpha must hit ~1 and v must track exactly."""
    rng = np.random.default_rng(1)
    x0 = robot.random_configuration(rng)
    v_we = np.array([0.1, -0.05, 0.2, 0.0, 0.1, -0.2])
    sol = robot.diff_ik(x0, v_we, np.full(robot.num_positions(), 100.0))
    assert sol is not None
    alpha, v = sol
    assert alpha > 1.0 - 1e-6
    np.testing.assert_allclose(world_jacobian(robot, x0) @ np.array(v),
                               alpha * v_we, atol=1e-5)


def test_diff_ik_lp_optimality_vs_scipy(robot):
    """Our alpha must match the LP optimum (Clarabel equivalent)."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(7)
    n = robot.num_positions()
    for _ in range(10):
        x0 = robot.random_configuration(rng)
        v_we = rng.standard_normal(6)
        v_max = np.abs(rng.uniform(0.2, 1.5, size=n))

        sol = robot.diff_ik(x0, v_we, v_max)
        assert sol is not None
        alpha, _ = sol

        jw = world_jacobian(robot, x0)
        # LP: max alpha s.t. Jv = alpha V, |v| <= vmax, 0 <= alpha <= 1.
        c = np.zeros(n + 1)
        c[n] = -1.0
        a_eq = np.hstack([jw, -v_we[:, None]])
        res = scipy_opt.linprog(
            c, A_eq=a_eq, b_eq=np.zeros(6),
            bounds=[(-v_max[i], v_max[i]) for i in range(n)] + [(0.0, 1.0)],
            method="highs")
        assert res.success
        np.testing.assert_allclose(alpha, res.x[n], atol=1e-4)


def test_diff_ik_batch_matches_scalar(robot):
    rng = np.random.default_rng(3)
    n = robot.num_positions()
    B = 6
    x0 = np.stack([robot.random_configuration(rng) for _ in range(B)])
    v_we = rng.standard_normal((B, 6))
    v_max = np.ones((B, n))

    alpha_b, v_b, ok_b = robot.diff_ik_batch(x0, v_we, v_max)
    for i in range(B):
        sol = robot.diff_ik(x0[i], v_we[i], v_max[i])
        assert bool(np.asarray(ok_b)[i]) == (sol is not None)
        if sol is not None:
            np.testing.assert_allclose(np.asarray(alpha_b)[i], sol[0],
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(v_b)[i], sol[1], atol=1e-8)


def test_diff_ik_trajectory(robot):
    """Integrate a short Cartesian path (examples/diff_ik.py shape): the EE
    should advance along +z in the world frame."""
    rng = np.random.default_rng(42)
    q = robot.random_configuration(rng)
    v = np.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0])
    n = robot.num_positions()
    dt = 0.1
    z0 = robot.fk(q)[2, 3]
    for _ in range(10):
        sol = robot.diff_ik(q, v, np.full(n, 0.75))
        assert sol is not None
        alpha, qd = sol
        assert alpha > 0.5
        q = q + np.array(qd) * dt
    z1 = robot.fk(q)[2, 3]
    assert z1 - z0 > 0.05
