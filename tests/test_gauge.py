"""Zonotope-gauge diff-IK solver: oracle and edge-case tests.

The exact path (solver/gauge.py) replaces the LP solve with closed-form
facet-cut geometry; these tests pin it against scipy.linprog (the
Clarabel-equivalent oracle, cf. reference lib.rs:216-228) across joint
counts, conditioning regimes, and the degenerate corners the closed form
must survive (rank-deficient Jacobians, zero commands, zero velocity
limits).
"""

import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.models import asset_path

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.fixture(scope="module", params=["ur3e", "panda"])
def robot(request):
    if request.param == "ur3e":
        return Robot.from_urdf_str(
            asset_path("ur3e.urdf").read_text(), "ur_base_link",
            "ur_ee_link")
    return Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                "panda_hand_tcp")


def world_jacobian(robot, q):
    j = robot.joint_jacobian(q)
    r = robot.fk(q)[:3, :3]
    return np.vstack([r @ j[:3], r @ j[3:]])


def lp_alpha(jw, v_we, v_max):
    n = jw.shape[1]
    c = np.zeros(n + 1)
    c[n] = -1.0
    res = scipy_opt.linprog(
        c, A_eq=np.hstack([jw, -v_we[:, None]]), b_eq=np.zeros(6),
        bounds=[(-v_max[i], v_max[i]) for i in range(n)] + [(0.0, 1.0)],
        method="highs")
    assert res.success
    return res.x[n]


def test_gauge_matches_lp_wide_sweep(robot):
    """alpha == LP optimum over 60 random instances per robot, spanning
    tight (0.05) through loose (20.0) velocity-limit scales."""
    rng = np.random.default_rng(11)
    n = robot.num_positions()
    B = 60
    x0 = np.stack([robot.random_configuration(rng) for _ in range(B)])
    v_we = rng.standard_normal((B, 6))
    scales = np.exp(rng.uniform(np.log(0.05), np.log(20.0), size=(B, 1)))
    v_max = scales * rng.uniform(0.3, 1.5, size=(B, n))

    alpha, v, ok = robot.diff_ik_batch(x0, v_we, v_max)
    alpha, v, ok = map(np.asarray, (alpha, v, ok))
    assert ok.all()
    for i in range(B):
        jw = world_jacobian(robot, x0[i])
        a_lp = lp_alpha(jw, v_we[i], v_max[i])
        # Feasible-by-construction: may only ever UNDERshoot the optimum.
        assert alpha[i] <= a_lp + 1e-4
        np.testing.assert_allclose(alpha[i], a_lp, atol=2e-4)
        assert np.all(np.abs(v[i]) <= v_max[i] + 1e-6)
        np.testing.assert_allclose(
            jw @ v[i], alpha[i] * v_we[i],
            atol=1e-5 * (1.0 + np.abs(v_we[i]).max()))


def test_gauge_zero_command(robot):
    """V = 0: the LP maximum is alpha = 1 with v = 0."""
    rng = np.random.default_rng(2)
    x0 = robot.random_configuration(rng)
    sol = robot.diff_ik(x0, np.zeros(6), np.ones(robot.num_positions()))
    assert sol is not None
    alpha, v = sol
    assert alpha == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_gauge_zero_velocity_limit_entry(robot):
    """A zero v_max entry removes that generator; the LP still solves."""
    rng = np.random.default_rng(3)
    n = robot.num_positions()
    x0 = robot.random_configuration(rng)
    v_we = rng.standard_normal(6)
    v_max = np.ones(n)
    v_max[2] = 0.0
    sol = robot.diff_ik(x0, v_we, v_max)
    assert sol is not None
    alpha, v = sol
    jw = world_jacobian(robot, x0)
    assert abs(v[2]) <= 1e-6
    np.testing.assert_allclose(alpha, lp_alpha(jw, v_we, v_max), atol=2e-4)
    np.testing.assert_allclose(jw @ np.array(v), alpha * v_we, atol=1e-5 * 2)


def test_gauge_all_zero_velocity_limits(robot):
    """v_max = 0: only v = 0 is feasible, so alpha must be ~0 (or the
    solver must report not-ok) — never a bound violation."""
    rng = np.random.default_rng(4)
    n = robot.num_positions()
    x0 = robot.random_configuration(rng)
    v_we = rng.standard_normal(6)
    alpha, v, ok = robot.diff_ik_batch(x0[None], v_we[None],
                                       np.zeros((1, n)))
    v = np.asarray(v)[0]
    np.testing.assert_allclose(v, 0.0, atol=1e-9)
    if bool(np.asarray(ok)[0]):
        assert float(np.asarray(alpha)[0]) <= 1e-6


def test_gauge_singular_configuration(robot):
    """A stretched-out (near-singular) configuration: the cut minimum is
    still feasible; ok gates honesty."""
    n = robot.num_positions()
    x0 = np.zeros(n)  # fully extended for both arms: near-singular J
    v_we = np.array([0.0, 0.0, 0.3, 0.0, 0.2, 0.0])
    alpha, v, ok = robot.diff_ik_batch(x0[None], v_we[None],
                                       np.ones((1, n)))
    alpha, v, ok = map(np.asarray, (alpha, v, ok))
    assert np.all(np.abs(v[0]) <= 1.0 + 1e-6)
    assert 0.0 - 1e-6 <= alpha[0] <= 1.0 + 1e-6
    if bool(ok[0]):
        jw = world_jacobian(robot, x0)
        np.testing.assert_allclose(jw @ v[0], alpha[0] * v_we, atol=2e-5)
        np.testing.assert_allclose(alpha[0], lp_alpha(jw, v_we, np.ones(n)),
                                   atol=1e-3)


def test_gauge_matches_admm_oracle(robot):
    """The closed-form path agrees with the independent round-3 ADMM
    formulation (solver/diffik.diff_ik_admm_batch) where both succeed."""
    import jax.numpy as jnp

    from optik_tpu.solver import diffik

    rng = np.random.default_rng(9)
    n = robot.num_positions()
    B = 8
    x0 = np.stack([robot.random_configuration(rng) for _ in range(B)])
    v_we = rng.standard_normal((B, 6))
    v_max = rng.uniform(0.3, 1.2, size=(B, n))

    dt = robot.dtype
    a_g, v_g, ok_g = map(np.asarray, robot.diff_ik_batch(x0, v_we, v_max))
    a_a, v_a, ok_a = map(np.asarray, diffik.diff_ik_admm_batch(
        robot.params, jnp.asarray(x0, dt),
        jnp.asarray(v_we, dt), jnp.asarray(v_max, dt)))
    both = ok_g & ok_a
    assert both.sum() >= B - 1  # ADMM may stall on a marginal lane
    np.testing.assert_allclose(a_g[both], a_a[both], atol=5e-4)


def test_gauge_batch_invariance(robot):
    """Lane results must not depend on batch size (element-wise SoA)."""
    rng = np.random.default_rng(5)
    n = robot.num_positions()
    B = 5
    x0 = np.stack([robot.random_configuration(rng) for _ in range(B)])
    v_we = rng.standard_normal((B, 6))
    v_max = np.ones((B, n))

    a_full, v_full, ok_full = map(np.asarray,
                                  robot.diff_ik_batch(x0, v_we, v_max))
    for i in range(B):
        a1, v1, ok1 = map(np.asarray, robot.diff_ik_batch(
            x0[i:i + 1], v_we[i:i + 1], v_max[i:i + 1]))
        assert bool(ok1[0]) == bool(ok_full[i])
        np.testing.assert_array_equal(a1[0], a_full[i])
        np.testing.assert_array_equal(v1[0], v_full[i])


def _chain_urdf(n):
    """Synthetic n-DoF serial arm URDF (alternating z/y axes)."""
    links = "".join(f'<link name="l{i}"/>' for i in range(n + 1))
    joints = []
    for i in range(n):
        ax = "0 0 1" if i % 2 == 0 else "0 1 0"
        joints.append(
            f'<joint name="j{i}" type="revolute">'
            f'<parent link="l{i}"/><child link="l{i+1}"/>'
            f'<origin xyz="0.2 0 0.1" rpy="0 0 0"/>'
            f'<axis xyz="{ax}"/>'
            f'<limit lower="-2.5" upper="2.5" effort="1" velocity="1"/>'
            f'</joint>')
    return f'<robot name="syn{n}">{links}{"".join(joints)}</robot>'


@pytest.mark.parametrize("n", [5, 8])
def test_gauge_joint_count_boundaries_exact(n):
    """The exact path serves its joint-count range (C(5,5)=1 through a
    redundant 8-DoF arm; the facet axis is an array dimension, so the
    trace stays small at any n)."""
    bot = Robot.from_urdf_str(_chain_urdf(n), "l0", f"l{n}")
    rng = np.random.default_rng(n)
    x0 = bot.random_configuration(rng)
    v_we = rng.standard_normal(6)
    v_max = np.ones(n)
    sol = bot.diff_ik(x0, v_we, v_max)
    assert sol is not None
    alpha, v = sol
    jw = world_jacobian(bot, x0)
    np.testing.assert_allclose(alpha, lp_alpha(jw, v_we, v_max), atol=5e-4)
    np.testing.assert_allclose(jw @ np.array(v), alpha * v_we,
                               atol=1e-5 * (1 + np.abs(v_we).max()))


def test_gauge_routing_by_joint_count():
    """build_batch_solver serves exactly [MIN_EXACT_N, MAX_EXACT_N]."""
    from optik_tpu.solver import diffik, gauge

    for n, exact in ((4, False), (5, True), (10, True), (11, False)):
        bot = Robot.from_urdf_str(_chain_urdf(n), "l0", f"l{n}")
        fn = diffik.build_batch_solver(bot.spec, bot.dtype)
        assert (fn is not None) == exact
        assert (gauge.MIN_EXACT_N <= n <= gauge.MAX_EXACT_N) == exact


@pytest.mark.parametrize("n", [4])
def test_gauge_fallback_outside_exact_range(n):
    """n outside [MIN_EXACT_N, MAX_EXACT_N] routes the ADMM fallback and
    still honors the contracts (box bounds + tracking when ok)."""
    bot = Robot.from_urdf_str(_chain_urdf(n), "l0", f"l{n}")
    rng = np.random.default_rng(n)
    x0 = bot.random_configuration(rng)
    v_we = rng.standard_normal(6)
    v_max = np.ones(n)
    sol = bot.diff_ik(x0, v_we, v_max)
    if sol is not None:
        alpha, v = sol
        assert -1e-6 <= alpha <= 1 + 1e-6
        assert np.all(np.abs(v) <= 1 + 1e-6)
        jw = world_jacobian(bot, x0)
        np.testing.assert_allclose(jw @ np.array(v), alpha * v_we,
                                   atol=2e-5 * (1 + np.abs(v_we).max()))
