"""Native host runtime vs the JAX path.

The C++ library must agree with the JAX implementation on FK, the Jacobian,
and IK round trips — it is the latency-path twin of the same math.
Skipped when no C++ toolchain is available.
"""

import shutil
import time

import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.models import asset_path

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def pair():
    from optik_tpu.native import HostChain

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp")
    return robot, HostChain(robot.spec)


def test_fk_matches(pair):
    robot, host = pair
    rng = np.random.default_rng(0)
    lo, hi = robot.joint_limits()
    for _ in range(20):
        q = rng.uniform(lo, hi)
        np.testing.assert_allclose(host.fk(q), robot.fk(q), atol=1e-12)


def test_jacobian_matches(pair):
    robot, host = pair
    rng = np.random.default_rng(1)
    lo, hi = robot.joint_limits()
    for _ in range(20):
        q = rng.uniform(lo, hi)
        np.testing.assert_allclose(host.jacobian(q), robot.joint_jacobian(q),
                                   atol=1e-12)


def test_ik_roundtrip(pair):
    robot, host = pair
    rng = np.random.default_rng(2)
    lo, hi = robot.joint_limits()
    x0 = np.clip(np.zeros(robot.num_positions()), lo, hi)
    for _ in range(10):
        target = robot.fk(rng.uniform(lo, hi))
        sol = host.ik(target, x0, tol_f=1e-10)
        assert sol is not None
        x, f = sol
        assert f <= 1e-10
        np.testing.assert_allclose(host.fk(x), target, atol=1e-5)
        assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12)


def test_ik_unreachable_returns_none(pair):
    robot, host = pair
    lo, hi = robot.joint_limits()
    target = np.eye(4)
    target[:3, 3] = [100.0, 100.0, 100.0]
    assert host.ik(target, np.clip(np.zeros(7), lo, hi),
                   max_restarts=4, max_iters=16) is None


def test_latency_single_solve(pair):
    """The native path exists to make single solves cheap: well under a
    millisecond per solve on any modern CPU."""
    robot, host = pair
    rng = np.random.default_rng(3)
    lo, hi = robot.joint_limits()
    targets = [robot.fk(rng.uniform(lo, hi)) for _ in range(50)]
    x0 = np.clip(np.zeros(7), lo, hi)
    host.ik(targets[0], x0)  # warm
    t0 = time.perf_counter()
    n_ok = sum(host.ik(t, x0) is not None for t in targets)
    per_solve = (time.perf_counter() - t0) / len(targets)
    assert n_ok >= 45
    assert per_solve < 5e-3  # generous bound for shared CI machines


# --- native URDF ingest (C++ parser + chain extraction) ---------------------


def test_native_urdf_ingest_matches_python(pair):
    """Chains built by the C++ URDF parser must be bit-identical to the
    Python ingest: same limits, same FK, same Jacobian."""
    from optik_tpu.native import HostChain

    robot, host = pair
    native = HostChain.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                      "panda_hand_tcp")
    assert native.n == robot.num_positions()
    lo_p, hi_p = robot.joint_limits()
    lo_n, hi_n = native.joint_limits()
    np.testing.assert_array_equal(lo_n, lo_p)
    np.testing.assert_array_equal(hi_n, hi_p)

    rng = np.random.default_rng(10)
    for _ in range(10):
        q = rng.uniform(lo_p, hi_p)
        np.testing.assert_array_equal(native.fk(q), host.fk(q))
        np.testing.assert_array_equal(native.jacobian(q), host.jacobian(q))


def test_native_urdf_ingest_ur3e_fixed_folding():
    """UR3e has interior + trailing fixed joints — exercises folding."""
    from optik_tpu.native import HostChain

    robot = Robot.from_urdf_file(asset_path("ur3e.urdf"), "ur_base_link",
                                 "ur_ee_link")
    native = HostChain.from_urdf_file(asset_path("ur3e.urdf"), "ur_base_link",
                                      "ur_ee_link")
    rng = np.random.default_rng(11)
    lo, hi = robot.joint_limits()
    for _ in range(10):
        q = rng.uniform(lo, hi)
        np.testing.assert_allclose(native.fk(q), robot.fk(q), atol=1e-12)


def test_native_urdf_error_contracts():
    from optik_tpu.native import HostChain

    with pytest.raises(ValueError, match="does not exist"):
        HostChain.from_urdf_file(asset_path("panda.urdf"), "nope",
                                 "panda_hand_tcp")
    with pytest.raises(ValueError, match="cannot read"):
        HostChain.from_urdf_file("/nonexistent/x.urdf", "a", "b")
    with pytest.raises(ValueError, match="joint type not supported"):
        HostChain.from_urdf_str(
            """<robot name="r"><link name="a"/><link name="b"/>
               <joint name="j" type="floating">
                 <parent link="a"/><child link="b"/>
               </joint></robot>""", "a", "b")
    with pytest.raises(ValueError, match="empty"):
        HostChain.from_urdf_str('<robot name="r"><link name="a"/></robot>',
                                "a", "a")


def test_native_random_configuration(pair):
    _, host = pair
    lo, hi = host.joint_limits()
    q1 = host.random_configuration(7)
    q2 = host.random_configuration(7)
    q3 = host.random_configuration(8)
    np.testing.assert_array_equal(q1, q2)  # deterministic per seed
    assert np.any(q1 != q3)
    assert np.all((q1 >= lo) & (q1 <= hi))


# --- ee_offset through the native path ---------------------------------------


def test_native_ee_offset(pair):
    robot, host = pair
    rng = np.random.default_rng(12)
    lo, hi = robot.joint_limits()
    off = np.asarray(robot.fk(rng.uniform(lo, hi)))  # arbitrary rigid pose
    for _ in range(5):
        q = rng.uniform(lo, hi)
        np.testing.assert_allclose(host.fk(q, ee_offset=off),
                                   robot.fk(q, ee_offset=off), atol=1e-12)
        np.testing.assert_allclose(
            host.jacobian(q, ee_offset=off),
            robot.joint_jacobian(q, ee_offset=off), atol=1e-12)
    # IK round trip with the offset applied.
    target = host.fk(rng.uniform(lo, hi), ee_offset=off)
    sol = host.ik(target, np.clip(np.zeros(7), lo, hi), tol_f=1e-10,
                  ee_offset=off)
    assert sol is not None
    np.testing.assert_allclose(host.fk(sol[0], ee_offset=off), target,
                               atol=1e-5)


# --- full solver-config parity (crates/optik-cpp/src/lib.rs:11-20) -----------


def test_native_invalid_seed_raises(pair):
    """Out-of-limits seed: the reference panics (lib.rs:251-254); the
    native binding raises ValueError with the same message."""
    robot, host = pair
    lo, hi = robot.joint_limits()
    bad = np.clip(np.zeros(7), lo, hi)
    bad[2] = hi[2] + 1.0
    target = robot.fk(np.clip(np.zeros(7), lo, hi))
    with pytest.raises(ValueError, match="joint limits"):
        host.ik(target, bad)


def test_native_quality_mode(pair):
    """Quality mode: min ||x - x0|| over all successful restarts
    (lib.rs:398-408).  With the seed at the known solution, quality must
    return it; and quality's seed distance is <= speed's."""
    robot, host = pair
    rng = np.random.default_rng(15)
    lo, hi = robot.joint_limits()
    for _ in range(5):
        q_star = rng.uniform(lo, hi)
        target = robot.fk(q_star)
        solq = host.ik(target, q_star, solution_mode="quality",
                       max_restarts=16)
        assert solq is not None
        np.testing.assert_allclose(solq[0], q_star, atol=1e-3)

        x0 = rng.uniform(lo, hi)
        sol_s = host.ik(target, x0, solution_mode="speed", max_restarts=64)
        sol_q = host.ik(target, x0, solution_mode="quality", max_restarts=64)
        assert sol_s is not None and sol_q is not None
        d_s = np.linalg.norm(sol_s[0] - x0)
        d_q = np.linalg.norm(sol_q[0] - x0)
        assert d_q <= d_s + 1e-9


def test_native_weighted_ik_matches_python(pair):
    """Per-axis weights in the native residual (objective.rs:7-38): the
    native weighted cost at the native solution must equal the JAX path's
    weighted objective evaluated at the same point, and a zero x-weight
    must admit solutions the unweighted objective rejects."""
    import jax.numpy as jnp

    from optik_tpu import SolverConfig
    from optik_tpu.ops import objective as obj
    from optik_tpu.ops import kinematics as K

    robot, host = pair
    rng = np.random.default_rng(16)
    lo, hi = robot.joint_limits()
    wl = (0.0, 1.0, 1.0)
    wa = (0.5, 1.0, 2.0)

    for _ in range(5):
        target = robot.fk(rng.uniform(lo, hi))
        x0 = rng.uniform(lo, hi)
        sol = host.ik(target, x0, tol_f=1e-10, linear_weight=wl,
                      angular_weight=wa)
        assert sol is not None
        x, f = sol
        # Cross-check the cost against the JAX objective at the same point.
        tgt_r = jnp.asarray(target[:3, :3])
        tgt_t = jnp.asarray(target[:3, 3])
        f_jax = float(obj.objective(robot.params, jnp.asarray(x), tgt_r,
                                    tgt_t, wl=wl, wa=wa))
        assert abs(f_jax - f) <= 1e-9 + 1e-4 * abs(f)
        assert f <= 1e-10

    # A target displaced along world-x is solvable when x-weight is 0 but
    # not otherwise (the weighted objective ignores world-x error).
    q_t = rng.uniform(lo, hi)
    target = robot.fk(q_t)
    target[0, 3] += 1.5  # far beyond the Panda's ~0.85 m reach in x
    x0 = np.clip(np.zeros(7), lo, hi)
    sol_w = host.ik(target, x0, tol_f=1e-10, max_restarts=32,
                    linear_weight=wl, angular_weight=wa)
    assert sol_w is not None
    sol_u = host.ik(target, x0, tol_f=1e-10, max_restarts=32)
    assert sol_u is None


def test_native_tol_dx_success(pair):
    """tol_dx/tol_df >= 0 make small steps / small cost deltas success
    criteria (lib.rs:379).  Seeded near the solution so GN converges
    cleanly and the criteria (not stopval, which is disabled) fire."""
    robot, host = pair
    rng = np.random.default_rng(17)
    lo, hi = robot.joint_limits()
    q_t = rng.uniform(lo, hi)
    target = robot.fk(q_t)
    x0 = np.clip(q_t + 0.05 * rng.standard_normal(7), lo, hi)
    # stopval disabled (tol_f < 0 is unreachable for a squared cost);
    # convergence must come from the dx/df criteria.
    sol = host.ik(target, x0, tol_f=-1.0, tol_dx=1e-8, tol_df=1e-14,
                  max_restarts=8)
    assert sol is not None
    np.testing.assert_allclose(host.fk(sol[0]), target, atol=1e-4)


def test_native_speed_quality_cross_path(pair):
    """Native Speed vs the JAX path on identical problems: both must find
    solutions meeting the tolerance (not necessarily the same branch)."""
    from optik_tpu import SolverConfig

    robot, host = pair
    rng = np.random.default_rng(18)
    lo, hi = robot.joint_limits()
    for mode in ("speed", "quality"):
        target = robot.fk(rng.uniform(lo, hi))
        x0 = rng.uniform(lo, hi)
        sol_n = host.ik(target, x0, tol_f=1e-10, solution_mode=mode)
        sol_j = robot.ik(SolverConfig.create(mode, tol_f=1e-10), target, x0)
        assert sol_n is not None and sol_j is not None
        np.testing.assert_allclose(host.fk(sol_n[0]), target, atol=1e-4)
        np.testing.assert_allclose(robot.fk(np.array(sol_j[0])), target,
                                   atol=1e-4)


# --- native differential IK ---------------------------------------------------


def test_native_diff_ik_contracts(pair):
    """alpha in [0, 1], |v| <= v_max, and J_W v == alpha * V (the tracking
    assertion the reference leaves as a TODO, test_ik.rs:207)."""
    robot, host = pair
    rng = np.random.default_rng(13)
    lo, hi = robot.joint_limits()
    v_we = np.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0])
    v_max = np.full(7, 0.75)
    for _ in range(10):
        q = rng.uniform(lo, hi)
        res = host.diff_ik(q, v_we, v_max)
        assert res is not None
        alpha, v = res
        assert -1e-6 <= alpha <= 1.0 + 1e-6
        assert np.all(np.abs(v) <= v_max + 1e-6)
        # world Jacobian = R_WE-rotated local Jacobian
        T = host.fk(q)
        jl = host.jacobian(q)
        jw = np.vstack([T[:3, :3] @ jl[:3], T[:3, :3] @ jl[3:]])
        np.testing.assert_allclose(jw @ v, alpha * v_we, atol=1e-6)


def test_native_diff_ik_matches_python(pair):
    robot, host = pair
    rng = np.random.default_rng(14)
    lo, hi = robot.joint_limits()
    v_we = np.array([0.02, -0.05, 0.1, 0.0, 0.1, -0.04])
    v_max = np.full(7, 0.5)
    for _ in range(10):
        q = rng.uniform(lo, hi)
        res_n = host.diff_ik(q, v_we, v_max)
        res_p = robot.diff_ik(q, v_we, v_max)
        assert (res_n is None) == (res_p is None)
        if res_n is not None:
            assert abs(res_n[0] - res_p[0]) < 1e-6
