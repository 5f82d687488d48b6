"""Per-lane gauge -> ADMM rescue for diff-IK (VERDICT r4 item 4).

The exact zonotope-gauge enumeration cannot certify rank-deficient
geometry (all generators in a low-dimensional subspace -> no reliable
facet cut, solver/gauge.py d_floor); the reference's Clarabel
interior-point solves those instances (lib.rs:216-228).  The public
``diff_ik_batch`` now re-solves just the failed lanes with the ADMM path
(Robot._diffik_rescue) — pinned here with a planar 6R chain whose world
Jacobian has rank 3 and commands constructed inside its range.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.models import asset_path


def _planar_urdf(n=6):
    """n revolute joints, all about z: J_W rank <= 3 everywhere."""
    links = "".join(f'<link name="l{i}"/>' for i in range(n + 1))
    joints = "".join(
        f'<joint name="j{i}" type="revolute">'
        f'<parent link="l{i - 1}"/><child link="l{i}"/>'
        f'<origin xyz="0.2 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>'
        f'<limit lower="-3" upper="3" effort="1" velocity="1"/>'
        f"</joint>" for i in range(1, n + 1))
    return f'<robot name="planar{n}">{links}{joints}</robot>'


@pytest.fixture(scope="module")
def planar():
    return Robot.from_urdf_str(_planar_urdf(), "l0", "l6",
                               dtype=jnp.float32)


def world_jacobian(robot, q):
    import jax

    jl = robot.joint_jacobian(q)
    m = robot.fk(q)
    r = m[:3, :3]
    return np.concatenate([r @ jl[:3], r @ jl[3:]], axis=0)


def test_rescue_recovers_rank_deficient_lanes(planar):
    rng = np.random.default_rng(0)
    n = planar.num_positions()
    B = 8
    x0 = np.stack([planar.random_configuration(rng) for _ in range(B)])
    v_max = np.ones((B, n))
    # Commands strictly inside the reachable cone: V = J_W v0 with v0 well
    # inside the box, so the LP is feasible with alpha = 1.
    v_we = np.stack([world_jacobian(planar, x0[i])
                     @ rng.uniform(-0.2, 0.2, n) for i in range(B)])

    a0, v0, ok0 = planar.diff_ik_batch(x0, v_we, v_max, rescue=False)
    a1, v1, ok1 = planar.diff_ik_batch(x0, v_we, v_max)
    ok0, ok1 = np.asarray(ok0), np.asarray(ok1)
    # The gauge enumeration must fail these (rank-3 generators); if it
    # ever learns to certify them, this test's subject is gone — flag it.
    assert not ok0.all(), "gauge path now certifies rank-deficient J?"
    # Rescue recovers every lane (feasible by construction).
    assert ok1.all()
    a1, v1 = np.asarray(a1), np.asarray(v1)
    assert np.all(a1 >= 1.0 - 1e-3)  # alpha = 1 is feasible
    assert np.all(np.abs(v1) <= 1.0 + 1e-6)
    for i in range(B):
        jw = world_jacobian(planar, x0[i])
        np.testing.assert_allclose(jw @ v1[i], a1[i] * v_we[i], atol=5e-4)


def test_rescue_noop_on_clean_batch():
    """On a healthy Panda batch the rescue path must not perturb results."""
    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n = robot.num_positions()
    B = 16
    x0 = np.stack([robot.random_configuration(rng) for _ in range(B)])
    v_we = rng.standard_normal((B, 6))
    v_max = rng.uniform(0.3, 1.2, size=(B, n))
    a0, v0, ok0 = robot.diff_ik_batch(x0, v_we, v_max, rescue=False)
    a1, v1, ok1 = robot.diff_ik_batch(x0, v_we, v_max)
    ok0 = np.asarray(ok0)
    np.testing.assert_array_equal(np.asarray(ok0)[ok0],
                                  np.asarray(ok1)[ok0])
    np.testing.assert_array_equal(np.asarray(a0)[ok0], np.asarray(a1)[ok0])
    np.testing.assert_array_equal(np.asarray(v0)[ok0], np.asarray(v1)[ok0])


def test_honest_failure_stays_failed(planar):
    """A command OUTSIDE the rank-deficient J's range: both solvers must
    refuse (ok=False), never fabricate a track-violating answer."""
    rng = np.random.default_rng(5)
    n = planar.num_positions()
    x0 = planar.random_configuration(rng)[None]
    # Pure z-translation is unreachable for a planar-xy chain.
    v_we = np.array([[0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
    alpha, v, ok = planar.diff_ik_batch(x0, v_we, np.ones((1, n)))
    if bool(np.asarray(ok)[0]):
        # Only acceptable if tracking holds — i.e. alpha ~ 0.
        assert float(np.asarray(alpha)[0]) <= 1e-4
