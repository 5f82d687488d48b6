"""End-to-end coverage on a mixed revolute+prismatic (SCARA-style) chain.

The reference parses and FK-supports prismatic joints but panics computing
their Jacobian column (kylc/optik kinematics.rs:185 `todo!()`), so none of
its solver paths ever ran on a prismatic chain.  This framework implements
the column (linear = R.axis, angular = 0), making the full IK / diff-IK
stack work on such chains — pinned here.
"""

import numpy as np
import pytest

from optik_tpu import Robot, SolverConfig

SCARA = """
<robot name="scara">
  <link name="base"/><link name="l1"/><link name="l2"/>
  <link name="l3"/><link name="tool"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.4"/><axis xyz="0 0 1"/>
    <limit lower="-2.9" upper="2.9"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0.35 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-2.4" upper="2.4"/>
  </joint>
  <joint name="j3" type="prismatic">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0.3 0 0"/><axis xyz="0 0 -1"/>
    <limit lower="0.0" upper="0.25"/>
  </joint>
  <joint name="j4" type="revolute">
    <parent link="l3"/><child link="tool"/>
    <origin xyz="0 0 -0.05"/><axis xyz="0 0 1"/>
    <limit lower="-3.1" upper="3.1"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_str(SCARA, "base", "tool")


def test_fk_geometry(robot):
    """Closed-form FK check at a hand-computed configuration."""
    q = np.array([np.pi / 2, -np.pi / 2, 0.1, 0.0])
    m = robot.fk(q)
    # j1 rotates +90deg about z: l2 offset (0.35,0,0) -> (0,0.35,0).
    # j2 rotates -90deg: j3 offset (0.3,0,0) -> rotated back to +x... net
    # orientation = identity about z, so tool offset stays axis-aligned.
    np.testing.assert_allclose(
        m[:3, 3], [0.3, 0.35, 0.4 - 0.1 - 0.05], atol=1e-12)
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)


def test_jacobian_vs_autodiff(robot):
    """Analytic Jacobian (incl. the prismatic column) vs jax.grad of FK."""
    import jax
    import jax.numpy as jnp

    from optik_tpu.ops import kinematics as K
    from optik_tpu.math import se3

    params = robot.params
    rng = np.random.default_rng(7)
    lo, hi = robot.joint_limits()

    for _ in range(10):
        q = rng.uniform(lo, hi)
        jac = robot.joint_jacobian(q)  # 6 x n, EE/local frame

        ee_r, ee_t = K.fk_ee(params, jnp.asarray(q))

        def local_error(dq):
            r, t = K.fk_ee(params, jnp.asarray(q) + dq)
            # log of (T_ref^-1 . T(q+dq)) in the EE frame
            rel_r = ee_r.T @ r
            rel_t = ee_r.T @ (t - ee_t)
            return se3.log(rel_r, rel_t)

        j_auto = np.asarray(jax.jacobian(local_error)(jnp.zeros(4)))
        np.testing.assert_allclose(jac, j_auto, atol=1e-8)


def test_ik_round_trip(robot):
    """IK solves reachable targets on the mixed chain (speed + quality)."""
    rng = np.random.default_rng(3)
    lo, hi = robot.joint_limits()
    cfg = SolverConfig.create("speed", max_restarts=32, tol_f=1e-12)
    cfg_q = SolverConfig.create("quality", max_restarts=32, tol_f=1e-12)
    x0 = np.clip(np.zeros(4), lo, hi)
    for _ in range(10):
        target = robot.fk(rng.uniform(lo, hi))
        for c in (cfg, cfg_q):
            sol = robot.ik(c, target, x0)
            assert sol is not None
            np.testing.assert_allclose(robot.fk(np.asarray(sol[0])), target,
                                       atol=1e-6)


def test_diff_ik_contract(robot):
    """diff-IK respects velocity bounds and alpha in [0,1] on the chain."""
    rng = np.random.default_rng(5)
    lo, hi = robot.joint_limits()
    v_max = [1.0, 1.0, 0.5, 2.0]
    for _ in range(5):
        q = rng.uniform(lo, hi)
        out = robot.diff_ik(q, [0.05, 0.0, -0.08, 0.0, 0.0, 0.2], v_max)
        assert out is not None
        alpha, v = out
        assert -1e-6 <= alpha <= 1.0 + 1e-6
        assert np.all(np.abs(v) <= np.asarray(v_max) + 1e-6)
