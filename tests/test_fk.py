"""Golden-data FK tests on the UR3e fixture + chain-ingest behavior.

Port of kylc/optik crates/optik/tests/test_fk.rs (50 random configs vs
expected EE poses, eps 1e-6) plus URDF ingest contracts from
kinematics.rs:18-105 (missing links, no path, folding, empty chain).
"""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from optik_tpu import Robot
from optik_tpu.math import so3
from optik_tpu.models import asset_path

DATA = pathlib.Path(__file__).parent / "data"
UR3E = asset_path("ur3e.urdf").read_text()


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_str(UR3E, "ur_base_link", "ur_ee_link")


def test_num_positions(robot):
    assert robot.num_positions() == 6


def test_fk_golden(robot):
    inputs = json.load(open(DATA / "test_fk_inputs.json"))
    outputs = json.load(open(DATA / "test_fk_outputs.json"))

    for q, expect in zip(inputs, outputs):
        m = robot.fk(q)
        np.testing.assert_allclose(m[:3, 3], expect["translation"], atol=1e-6)
        q_got = np.asarray(so3.mat_to_quat(jnp.asarray(m[:3, :3])))
        q_exp = np.asarray(expect["rotation"])  # (x, y, z, w)
        # Compare up to quaternion sign.
        assert min(np.abs(q_got - q_exp).max(),
                   np.abs(q_got + q_exp).max()) < 1e-6


def test_fk_batch_matches_scalar(robot):
    inputs = np.array(json.load(open(DATA / "test_fk_inputs.json")))
    r, t = robot.fk_batch(inputs)
    for i, q in enumerate(inputs):
        m = robot.fk(q)
        np.testing.assert_allclose(np.asarray(r[i]), m[:3, :3], atol=1e-12)
        np.testing.assert_allclose(np.asarray(t[i]), m[:3, 3], atol=1e-12)


def test_ee_offset(robot):
    q = np.zeros(6)
    off = np.eye(4)
    off[:3, 3] = [0.0, 0.0, 0.1]
    m0 = robot.fk(q)
    m1 = robot.fk(q, ee_offset=off)
    np.testing.assert_allclose(m1, m0 @ off, atol=1e-12)


def test_joint_limits(robot):
    lo, hi = robot.joint_limits()
    assert lo.shape == (6,) and hi.shape == (6,)
    assert np.all(lo < hi)
    # UR3e limits are +-pi / +-2pi ranges, all finite.
    assert np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))


def test_random_configuration(robot):
    rng = np.random.default_rng(0)
    lo, hi = robot.joint_limits()
    for _ in range(10):
        q = robot.random_configuration(rng)
        assert np.all(q >= lo) and np.all(q <= hi)


# --- URDF ingest error contracts (kinematics.rs panics -> ValueError) ------


def test_missing_base_link():
    with pytest.raises(ValueError, match="base link 'nope' does not exist"):
        Robot.from_urdf_str(UR3E, "nope", "ur_ee_link")


def test_missing_ee_link():
    with pytest.raises(ValueError, match="EE link 'nope' does not exist"):
        Robot.from_urdf_str(UR3E, "ur_base_link", "nope")


def test_no_path():
    # ur_tool0 hangs off wrist_3 on a sibling branch; ee -> base is against
    # the joint direction, so reversing base/ee must fail like the reference.
    with pytest.raises(ValueError, match="no path"):
        Robot.from_urdf_str(UR3E, "ur_ee_link", "ur_base_link")


def test_empty_chain():
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j" type="fixed"><parent link="a"/><child link="b"/></joint>
    </robot>"""
    with pytest.raises(ValueError, match="kinematic chain is empty"):
        Robot.from_urdf_str(urdf, "a", "b")


def test_unsupported_joint_type():
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j" type="floating"><parent link="a"/><child link="b"/></joint>
    </robot>"""
    with pytest.raises(ValueError, match="joint type not supported"):
        Robot.from_urdf_str(urdf, "a", "b")


def test_cycle_detection():
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j1" type="revolute"><parent link="a"/><child link="b"/>
        <axis xyz="0 0 1"/><limit lower="-1" upper="1"/></joint>
      <joint name="j2" type="revolute"><parent link="b"/><child link="a"/>
        <axis xyz="0 0 1"/><limit lower="-1" upper="1"/></joint>
    </robot>"""
    with pytest.raises(ValueError, match="loops"):
        Robot.from_urdf_str(urdf, "a", "b")


def test_degenerate_limits_unbounded():
    """upper - lower <= 0 means unbounded (kinematics.rs:299-303)."""
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="j" type="revolute"><parent link="a"/><child link="b"/>
        <axis xyz="0 0 1"/></joint>
    </robot>"""
    r = Robot.from_urdf_str(urdf, "a", "b")
    lo, hi = r.joint_limits()
    assert lo[0] == -np.inf and hi[0] == np.inf


def test_fixed_joint_folding():
    """Interleaved fixed joints fold into the next articulated origin; FK of
    the folded chain equals composing every joint transform explicitly."""
    urdf = """
    <robot name="r">
      <link name="base"/><link name="l1"/><link name="l2"/><link name="l3"/>
      <link name="l4"/><link name="tip"/>
      <joint name="f1" type="fixed"><parent link="base"/><child link="l1"/>
        <origin xyz="0.1 0.2 0.3" rpy="0.3 0.2 0.1"/></joint>
      <joint name="r1" type="revolute"><parent link="l1"/><child link="l2"/>
        <origin xyz="0 0 0.5" rpy="0 0.1 0"/><axis xyz="0 0 1"/>
        <limit lower="-3" upper="3"/></joint>
      <joint name="f2" type="fixed"><parent link="l2"/><child link="l3"/>
        <origin xyz="0.2 0 0" rpy="0 0 1.2"/></joint>
      <joint name="f3" type="fixed"><parent link="l3"/><child link="l4"/>
        <origin xyz="0 0.1 0" rpy="0.4 0 0"/></joint>
      <joint name="r2" type="revolute"><parent link="l4"/><child link="tip"/>
        <origin xyz="0 0 0.3" rpy="0 0 0"/><axis xyz="0 1 0"/>
        <limit lower="-3" upper="3"/></joint>
    </robot>"""
    r = Robot.from_urdf_str(urdf, "base", "tip")
    assert r.num_positions() == 2

    # Manual composition in plain numpy, FK order: T = prod(origin * local).
    from optik_tpu.models.urdf import rpy_to_matrix

    def tf(rmat, t):
        m = np.eye(4)
        m[:3, :3] = rmat
        m[:3, 3] = t
        return m

    def rotz(a):
        return tf(rpy_to_matrix(0, 0, a), np.zeros(3))

    def roty(a):
        return tf(rpy_to_matrix(0, a, 0), np.zeros(3))

    q = np.array([0.37, -0.81])
    expected = (
        tf(rpy_to_matrix(0.3, 0.2, 0.1), [0.1, 0.2, 0.3])
        @ tf(rpy_to_matrix(0, 0.1, 0), [0, 0, 0.5]) @ rotz(q[0])
        @ tf(rpy_to_matrix(0, 0, 1.2), [0.2, 0, 0])
        @ tf(rpy_to_matrix(0.4, 0, 0), [0, 0.1, 0])
        @ tf(np.eye(3), [0, 0, 0.3]) @ roty(q[1])
    )
    np.testing.assert_allclose(r.fk(q), expected, atol=1e-12)


def test_trailing_fixed_tip():
    """Trailing fixed joints become a constant tip transform
    (kinematics.rs:88-97)."""
    urdf = """
    <robot name="r">
      <link name="base"/><link name="l1"/><link name="l2"/><link name="tip"/>
      <joint name="r1" type="revolute"><parent link="base"/><child link="l1"/>
        <axis xyz="0 0 1"/><limit lower="-3" upper="3"/></joint>
      <joint name="f1" type="fixed"><parent link="l1"/><child link="l2"/>
        <origin xyz="0 0 0.2" rpy="0 0 0.5"/></joint>
      <joint name="f2" type="fixed"><parent link="l2"/><child link="tip"/>
        <origin xyz="0.1 0 0" rpy="0 0.3 0"/></joint>
    </robot>"""
    r = Robot.from_urdf_str(urdf, "base", "tip")
    assert r.num_positions() == 1

    from optik_tpu.models.urdf import rpy_to_matrix

    def tf(rmat, t):
        m = np.eye(4)
        m[:3, :3] = rmat
        m[:3, 3] = t
        return m

    q = np.array([1.1])
    expected = (
        tf(rpy_to_matrix(0, 0, q[0]), np.zeros(3))
        @ tf(rpy_to_matrix(0, 0, 0.5), [0, 0, 0.2])
        @ tf(rpy_to_matrix(0, 0.3, 0), [0.1, 0, 0])
    )
    np.testing.assert_allclose(r.fk(q), expected, atol=1e-12)


def test_prismatic_fk():
    """Prismatic joints translate along their axis (kinematics.rs:249-252)."""
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/>
      <joint name="p" type="prismatic"><parent link="a"/><child link="b"/>
        <origin xyz="0 0 0.1"/><axis xyz="0 1 0"/>
        <limit lower="-2" upper="2"/></joint>
    </robot>"""
    r = Robot.from_urdf_str(urdf, "a", "b")
    m = r.fk(np.array([0.7]))
    np.testing.assert_allclose(m[:3, 3], [0.0, 0.7, 0.1], atol=1e-12)
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)
