"""Sanity tests for the bundled benchmark models (Panda, UR5)."""

import numpy as np
import pytest

from optik_tpu import Robot, SolverConfig
from optik_tpu.models import asset_path


@pytest.fixture(scope="module")
def panda():
    return Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                "panda_hand_tcp")


@pytest.fixture(scope="module")
def ur5():
    return Robot.from_urdf_file(asset_path("ur5.urdf"), "base_link",
                                "ee_link")


def test_panda_structure(panda):
    assert panda.num_positions() == 7
    lo, hi = panda.joint_limits()
    np.testing.assert_allclose(lo[0], -2.8973)
    np.testing.assert_allclose(hi[3], -0.0698)


def test_panda_home_pose(panda):
    """FK at the canonical Panda 'ready' configuration: TCP ~ 0.31 m forward,
    ~0.48 m up, hand pointing down (public franka kinematics)."""
    q_ready = np.array([0.0, -0.785398, 0.0, -2.356194, 0.0, 1.570796,
                        0.785398])
    m = panda.fk(q_ready)
    # Position well inside the workspace, z-axis of TCP pointing down.
    np.testing.assert_allclose(m[:3, 3], [0.30699, 0.0, 0.48684], atol=2e-3)
    np.testing.assert_allclose(m[:3, 2], [0.0, 0.0, -1.0], atol=1e-3)


def test_panda_ik_roundtrip(panda):
    rng = np.random.default_rng(0)
    lo, hi = panda.joint_limits()
    cfg = SolverConfig(tol_f=1e-10)
    for _ in range(5):
        q = rng.uniform(lo, hi)
        target = panda.fk(q)
        sol = panda.ik(cfg, target, np.clip(np.zeros(7), lo, hi))
        assert sol is not None
        np.testing.assert_allclose(panda.fk(np.array(sol[0])), target,
                                   atol=1e-5)


def test_ur5_structure(ur5):
    assert ur5.num_positions() == 6


def test_ur5_ik_roundtrip(ur5):
    rng = np.random.default_rng(1)
    cfg = SolverConfig(tol_f=1e-10)
    for _ in range(5):
        q = rng.uniform(-np.pi, np.pi, 6)
        target = ur5.fk(q)
        sol = ur5.ik(cfg, target, np.zeros(6))
        assert sol is not None
        np.testing.assert_allclose(ur5.fk(np.array(sol[0])), target,
                                   atol=1e-5)


def test_ur5_tight_limits(ur5):
    """Tight-limit stress (BASELINE config 3): restrict limits to +-pi/2 ...
    targets generated inside the restricted box must still solve, with the
    solution inside the box (boundary-active projected steps)."""
    import optik_tpu.models.chain as chain_mod

    spec = ur5.spec
    tight = chain_mod.ChainSpec(
        joint_names=spec.joint_names,
        origin_r=spec.origin_r, origin_t=spec.origin_t, axis=spec.axis,
        prismatic=spec.prismatic,
        lower=np.full(6, -np.pi / 2), upper=np.full(6, np.pi / 2),
        tip_r=spec.tip_r, tip_t=spec.tip_t)
    bot = Robot(tight)
    rng = np.random.default_rng(2)
    cfg = SolverConfig()
    ok = 0
    for _ in range(10):
        q = rng.uniform(-np.pi / 2, np.pi / 2, 6)
        target = bot.fk(q)
        sol = bot.ik(cfg, target, np.zeros(6))
        if sol is not None:
            x = np.array(sol[0])
            assert np.all(x >= -np.pi / 2 - 1e-9)
            assert np.all(x <= np.pi / 2 + 1e-9)
            ok += 1
    assert ok >= 9  # tight boxes may make the odd target multi-modal-hard
