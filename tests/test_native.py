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
