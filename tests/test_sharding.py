"""Sharded-solver tests on the 8-fake-device CPU mesh.

The key assertion: the sharded argmin-reduction equals the single-device
result for every mesh shape — "multi-node without a cluster"
(SURVEY.md §4's rebuild test plan).
"""

import jax
import numpy as np
import pytest

from optik_tpu import Robot, SolverConfig
from optik_tpu.models import asset_path
from optik_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                "panda_hand_tcp")


def targets(robot, b, rng):
    lo, hi = robot.joint_limits()
    qs = rng.uniform(lo, hi, size=(b, robot.num_positions()))
    r, t = robot.fk_batch(qs)
    return np.asarray(r), np.asarray(t)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_sharded_matches_unsharded(robot, shape):
    data, seed = shape
    n_dev = data * seed
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough fake devices")

    rng = np.random.default_rng(0)
    B = 8
    tr, tt = targets(robot, B, rng)
    lo, hi = robot.joint_limits()
    x0 = np.tile(np.clip(np.zeros(7), lo, hi), (B, 1))

    cfg = SolverConfig(max_restarts=16)
    ref = robot.ik_batch(cfg, tr, tt, x0)

    m = mesh_mod.make_mesh(jax.devices()[:n_dev], data=data, seed=seed)
    got = mesh_mod.ik_sharded(robot, cfg, tr, tt, x0, m)

    np.testing.assert_array_equal(np.asarray(got.found), np.asarray(ref.found))
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               atol=1e-10)


def test_mesh_validation(robot):
    m = mesh_mod.make_mesh(jax.devices()[:4], data=2, seed=2)
    rng = np.random.default_rng(1)
    tr, tt = targets(robot, 3, rng)  # 3 poses not divisible by data=2
    lo, hi = robot.joint_limits()
    x0 = np.tile(np.clip(np.zeros(7), lo, hi), (3, 1))
    with pytest.raises(ValueError, match="not divisible"):
        mesh_mod.ik_sharded(robot, SolverConfig(max_restarts=16),
                            tr, tt, x0, m)
    with pytest.raises(ValueError, match="mesh shape"):
        mesh_mod.make_mesh(jax.devices()[:4], data=3, seed=2)


def test_sharded_cascade_matches_local(robot):
    """build_sharded_cascade on a 4-shard data mesh: per-pose results are
    bitwise identical to the unsharded cascade run shard-by-shard, and the
    found mask matches the single-shot schedule (cascade contract)."""
    import jax.numpy as jnp

    from optik_tpu.solver import cascade

    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough fake devices")

    robot32 = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                   "panda_hand_tcp", dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B = 64  # 16 poses per shard, p_blk=8
    tr, tt = targets(robot32, B, rng)
    lo, hi = robot32.joint_limits()
    x0 = rng.uniform(lo, hi, size=(B, 7)).astype(np.float32)

    cfg = SolverConfig.create("speed", max_restarts=48, seed_batch=8,
                              max_iters=32)
    m = mesh_mod.make_mesh(jax.devices()[:n_dev], data=n_dev, seed=1)
    fn = mesh_mod.build_sharded_cascade(robot32, cfg, m, interpret=True,
                                        p_blk=8, tail_div=2)
    got = fn(tr, tt, x0)

    local = cascade.build_cascade_solver(robot32.spec, cfg, p_blk=8,
                                         tail_div=2, interpret=True)
    shard = B // n_dev
    for k in range(n_dev):
        sl = slice(k * shard, (k + 1) * shard)
        ref = local(jnp.asarray(tr[sl]), jnp.asarray(tt[sl]),
                    jnp.asarray(x0[sl]))
        np.testing.assert_array_equal(np.asarray(got.found)[sl],
                                      np.asarray(ref.found))
        np.testing.assert_array_equal(np.asarray(got.x)[sl],
                                      np.asarray(ref.x))
    # Work counter sums over shards.
    assert int(got.lane_iters) > 0
    found = np.asarray(got.found)
    assert np.all(np.asarray(got.cost)[found] <= cfg.tol_f * (1 + 1e-5))
