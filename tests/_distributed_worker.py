"""Worker process for the multi-process distributed test.

Usage: python tests/_distributed_worker.py <process_id> <num_processes> <port>

Each process brings up the JAX distributed runtime over a localhost
coordinator with 4 fake CPU devices (SURVEY.md §4: "multi-node without a
cluster"), builds a global (data=4, seed=2) mesh spanning both processes,
solves a sharded IK batch via optik_tpu.parallel.ik_sharded, and checks its
*addressable* result shards against a locally-computed single-process
reference on the identical problem.  Exit code 0 = all shards match.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from optik_tpu import Robot, SolverConfig  # noqa: E402
from optik_tpu.models import asset_path  # noqa: E402
from optik_tpu.parallel import distributed, mesh as mesh_mod  # noqa: E402
from optik_tpu.solver import ik as ik_mod  # noqa: E402


def main():
    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    robot = Robot.from_urdf_file(asset_path("ur3e.urdf"), "ur_base_link",
                                 "ur_ee_link")
    a = robot.num_positions()

    # Identical problem in every process (same seed).
    rng = np.random.default_rng(1234)
    B = 32
    qt = rng.random((B, a))
    tr, tt = np.asarray(robot.fk_batch(qt)[0]), np.asarray(
        robot.fk_batch(qt)[1])
    lo, hi = robot.joint_limits()
    lo = np.where(np.isfinite(lo), lo, -np.pi)
    hi = np.where(np.isfinite(hi), hi, np.pi)
    x0 = rng.uniform(lo, hi, size=(B, a))

    cfg = SolverConfig(max_restarts=8, seed_batch=8, max_iters=32)

    mesh = mesh_mod.make_mesh(jax.devices(), data=2 * nproc, seed=2)
    res = mesh_mod.ik_sharded(robot, cfg, tr, tt, x0, mesh)

    # Single-process reference on local devices (no mesh).
    ref_fn = ik_mod.build_batch_solver(robot.spec, cfg, robot.dtype)
    import jax.numpy as jnp

    ref = ref_fn(jnp.asarray(tr, robot.dtype), jnp.asarray(tt, robot.dtype),
                 jnp.asarray(x0, robot.dtype))
    ref_found = np.asarray(ref.found)
    ref_x = np.asarray(ref.x)
    ref_cost = np.asarray(ref.cost)

    # Each process validates the pose shards it can address.
    checked = 0
    for fshard, xshard, cshard in zip(res.found.addressable_shards,
                                      res.x.addressable_shards,
                                      res.cost.addressable_shards):
        sl = fshard.index[0]
        np.testing.assert_array_equal(np.asarray(fshard.data),
                                      ref_found[sl])
        np.testing.assert_allclose(np.asarray(xshard.data), ref_x[sl],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(cshard.data), ref_cost[sl],
                                   rtol=1e-9, atol=1e-12)
        checked += np.asarray(fshard.data).shape[0]
    assert checked >= B // nproc, f"process {pid} checked only {checked}"
    assert ref_found.sum() >= B - 1  # the problem itself must be solvable

    print(f"worker {pid}: {checked} poses checked OK", flush=True)


if __name__ == "__main__":
    main()
