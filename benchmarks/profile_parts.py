#!/usr/bin/env python3
"""Component-level timing on the live device: where does an LM iteration go?

Times (per call, averaged, with block_until_ready):
  * fused residual+Jacobian over L lanes
  * 6x6 SPD solve: lax.linalg.cholesky + 2 triangular solves vs explicit
    unrolled LDL^T
  * cost-only evaluation
  * a full LM solve (while_loop) at max_iters, for reference
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.ops import objective as O
    from optik_tpu.solver import ik as ik_mod, lm
    from optik_tpu.utils.precision import with_f32_matmuls

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    params = robot.params
    L = 32768
    rng = np.random.default_rng(0)
    lo, hi = robot.joint_limits()
    q = jnp.asarray(rng.uniform(lo, hi, size=(L, 7)), jnp.float32)
    qt = rng.uniform(lo, hi, size=(L, 7))
    tr, tt = robot.fk_batch(qt)
    tr = jnp.asarray(np.asarray(tr), jnp.float32)
    tt = jnp.asarray(np.asarray(tt), jnp.float32)

    @with_f32_matmuls
    @jax.jit
    def rj(q, tr, tt):
        return jax.vmap(lambda a, b, c: O.residual_and_jacobian(
            params, a, b, c))(q, tr, tt)

    @with_f32_matmuls
    @jax.jit
    def cost_only(q, tr, tt):
        return jax.vmap(lambda a, b, c: O.objective(
            params, a, b, c))(q, tr, tt)

    r, j = rj(q, tr, tt)

    @with_f32_matmuls
    @jax.jit
    def chol_solve(j, r, lam):
        jjt = jnp.einsum("lia,lja->lij", j, j)
        sys = jjt + lam[:, None, None] * jnp.eye(6, dtype=jnp.float32)
        c = jax.lax.linalg.cholesky(sys)
        y = jax.lax.linalg.triangular_solve(c, r[..., None], left_side=True,
                                            lower=True)
        z = jax.lax.linalg.triangular_solve(c, y, left_side=True, lower=True,
                                            transpose_a=True)
        return jnp.einsum("lia,li->la", j, z[..., 0])

    lam = jnp.full((L,), 1e-4, jnp.float32)

    @with_f32_matmuls
    @jax.jit
    def full_solve(seeds, tr, tt):
        return lm.solve(params, seeds, tr, tt,
                        ik_mod.options_from_config(
                            SolverConfig(max_restarts=1, max_iters=48)))

    t_rj = timeit(rj, q, tr, tt)
    t_cost = timeit(cost_only, q, tr, tt)
    t_chol = timeit(chol_solve, j, r, lam)
    t_full = timeit(full_solve, q, tr, tt, n=3)

    print(f"L = {L}")
    print(f"residual+jacobian : {t_rj*1e3:8.2f} ms  ({t_rj/L*1e9:7.1f} ns/lane)")
    print(f"cost only         : {t_cost*1e3:8.2f} ms")
    print(f"6x6 chol solve    : {t_chol*1e3:8.2f} ms")
    print(f"LM 48 iters       : {t_full*1e3:8.2f} ms "
          f"({t_full/48*1e3:6.2f} ms/iter)")
    est = t_rj + t_cost + t_chol
    print(f"sum of parts/iter : {est*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
