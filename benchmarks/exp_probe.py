#!/usr/bin/env python3
"""Probe: which Pallas kernel block configs compile on the current relay."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time
import traceback

import numpy as np


def main():
    import jax

    import pathlib as _pl
    jax.config.update(
        "jax_compilation_cache_dir",
        str(_pl.Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.ops.pallas import lm_kernel

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    B = 1024

    q_tgt = rng.uniform(lo, hi, size=(B, n))
    tr, tt = robot.fk_batch(q_tgt)
    x0 = jax.device_put(
        jnp.asarray(rng.uniform(lo, hi, size=(B, n)), jnp.float32))
    jax.block_until_ready((tr, tt, x0))

    for name, r, s, it, p in [
        ("r64_s8_i32_p256", 64, 8, 32, 256),
        ("r64_s8_i32_p512", 64, 8, 32, 512),
        ("r8_s8_i32_p256", 8, 8, 32, 256),
        ("r8_s8_i32_p512", 8, 8, 32, 512),
        ("r64_s8_i32_p128", 64, 8, 32, 128),
    ]:
        cfg = SolverConfig(max_restarts=r, seed_batch=s, max_iters=it,
                           tol_f=1e-6)
        t0 = time.perf_counter()
        try:
            solve = lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=p)
            res = solve(tr, tt, x0)
            ok = int(jnp.sum(res.found.astype(jnp.int32)))
            print(json.dumps({"config": name, "ok": True, "succ": ok,
                              "compile_s": round(time.perf_counter() - t0,
                                                 1)}), flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            print(json.dumps({"config": name, "ok": False,
                              "err": msg[0][:200] if msg else ""}),
                  flush=True)


if __name__ == "__main__":
    main()
