#!/usr/bin/env python3
"""Round-5 schedule-knob re-check under the depth-16 pipelined protocol.

The r4 sweeps ran at depth 4, where ~5 ms/batch of per-dispatch relay
overhead masked small kernel-level differences; at depth 16+ the chain
rides the device-busy bound (artifacts/r05_main.out "depth"), so a 2-3%
schedule win is finally measurable.  Sweeps the screen tile width and the
Mosaic loop unroll on the production cascade at B=128k.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.ops.pallas import lm_kernel
    from optik_tpu.solver import cascade

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    B = 131072
    rng = np.random.default_rng(42)
    qt = rng.uniform(lo, hi, size=(B, 7))
    tr, tt = robot.fk_batch(qt)
    x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
    for a in (tr, tt, x0):
        np.asarray(a.ravel()[0])

    def measure(solve, depth=16, sets=3):
        res = solve(tr, tt, x0)
        fc = int(res.found_count)
        li = int(res.lane_iters)

        def one():
            t1 = time.perf_counter()
            acc = None
            for _ in range(depth):
                r = solve(tr, tt, x0)
                acc = r.found_count if acc is None else acc + r.found_count
            _ = int(acc)
            return (time.perf_counter() - t1) / depth

        one(); one()
        vals = sorted(one() for _ in range(sets))
        med = vals[1]
        return {"pipelined_ms": round(1e3 * med, 2),
                "solves_per_s": round(B / med, 1),
                "spread": round((vals[-1] - vals[0]) / med, 4),
                "sets_ms": [round(1e3 * v, 2) for v in vals],
                "found": fc, "lane_iters_per_solve": round(li / B, 1)}

    for unroll in (1, 2):
        lm_kernel.DEFAULT_UNROLL = unroll
        for p_blk in (512, 1024, 2048):
            try:
                t0 = time.time()
                solve, unit = cascade.build_default_solver(
                    robot.spec, cfg, dtype=jnp.float32, p_blk=p_blk)
                row = measure(solve)
                row.update({"p_blk": p_blk, "unroll": unroll,
                            "compile_s": round(time.time() - t0, 1)})
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"p_blk": p_blk, "unroll": unroll,
                                  "error": str(e)[-200:]}), flush=True)


if __name__ == "__main__":
    main()
