#!/usr/bin/env python3
"""On-chip experiment: N-phase cascade schedules.

Phase-cost model (C = one 512-wide block-iteration):
  baseline 2-phase (s8 screen, tail/8 @ 256): ~1056C + ~1056C = 2112C
  smaller final tails cut the replay: tail/32 -> ~264C
  a packed s4 or s2 pre-screen cuts the screen: 16 or 8 blocks vs 32

Run on the real chip:  timeout 1700 python benchmarks/exp_multiphase.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

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
    from optik_tpu.solver import cascade

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32,
                       tol_f=1e-6)
    B = 16384
    rng = np.random.default_rng(42)
    lo, hi = robot.joint_limits()

    def make_batch():
        q_tgt = rng.uniform(lo, hi, size=(B, n))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jax.device_put(
            jnp.asarray(rng.uniform(lo, hi, size=(B, n)), jnp.float32))
        jax.block_until_ready((tr, tt, x0))
        return tr, tt, x0

    S8 = {"seeds": 8, "rounds": 1, "p_blk": 512}
    configs = [
        # name, screens, final_p_blk
        ("2ph_t32", [dict(S8, keep_div=32)], 256),
        ("2ph_t16", [dict(S8, keep_div=16)], 256),
        ("3ph_s4", [{"seeds": 4, "rounds": 1, "p_blk": 512, "keep_div": 4},
                    dict(S8, keep_div=8)], 256),
        ("3ph_s2", [{"seeds": 2, "rounds": 1, "p_blk": 512, "keep_div": 2},
                    dict(S8, keep_div=8)], 256),
        ("3ph_s4_t16", [{"seeds": 4, "rounds": 1, "p_blk": 512,
                         "keep_div": 4},
                        dict(S8, keep_div=16)], 256),
        ("2ph_t32_f512", [dict(S8, keep_div=32)], 512),
    ]

    batches = [make_batch() for _ in range(6)]
    for name, screens, fpb in configs:
        try:
            solve = cascade.build_multiphase_solver(
                robot.spec, cfg, screens=screens, final_p_blk=fpb)
            res = solve(*batches[0])
            jax.block_until_ready(res)
            lat = []
            found = 0
            for tr, tt, x0 in batches:
                t0 = time.perf_counter()
                res = solve(tr, tt, x0)
                found += int(jnp.sum(res.found.astype(jnp.int32)))
                lat.append(time.perf_counter() - t0)
            p50 = float(np.median(lat))
            print(json.dumps({
                "config": name, "p50_ms": round(1e3 * p50, 2),
                "solves_per_s": round(B / p50, 1),
                "success": round(found / (B * len(batches)), 5),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 - report and move on
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
