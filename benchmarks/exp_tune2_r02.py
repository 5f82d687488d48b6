#!/usr/bin/env python3
"""Round-2 cascade tuning, part 2: capacity-safe 3-phase schedules.

Part 1 (exp_tune_r02.py) showed 3-phase schedules reach 519-529k solves/s
but lose ~0.18% success because the final full-budget phase was sized at
B/64 (256 poses) while ~12% of mid-phase entrants fail a 16-restart budget
(~246 poses) — right at capacity.  These candidates keep the final phase at
B/32 (512 poses).  Success is compared against the 2-phase baseline on the
SAME batches.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import jax
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
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
        return tr, tt, x0

    batches = [make_batch() for _ in range(5)]

    def run(tag, build):
        try:
            solve = build()
            for tr, tt, x0 in batches:          # residency + compile
                res = solve(tr, tt, x0)
                _ = int(jnp.sum(res.found.astype(jnp.int32)))
            lat, found, work = [], 0, 0
            for tr, tt, x0 in batches:
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                found += int(jnp.sum(res.found.astype(jnp.int32)))
                lat.append(time.perf_counter() - t1)
                if res.lane_iters is not None:
                    work += int(res.lane_iters)
            p50 = float(np.median(lat))
            print(json.dumps({
                "cfg": tag, "solves_per_s": round(B / p50, 1),
                "p50_ms": round(1e3 * p50, 2),
                "found": found,
                "success_rate": round(found / (B * len(batches)), 5),
                "lane_iters_per_batch": work // len(batches)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)

    run("2ph baseline 512/256", lambda: cascade.build_cascade_solver(
        robot.spec, cfg, p_blk=512, phase1_rounds=1, tail_div=8, p_blk2=256))

    run("2ph it1=24 p1=1024", lambda: cascade.build_cascade_solver(
        robot.spec, cfg, p_blk=1024, phase1_rounds=1, tail_div=8,
        p_blk2=256, phase1_iters=24))

    # part-1 anomaly re-check (likely a relay stall, 3-sample median)
    run("2ph it1=24 p1=512 (recheck)", lambda: cascade.build_cascade_solver(
        robot.spec, cfg, p_blk=512, phase1_rounds=1, tail_div=8,
        p_blk2=256, phase1_iters=24))

    run("3ph C1 final=512", lambda: cascade.build_multiphase_solver(
        robot.spec, cfg,
        screens=[{"seeds": 8, "rounds": 1, "p_blk": 512, "keep_div": 8},
                 {"seeds": 8, "rounds": 2, "p_blk": 256, "keep_div": 4}],
        final_p_blk=256))

    run("3ph C2 it1=24 final=512", lambda: cascade.build_multiphase_solver(
        robot.spec, cfg,
        screens=[{"seeds": 8, "rounds": 1, "iters": 24, "p_blk": 1024,
                  "keep_div": 4},
                 {"seeds": 8, "rounds": 2, "p_blk": 256, "keep_div": 8}],
        final_p_blk=256))

    run("3ph C3 mid3r final=512", lambda: cascade.build_multiphase_solver(
        robot.spec, cfg,
        screens=[{"seeds": 8, "rounds": 1, "p_blk": 512, "keep_div": 8},
                 {"seeds": 8, "rounds": 3, "p_blk": 256, "keep_div": 4}],
        final_p_blk=256))


if __name__ == "__main__":
    main()
