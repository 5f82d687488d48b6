#!/usr/bin/env python3
"""On-chip experiment: pose-packed phase-1 screening in the cascade.

Hypothesis: the screening pass does not need 8 seed lanes per pose — with
S=2 (or 4) seeds the kernel packs 4 (or 2) poses per tile column, covering
the whole batch in proportionally fewer grid blocks at the same lane cost.
Failures still get the full-budget replay, so the success rate is bounded
below by the single-shot schedule; only the phase-1/phase-2 split moves.

Prints one JSON line per config.  Run on the real chip:
    timeout 1700 python benchmarks/exp_phase1_pack.py
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

    # (name, p_blk, phase1_rounds, tail_div, p_blk2, phase1_seeds,
    #  phase1_iters)
    configs = [
        ("baseline_s8_r1", 512, 1, 8, 256, None, None),
        ("s2_r1_t8", 512, 1, 8, 256, 2, None),
        ("s2_r2_t16", 512, 2, 16, 256, 2, None),
        ("s4_r1_t8", 512, 1, 8, 256, 4, None),
        ("s2_r2_t16_i24", 512, 2, 16, 256, 2, 24),
        ("s2_r3_t16", 512, 3, 16, 256, 2, None),
    ]

    batches = [make_batch() for _ in range(6)]
    for (name, p_blk, r1, tdiv, pb2, s1, i1) in configs:
        try:
            solve = cascade.build_cascade_solver(
                robot.spec, cfg, p_blk=p_blk, phase1_rounds=r1,
                tail_div=tdiv, p_blk2=pb2, phase1_seeds=s1, phase1_iters=i1)
            res = solve(*batches[0])  # compile + warm
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
