#!/usr/bin/env python3
"""On-chip experiment: straggler cost of full-budget blocks vs a cascade.

Hypothesis: with Speed-mode pose freezing, a single non-converging pose in
a Pallas pose-block forces the block through its whole restart budget
((max_iters+1) * rounds lockstep iterations) while clean blocks exit in a
few dozen; a two-phase cascade (screen all poses with a one-round budget,
compact the failures, re-solve only them at the full budget) removes the
straggler waste.

Prints one JSON line per config.  Run on the real chip:
    timeout 1800 python benchmarks/exp_cascade.py
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
    from optik_tpu.ops.pallas import lm_kernel

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    B = 16384

    def make_batch():
        q_tgt = rng.uniform(lo, hi, size=(B, n))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jax.device_put(
            jnp.asarray(rng.uniform(lo, hi, size=(B, n)), jnp.float32))
        jax.block_until_ready((tr, tt, x0))
        return tr, tt, x0

    batches = [make_batch() for _ in range(6)]

    def bench(name, solve, extra=None):
        # Warmup/compile on batch 0, time on the rest, sync via scalar.
        t0 = time.perf_counter()
        res = solve(*batches[0])
        n_ok = int(jnp.sum(res.found.astype(jnp.int32)))
        compile_s = time.perf_counter() - t0
        lat, oks = [], [n_ok]
        for tr, tt, x0 in batches[1:]:
            t1 = time.perf_counter()
            res = solve(tr, tt, x0)
            oks.append(int(jnp.sum(res.found.astype(jnp.int32))))
            lat.append(time.perf_counter() - t1)
        p50 = float(np.median(lat))
        rec = {
            "config": name,
            "solves_per_s": round(B / p50, 1),
            "p50_ms": round(1e3 * p50, 2),
            "p90_ms": round(1e3 * float(np.percentile(lat, 90)), 2),
            "success": round(float(np.sum(oks[1:]) / (B * len(lat))), 5),
            "compile_s": round(compile_s, 1),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return rec

    def kernel_solver(r, s, it, p):
        cfg = SolverConfig(max_restarts=r, seed_batch=s, max_iters=it,
                           tol_f=1e-6)
        return lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=p)

    # 1. Current production config.
    bench("r64_s8_i32_p512", kernel_solver(64, 8, 32, 512))
    # 2. Narrower blocks: fewer poses share a straggler.
    bench("r64_s8_i32_p256", kernel_solver(64, 8, 32, 256))
    # 3. Single round (no reseed): uniform budget, measures phase-1 cost
    #    and the fraction needing a second phase.
    r1 = bench("r8_s8_i32_p512", kernel_solver(8, 8, 32, 512))
    # 4. Phase-1 alternative: shorter attempts.
    bench("r8_s8_i16_p512", kernel_solver(8, 8, 16, 512))

    # 5. Cascade: phase 1 = r8/i32 over all poses, compact failures,
    #    phase 2 = r64/i32 on a fixed-size tail batch.
    tail_frac = max(1.0 - r1["success"], 1e-4)
    b2 = 2048 if tail_frac * B * 4 > 1024 else 1024
    solve1 = kernel_solver(8, 8, 32, 512)
    solve2 = kernel_solver(64, 8, 32, 256)

    @jax.jit
    def compact(found, tr, tt, x0):
        order = jnp.argsort(found.astype(jnp.int32))  # failures first
        idx = order[:b2]
        return idx, tr[idx], tt[idx], x0[idx]

    @jax.jit
    def merge(res1, idx, res2):
        take2 = ~res1.found[idx] & res2.found
        found = res1.found.at[idx].set(res1.found[idx] | res2.found)
        x = res1.x.at[idx].set(jnp.where(take2[:, None], res2.x,
                                         res1.x[idx]))
        cost = res1.cost.at[idx].set(jnp.where(take2, res2.cost,
                                               res1.cost[idx]))
        return res1._replace(found=found, x=x, cost=cost)

    def cascade(tr, tt, x0):
        res1 = solve1(tr, tt, x0)
        idx, tr2, tt2, x02 = compact(res1.found, tr, tt, x0)
        res2 = solve2(tr2, tt2, x02)
        return merge(res1, idx, res2)

    bench("cascade_r8i32_then_r64i32_b2k", cascade,
          {"tail_batch": b2, "phase1_success": r1["success"]})


if __name__ == "__main__":
    main()
