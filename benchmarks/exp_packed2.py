#!/usr/bin/env python3
"""On-chip A/B: broadcast-row targets (g=1) + freeze lowerings (g>1).

Follow-up to exp_packed.py: (a) g=1 kernels keep (1, P) broadcast target
rows — materialized 8-row targets turn every target op into 4 vregs; (b) the
pose-packed Speed freeze can lower as a block-diagonal matmul or as static
sublane slices — measure both.

Run on the real chip:  timeout 1800 python benchmarks/exp_packed2.py
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
    from optik_tpu.solver import cascade, lm_soa

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

    def kern(r, s, it, p):
        cfg = SolverConfig(max_restarts=r, seed_batch=s, max_iters=it,
                           tol_f=1e-6)
        return lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=p)

    def casc(r, s, it, p, rounds1, p2, tdiv=8):
        cfg = SolverConfig(max_restarts=r, seed_batch=s, max_iters=it,
                           tol_f=1e-6)
        return cascade.build_cascade_solver(robot.spec, cfg, p_blk=p,
                                            phase1_rounds=rounds1,
                                            tail_div=tdiv, p_blk2=p2)

    # g=1 with restored broadcast targets (same-process baselines).
    bench("kern_r8_s8_p512_bcast", kern(8, 8, 32, 512))
    bench("casc_s8_r1x8_p512_bcast", casc(64, 8, 32, 512, 1, 256))

    # Freeze lowering A/B at s=4 (screen shape).
    lm_soa.GROUP_ANY = "matmul"
    bench("kern_r8_s4_matmul", kern(8, 4, 32, 512))
    lm_soa.GROUP_ANY = "slices"
    bench("kern_r8_s4_slices", kern(8, 4, 32, 512))

    # Best packed cascade with the slices lowering.
    bench("casc_s4_r2x4_slices", casc(64, 4, 32, 512, 2, 256))
    lm_soa.GROUP_ANY = "matmul"
    bench("casc_s4_r2x4_matmul", casc(64, 4, 32, 512, 2, 256))


if __name__ == "__main__":
    sys.exit(main())
