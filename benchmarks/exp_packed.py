#!/usr/bin/env python3
"""On-chip experiment: pose-packed kernel layouts (S seeds x 8/S poses/tile).

The sublane dimension of a f32 tile is fixed at 8; dedicating all 8 rows to
restart seeds of one pose (S=8) means per-iteration cost scales with 8 lanes
per pose.  Packing G = 8/S poses per tile column spends the same restart
budget through more reseeding rounds instead — the straggler-free screening
cost should drop ~G-fold.  Measures packed single-shot kernels and packed
cascades against the S=8 baselines.

Run on the real chip:  timeout 1800 python benchmarks/exp_packed.py
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
    from optik_tpu.solver import cascade

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

    def casc(r, s, it, p, rounds1, p2):
        cfg = SolverConfig(max_restarts=r, seed_batch=s, max_iters=it,
                           tol_f=1e-6)
        return cascade.build_cascade_solver(robot.spec, cfg, p_blk=p,
                                            phase1_rounds=rounds1,
                                            tail_div=8, p_blk2=p2)

    # Baselines (S=8).
    bench("kern_r64_s8_p256", kern(64, 8, 32, 256))
    bench("casc_s8_r1x8_p512", casc(64, 8, 32, 512, 1, 256))

    # Packed single-shot.
    bench("kern_r64_s4_p512", kern(64, 4, 32, 512))
    bench("kern_r64_s2_p512", kern(64, 2, 32, 512))
    bench("kern_r64_s1_p512", kern(64, 1, 32, 512))

    # Packed screening cost (phase-1 shapes).
    bench("kern_r8_s4_p512", kern(8, 4, 32, 512))
    bench("kern_r4_s4_p512", kern(4, 4, 32, 512))

    # Packed cascades: screen with 4 (or 2) seed rows, replay failures.
    bench("casc_s4_r1x4_p512", casc(64, 4, 32, 512, 1, 256))
    bench("casc_s4_r2x4_p512", casc(64, 4, 32, 512, 2, 256))
    bench("casc_s2_r2x2_p512", casc(64, 2, 32, 512, 2, 256))


if __name__ == "__main__":
    sys.exit(main())
