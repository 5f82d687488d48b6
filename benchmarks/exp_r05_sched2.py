#!/usr/bin/env python3
"""Round-5 second schedule sweep: finer tiles, deeper unroll, screen/mid
iteration budgets — all at the depth-16 pipelined protocol that resolves
percent-level differences (see exp_r05_sched.py).

Greedy order: screen-tile width at unroll 2 -> unroll depth at the best
tile -> screen/mid per-attempt iteration caps around the defaults ->
Quality config-2 under the promoted kernel.  Found-mask preservation is
asserted against the default schedule (the cascade's full-budget final
phase makes found independent of screen knobs absent overflow).
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
                "found": fc, "lane_iters_per_solve": round(li / B, 1)}

    def run(tag, **kw):
        try:
            t0 = time.time()
            if "screens" in kw:
                solve = cascade.build_multiphase_solver(
                    robot.spec, cfg, dtype=jnp.float32, **kw)
            else:
                solve, _u = cascade.build_default_solver(
                    robot.spec, cfg, dtype=jnp.float32, **kw)
            row = measure(solve)
            row.update({"variant": tag,
                        "compile_s": round(time.time() - t0, 1)})
            print(json.dumps(row), flush=True)
            return row
        except Exception as e:
            print(json.dumps({"variant": tag, "error": str(e)[-200:]}),
                  flush=True)
            return None

    # 1. tile width at unroll 2 (512 already recorded: 20.3 ms).
    lm_kernel.DEFAULT_UNROLL = 2
    for p in (256, 384, 640, 768):
        run(f"p{p}_u2", p_blk=p)

    # 2. unroll depth at the r5 default tile.
    for u in (3, 4):
        lm_kernel.DEFAULT_UNROLL = u
        run(f"p512_u{u}", p_blk=512)
    lm_kernel.DEFAULT_UNROLL = 2

    # 3. screen/mid iteration caps around the 12/24 defaults
    #    (found must stay 130,992: the final phase replays the full
    #    budget, so screen knobs can only move WORK, not the mask —
    #    unless capacity overflows, which the found field would show).
    for si, mi in ((10, 24), (14, 24), (12, 20), (12, 28), (10, 20)):
        run(f"s{si}_m{mi}_u2", screens=[
            {"seeds": 8, "rounds": 1, "iters": si, "p_blk": 512,
             "keep_div": 4},
            {"seeds": 8, "rounds": 2, "iters": mi, "p_blk": 256,
             "keep_div": 8}], final_p_blk=256)

    # 4. Quality config 2 under the unroll-2 kernel (p_blk 128).
    cfg_q = SolverConfig.create("quality", max_restarts=256, seed_batch=64,
                                max_iters=48)
    for Bq in (1024, 4096):
        qtq = np.random.default_rng(1).uniform(lo, hi, size=(Bq, 7))
        trq, ttq = robot.fk_batch(qtq)
        x0q = jnp.asarray(np.random.default_rng(1).uniform(
            lo, hi, size=(Bq, 7)), jnp.float32)
        for a in (trq, ttq, x0q):
            np.asarray(a.ravel()[0])
        for u in (1, 2):
            try:
                kfn = lm_kernel.build_kernel_solver(
                    robot.spec, cfg_q, jnp.float32, p_blk=128, unroll=u)
                res = kfn(trq, ttq, x0q)
                fc = int(np.asarray(res.found).sum())
                li = int(res.lane_iters)

                def one():
                    t1 = time.perf_counter()
                    last = None
                    for _ in range(8):
                        last = kfn(trq, ttq, x0q).found_count
                    _ = int(last)
                    return (time.perf_counter() - t1) / 8

                one(); one()
                vals = sorted(one() for _ in range(3))
                med = vals[1]
                print(json.dumps({
                    "variant": f"quality_B{Bq}_u{u}",
                    "pipelined_ms": round(1e3 * med, 2),
                    "solves_per_s": round(Bq / med, 1),
                    "spread": round((vals[-1] - vals[0]) / med, 4),
                    "found": fc,
                    "lane_iters_per_solve": round(li / Bq, 1)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"variant": f"quality_B{Bq}_u{u}",
                                  "error": str(e)[-200:]}), flush=True)


if __name__ == "__main__":
    main()
