#!/usr/bin/env python3
"""Round-4 session 2: schedule refinement around the r04_main winner (v4),
then the headline bench + BASELINE workloads with the new default — all in
ONE process (relay chip grants are expensive).

Refinement hypotheses (v4 = screen12/keep4 + mid 2r/keep16 + final,
227.5 lane-iters/solve, 4.76M solves/s):
  d0   the new build_default_solver (should reproduce v4)
  v6   mid 1 round instead of 2 (halves mid cost; mid failures still get
       the full final replay, found unchanged)
  v7   v4 with mid keep_div 32 (final shrinks to B/128; post-mid failures
       were ~0.06% << 0.78% capacity)
  v8   v6 + keep_div 32
  big  winner at B=262144 (batch-size amortization check)
"""

import json
import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def log(obj):
    print(json.dumps(obj), flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.solver import cascade

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    log({"session": "r04_sched2", "device": str(jax.devices()[0])})

    def make_batch(B):
        q_tgt = rng.uniform(lo, hi, size=(B, 7))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
        for a in (tr, tt, x0):
            np.asarray(a.ravel()[0])
        return tr, tt, x0

    def measure(name, solve, tr, tt, x0, B, depth=4, sets=3):
        try:
            t0 = time.time()
            res = solve(tr, tt, x0)
            fc = int(res.found_count)
            compile_s = time.time() - t0
            li = int(res.lane_iters)

            def pipe():
                t1 = time.perf_counter()
                acc = None
                for _ in range(depth):
                    r2 = solve(tr, tt, x0)
                    acc = r2.found_count if acc is None \
                        else acc + r2.found_count
                _ = int(acc)
                return (time.perf_counter() - t1) / depth

            pipe(); pipe()
            vals = [pipe() for _ in range(sets)]
            p50 = float(np.median(vals))
            log({"section": "sched2", "variant": name,
                 "pipelined_ms": round(1e3 * p50, 2),
                 "solves_per_s": round(B / p50, 1),
                 "lane_iters_per_solve": round(li / B, 1),
                 "found": fc, "success_rate": round(fc / B, 5),
                 "spread": round((max(vals) - min(vals)) / np.median(vals),
                                 4),
                 "compile_s": round(compile_s, 1), "batch": B})
            return B / p50
        except Exception:
            log({"section": "sched2", "variant": name,
                 "error": traceback.format_exc()[-400:]})
            return 0.0

    B = 131072
    tr, tt, x0 = make_batch(B)

    d0, _unit = cascade.build_default_solver(robot.spec, cfg,
                                             dtype=jnp.float32)
    measure("d0_new_default", d0, tr, tt, x0, B)

    def screens(mid_rounds, mid_keep):
        return [{"seeds": 8, "rounds": 1, "iters": 12, "p_blk": 1024,
                 "keep_div": 4},
                {"seeds": 8, "rounds": mid_rounds, "p_blk": 256,
                 "keep_div": mid_keep}]

    rates = {}
    for name, mr, mk in (("v6_mid1r_keep16", 1, 16),
                         ("v7_mid2r_keep32", 2, 32),
                         ("v8_mid1r_keep32", 1, 32)):
        solve = cascade.build_multiphase_solver(
            robot.spec, cfg, dtype=jnp.float32, screens=screens(mr, mk),
            final_p_blk=256)
        rates[name] = measure(name, solve, tr, tt, x0, B)

    # Winner at 256k (fresh batch; the 128k one stays for comparability).
    best = max(rates, key=rates.get) if rates else None
    if best and rates[best] > 0:
        mr, mk = {"v6_mid1r_keep16": (1, 16), "v7_mid2r_keep32": (2, 32),
                  "v8_mid1r_keep32": (1, 32)}[best]
        B2 = 262144
        tr2, tt2, x02 = make_batch(B2)
        solve = cascade.build_multiphase_solver(
            robot.spec, cfg, dtype=jnp.float32, screens=screens(mr, mk),
            final_p_blk=256)
        measure(f"big256k_{best}", solve, tr2, tt2, x02, B2)

    # ---- headline bench with the new default ----------------------------
    if os.environ.get("OPTIK_R04_BENCH", "1") == "1":
        log({"section": "bench", "note": "bench.py main() inline"})
        sys.argv = ["bench.py"]
        import bench

        try:
            bench.main()
        except Exception:
            log({"section": "bench",
                 "error": traceback.format_exc()[-400:]})

    # ---- BASELINE workloads (configs 2-5) -------------------------------
    if os.environ.get("OPTIK_R04_WORKLOADS", "1") == "1":
        log({"section": "workloads", "note": "bench_workloads main() inline"})
        import bench_workloads

        try:
            bench_workloads.main()
        except Exception:
            log({"section": "workloads",
                 "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
