#!/usr/bin/env python3
"""Round-4 session 3: final schedule validation.

  dK8_128k   the capacity-safe production default (screen12/keep4 +
             mid 2r/keep8 + final) at B=131072
  v9_mid24   same but mid attempts capped at 24 iters (cheaper rounds;
             capacity unchanged — candidate only if found is FULL)
  big256k    winner at B=262144 (batch-amortization datapoint)
  mp         motion-planning steady sweep re-measure (session-2 anomaly:
             steady 1.23M < cold 2.05M — suspected relay stall)
"""

import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

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
    log({"session": "r04_final", "device": str(jax.devices()[0])})

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
            log({"section": "final", "variant": name,
                 "pipelined_ms": round(1e3 * p50, 2),
                 "solves_per_s": round(B / p50, 1),
                 "lane_iters_per_solve": round(li / B, 1),
                 "found": fc, "success_rate": round(fc / B, 5),
                 "spread": round((max(vals) - min(vals)) / np.median(vals),
                                 4),
                 "compile_s": round(compile_s, 1), "batch": B})
            return B / p50, fc
        except Exception:
            log({"section": "final", "variant": name,
                 "error": traceback.format_exc()[-400:]})
            return 0.0, 0

    B = 131072
    tr, tt, x0 = make_batch(B)

    d, _unit = cascade.build_default_solver(robot.spec, cfg,
                                            dtype=jnp.float32)
    r_d, f_d = measure("dK8_128k_default", d, tr, tt, x0, B)

    v9 = cascade.build_multiphase_solver(
        robot.spec, cfg, dtype=jnp.float32,
        screens=[{"seeds": 8, "rounds": 1, "iters": 12, "p_blk": 1024,
                  "keep_div": 4},
                 {"seeds": 8, "rounds": 2, "iters": 24, "p_blk": 256,
                  "keep_div": 8}], final_p_blk=256)
    r_v9, f_v9 = measure("v9_mid24iters", v9, tr, tt, x0, B)

    win = v9 if (f_v9 >= f_d and r_v9 > r_d) else d
    win_name = "v9_mid24iters" if win is v9 else "dK8_default"
    B2 = 262144
    tr2, tt2, x02 = make_batch(B2)
    measure(f"big256k_{win_name}", win, tr2, tt2, x02, B2)

    # --- motion-planning steady sweep re-measure -------------------------
    try:
        chunk = 8192
        n_chunks = 16
        solve = lambda a, b, c: robot.ik_batch(cfg, a, b, c,
                                               validate_seeds=False)
        chunks = []
        for _ in range(n_chunks):
            qt = rng.uniform(lo, hi, size=(chunk, 7))
            trc, ttc = robot.fk_batch(qt)
            x0c = jnp.asarray(rng.uniform(lo, hi, size=(chunk, 7)),
                              jnp.float32)
            chunks.append((trc, ttc, x0c))
        for c in chunks:
            for a in c:
                np.asarray(a.ravel()[0])
        out = solve(*chunks[0])
        _ = int(out.found_count)

        def sweep():
            t0 = time.perf_counter()
            count = jnp.zeros((), jnp.int32)
            for trc, ttc, x0c in chunks:
                out = solve(trc, ttc, x0c)
                count = count + out.found_count
            found = int(count)
            return found, time.perf_counter() - t0

        rates = []
        found = 0
        for _ in range(4):
            found, dt = sweep()
            rates.append(chunk * n_chunks / dt)
        log({"section": "final", "variant": "motion_planning_16x8192",
             "sweeps_solves_per_s": [round(r, 1) for r in rates],
             "best": round(max(rates), 1), "median": round(
                 float(np.median(rates)), 1),
             "success_rate": round(found / (chunk * n_chunks), 4)})
    except Exception:
        log({"section": "final", "variant": "mp",
             "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
