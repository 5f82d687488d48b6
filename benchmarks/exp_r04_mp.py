#!/usr/bin/env python3
"""Round-4 session 4: motion-planning with dispatch-amortizing chunks,
full ~1M-pose sweep, and clean diff-IK batch-size points.  One process."""

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

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    log({"session": "r04_mp", "device": str(jax.devices()[0])})

    # --- motion planning: chunk-size sweep + full ~1M --------------------
    try:
        solve = lambda a, b, c: robot.ik_batch(cfg, a, b, c,
                                               validate_seeds=False)

        def run_sweep(chunk, n_chunks, repeats=3):
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

            rates, found = [], 0
            for _ in range(repeats):
                found, dt = sweep()
                rates.append(chunk * n_chunks / dt)
            return rates, found

        for chunk, n_chunks in ((8192, 16), (32768, 4), (65536, 2)):
            rates, found = run_sweep(chunk, n_chunks)
            log({"section": "mp_chunks", "chunk": chunk,
                 "n_chunks": n_chunks,
                 "sweeps_solves_per_s": [round(r, 1) for r in rates],
                 "median": round(float(np.median(rates)), 1),
                 "success_rate": round(found / (chunk * n_chunks), 4)})

        # Full ~1M-pose sweep at the amortizing chunk size.
        rates, found = run_sweep(32768, 30, repeats=2)
        log({"section": "mp_1m", "chunk": 32768, "poses": 32768 * 30,
             "sweeps_solves_per_s": [round(r, 1) for r in rates],
             "best": round(max(rates), 1),
             "success_rate": round(found / (32768 * 30), 4)})
    except Exception:
        log({"section": "mp", "error": traceback.format_exc()[-400:]})

    # --- diff-IK: clean batch-size points --------------------------------
    v_dir = np.array([0, 0, 0.1, 0, 0, 0.0])
    for B in (16384, 131072):
        try:
            x0d = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
            v_we = jnp.asarray(np.tile(v_dir, (B, 1)), jnp.float32)
            v_max = jnp.asarray(np.full((B, 7), 0.75), jnp.float32)
            for a in (x0d, v_we, v_max):
                np.asarray(a.ravel()[0])
            t0 = time.time()
            a_, v_, ok_ = robot.diff_ik_batch(x0d, v_we, v_max)
            okr = float(np.asarray(ok_).mean())
            compile_s = time.time() - t0
            DEPTH = 8

            def pipe():
                t1 = time.perf_counter()
                last = None
                for _ in range(DEPTH):
                    last = robot.diff_ik_batch(x0d, v_we, v_max)
                _ = np.asarray(last[0][0])
                return (time.perf_counter() - t1) / DEPTH

            pipe(); pipe()
            vals = [pipe() for _ in range(3)]
            p50 = float(np.median(vals))
            log({"section": "diffik2", "batch": B,
                 "ok_rate": round(okr, 4),
                 "pipelined_steps_per_s": round(B / p50, 1),
                 "pipelined_ms": round(1e3 * p50, 2),
                 "spread": round((max(vals) - min(vals)) / np.median(vals),
                                 4),
                 "compile_s": round(compile_s, 1)})
        except Exception:
            log({"section": "diffik2", "batch": B,
                 "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
