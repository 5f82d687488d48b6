#!/usr/bin/env python3
"""Round-5 on-device experiment battery (one process, sections gated by
OPTIK_R05_SECTIONS=comma,list — default all):

  quality    VERDICT item 2: Quality-mode roofline at BASELINE config 2 —
             lane_iters_per_solve vs the block-granularity floor (p_blk
             sweep) + in-program engine rate at B in {1024, 4096}.
  seedshard  VERDICT item 1 (perf leg): the kernel-speed seed-sharded
             entry on the 1-chip degenerate (1,1) mesh vs the plain
             single-shot kernel — per-chip overhead of the shard_map +
             merge machinery.
  depth      VERDICT item 6: pipeline-depth sweep at B=128k on the
             production cascade (is the wall-to-busy gap environmental?).
  inprog     VERDICT item 6: in-program K-chained cascade at B=128k —
             the pure device+program rate with zero relay dispatch.
  b256k      VERDICT item 8: 256k steady-state series (5 sets) to settle
             the default batch question.
  unlimited  VERDICT item 7: max_restarts=0 at B=128k with planted
             never-converging poses — unlimited-mode overhead vs one
             round at production shape.
  gauge      weak item 5: diff-IK compile time at B=128k this process
             (run the section twice across two processes to show the
             persistent-cache hit).

Each section prints JSON lines; failures are logged and don't stop the
battery.  Run ON the TPU host, nothing else using the chip.
"""

import json
import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(obj):
    print(json.dumps(obj), flush=True)


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

    sections = os.environ.get(
        "OPTIK_R05_SECTIONS",
        "quality,seedshard,depth,inprog,b256k,unlimited,gauge").split(",")

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    dev = str(jax.devices()[0])
    log({"device": dev, "sections": sections})

    def make(b, seed=0):
        r = np.random.default_rng(seed)
        qt = r.uniform(lo, hi, size=(b, 7))
        tr, tt = robot.fk_batch(qt)
        x0 = jnp.asarray(r.uniform(lo, hi, size=(b, 7)), jnp.float32)
        for a in (tr, tt, x0):
            np.asarray(a.ravel()[0])
        return tr, tt, x0

    def pipe_ms(fn, depth=4, sets=3):
        """Chained executions, one scalar sync; median + spread of sets."""
        def one():
            t1 = time.perf_counter()
            last = None
            for _ in range(depth):
                r = fn()
                last = r.found_count if getattr(r, "found_count", None) \
                    is not None else jax.tree.leaves(r)[0]
            # Chained same-program executions complete in order; fetching
            # the LAST result's scalar is the sync point (memory: relay).
            _ = np.asarray(jax.tree.leaves(last)[0]).ravel()[0]
            return (time.perf_counter() - t1) / depth

        one(); one()  # warm chained dispatch
        vals = sorted(one() for _ in range(sets))
        med = vals[len(vals) // 2]
        return med, (vals[-1] - vals[0]) / med, [
            round(1e3 * v, 2) for v in vals]

    # --- quality ---------------------------------------------------------
    if "quality" in sections:
        try:
            from optik_tpu.ops.pallas import lm_kernel

            cfg_q = SolverConfig.create("quality", max_restarts=256,
                                        seed_batch=64, max_iters=48)
            for B in (1024, 4096):
                trq, ttq, x0q = make(B, seed=1)
                for p_blk in (16, 32, 64, 128):
                    try:
                        t0 = time.time()
                        kfn = lm_kernel.build_kernel_solver(
                            robot.spec, cfg_q, jnp.float32, p_blk=p_blk)
                        res = kfn(trq, ttq, x0q)
                        li = int(res.lane_iters)
                        fc = int(np.asarray(res.found).sum())
                        compile_s = time.time() - t0
                        med, spread, sets_ms = pipe_ms(
                            lambda: kfn(trq, ttq, x0q))
                        log({"section": "quality", "batch": B,
                             "p_blk": p_blk,
                             "pipelined_ms": round(1e3 * med, 2),
                             "solves_per_s": round(B / med, 1),
                             "spread": round(spread, 4),
                             "sets_ms": sets_ms,
                             "lane_iters": li,
                             "lane_iters_per_solve": round(li / B, 1),
                             "found": fc,
                             "compile_s": round(compile_s, 1)})
                    except Exception:
                        log({"section": "quality", "batch": B,
                             "p_blk": p_blk,
                             "error": traceback.format_exc()[-300:]})
                # In-program chain at the production tile (pure device
                # rate; 0 * cost defeats CSE).
                kfn = lm_kernel.build_kernel_solver(
                    robot.spec, cfg_q, jnp.float32, p_blk=128)
                K = 8

                @jax.jit
                def chain(tr_, tt_, x0_):
                    acc = jnp.zeros((), jnp.int32)
                    xcur = x0_
                    for _ in range(K):
                        r = kfn(tr_, tt_, xcur)
                        acc = acc + jnp.sum(r.found.astype(jnp.int32))
                        xcur = x0_ + 0.0 * r.cost[:, None]
                    return acc

                t0 = time.time()
                _ = int(chain(trq, ttq, x0q))
                compile_s = time.time() - t0
                t1 = time.perf_counter()
                _ = int(chain(trq, ttq, x0q))
                per = (time.perf_counter() - t1) / K
                log({"section": "quality", "batch": B, "inprogram": True,
                     "inprogram_ms_per_solve": round(1e3 * per, 2),
                     "inprogram_solves_per_s": round(B / per, 1),
                     "compile_s": round(compile_s, 1)})
        except Exception:
            log({"section": "quality",
                 "error": traceback.format_exc()[-400:]})

    # --- seedshard -------------------------------------------------------
    if "seedshard" in sections:
        try:
            from optik_tpu.ops.pallas import lm_kernel
            from optik_tpu.parallel import mesh as mesh_mod

            cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
            B = 32768
            trs, tts, x0s = make(B, seed=2)
            mesh = mesh_mod.make_mesh(jax.devices()[:1], data=1, seed=1)
            t0 = time.time()
            sfn = mesh_mod.build_seed_sharded_solver(robot, cfg, mesh,
                                                     interpret=False)
            res_s = sfn(trs, tts, x0s)
            fc_s = int(res_s.found_count)
            compile_s = time.time() - t0
            med_s, spread_s, sets_s = pipe_ms(lambda: sfn(trs, tts, x0s))

            kfn = lm_kernel.build_kernel_solver(robot.spec, cfg,
                                                jnp.float32, p_blk=256)
            res_k = kfn(trs, tts, x0s)
            fc_k = int(np.asarray(res_k.found).sum())
            bitwise = bool(np.array_equal(np.asarray(res_s.found),
                                          np.asarray(res_k.found)))
            med_k, spread_k, sets_k = pipe_ms(lambda: kfn(trs, tts, x0s))
            log({"section": "seedshard", "batch": B,
                 "sharded_ms": round(1e3 * med_s, 2),
                 "sharded_solves_per_s": round(B / med_s, 1),
                 "sharded_spread": round(spread_s, 4),
                 "sharded_sets_ms": sets_s,
                 "plain_ms": round(1e3 * med_k, 2),
                 "plain_solves_per_s": round(B / med_k, 1),
                 "plain_sets_ms": sets_k,
                 "overhead_pct": round(100 * (med_s / med_k - 1), 2),
                 "found_sharded": fc_s, "found_plain": fc_k,
                 "found_mask_bitwise_equal": bitwise,
                 "compile_s": round(compile_s, 1)})
        except Exception:
            log({"section": "seedshard",
                 "error": traceback.format_exc()[-400:]})

    # --- depth / inprog / b256k / unlimited ------------------------------
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)

    if "depth" in sections or "inprog" in sections \
            or "unlimited" in sections:
        B = 131072
        tr, tt, x0 = make(B, seed=42)

    if "depth" in sections:
        try:
            for depth in (2, 4, 8, 16, 32):
                fn = lambda: robot.ik_batch(cfg, tr, tt, x0,
                                            validate_seeds=False,
                                            rescue_overflow=False)
                med, spread, sets_ms = pipe_ms(fn, depth=depth)
                log({"section": "depth", "batch": B, "depth": depth,
                     "pipelined_ms": round(1e3 * med, 2),
                     "solves_per_s": round(B / med, 1),
                     "spread": round(spread, 4), "sets_ms": sets_ms})
        except Exception:
            log({"section": "depth",
                 "error": traceback.format_exc()[-400:]})

    if "inprog" in sections:
        try:
            from optik_tpu.solver import cascade

            csc, unit = cascade.build_default_solver(robot.spec, cfg,
                                                     dtype=jnp.float32)
            K = 2

            @jax.jit
            def chain2(tr_, tt_, x0_):
                acc = jnp.zeros((), jnp.int32)
                xcur = x0_
                for _ in range(K):
                    r = csc(tr_, tt_, xcur)
                    acc = acc + r.found_count
                    xcur = x0_ + 0.0 * r.cost[:, None]
                return acc

            t0 = time.time()
            _ = int(chain2(tr, tt, x0))
            compile_s = time.time() - t0
            vals = []
            for _ in range(3):
                t1 = time.perf_counter()
                _ = int(chain2(tr, tt, x0))
                vals.append((time.perf_counter() - t1) / K)
            vals.sort()
            med = vals[1]
            log({"section": "inprog", "batch": B, "k": K,
                 "inprogram_ms_per_batch": round(1e3 * med, 2),
                 "inprogram_solves_per_s": round(B / med, 1),
                 "sets_ms": [round(1e3 * v, 2) for v in vals],
                 "compile_s": round(compile_s, 1)})
        except Exception:
            log({"section": "inprog",
                 "error": traceback.format_exc()[-400:]})

    if "b256k" in sections:
        try:
            B2 = 262144
            tr2, tt2, x02 = make(B2, seed=7)
            fn = lambda: robot.ik_batch(cfg, tr2, tt2, x02,
                                        validate_seeds=False,
                                        rescue_overflow=False)
            med, spread, sets_ms = pipe_ms(fn, depth=4, sets=5)
            log({"section": "b256k", "batch": B2,
                 "pipelined_ms": round(1e3 * med, 2),
                 "solves_per_s": round(B2 / med, 1),
                 "spread": round(spread, 4), "sets_ms": sets_ms})
        except Exception:
            log({"section": "b256k",
                 "error": traceback.format_exc()[-400:]})

    if "unlimited" in sections:
        try:
            # Plant 0.5% never-converging poses (targets translated 3 m
            # out of the workspace): every unlimited round runs to the
            # cap — the worst-case host-orchestration overhead.
            n_bad = B // 200
            tt_bad = np.asarray(tt).copy()
            tt_bad[:n_bad, 2] += 3.0
            tt_bad = jnp.asarray(tt_bad)
            np.asarray(tt_bad.ravel()[0])
            cfg_u = cfg.replace(max_restarts=0, unlimited_rounds_cap=4)

            # Reference point: one 64-restart round on the same batch.
            t1 = time.perf_counter()
            r1 = robot.ik_batch(cfg, tr, tt_bad, x0,
                                validate_seeds=False,
                                rescue_overflow=False)
            f1 = int(np.asarray(r1.found).sum())
            dt1 = time.perf_counter() - t1

            t1 = time.perf_counter()
            ru = robot.ik_batch(cfg_u, tr, tt_bad, x0,
                                validate_seeds=False)
            fu = int(np.asarray(ru.found).sum())
            dtu = time.perf_counter() - t1
            # Second pass: everything warm (all round batch shapes
            # compiled), the steady-state number.
            t1 = time.perf_counter()
            ru = robot.ik_batch(cfg_u, tr, tt_bad, x0,
                                validate_seeds=False)
            dtu2 = time.perf_counter() - t1
            log({"section": "unlimited", "batch": B,
                 "planted_unreachable": n_bad,
                 "rounds_cap": 4,
                 "one_round_ms": round(1e3 * dt1, 1),
                 "one_round_found": f1,
                 "unlimited_ms_cold": round(1e3 * dtu, 1),
                 "unlimited_ms_warm": round(1e3 * dtu2, 1),
                 "unlimited_found": fu,
                 "unlimited_solves_per_s_warm": round(B / dtu2, 1),
                 "overhead_vs_one_round": round(dtu2 / dt1, 2)})
        except Exception:
            log({"section": "unlimited",
                 "error": traceback.format_exc()[-400:]})

    if "gauge" in sections:
        try:
            Bg = 131072
            r = np.random.default_rng(5)
            x0g = jnp.asarray(r.uniform(lo, hi, size=(Bg, 7)), jnp.float32)
            vweg = jnp.asarray(r.standard_normal((Bg, 6)) * 0.2,
                               jnp.float32)
            vmg = jnp.asarray(np.full((Bg, 7), 0.75), jnp.float32)
            for a in (x0g, vweg, vmg):
                np.asarray(a.ravel()[0])
            t0 = time.time()
            out = robot.diff_ik_batch(x0g, vweg, vmg, rescue=False)
            ok_rate = float(np.asarray(out[2]).mean())
            compile_s = time.time() - t0
            vals = []
            for _ in range(3):
                t1 = time.perf_counter()
                out = robot.diff_ik_batch(x0g, vweg, vmg, rescue=False)
                _ = np.asarray(out[0].ravel()[0])
                vals.append(time.perf_counter() - t1)
            vals.sort()
            log({"section": "gauge", "batch": Bg,
                 "first_call_s": round(compile_s, 1),
                 "steady_ms": round(1e3 * vals[1], 2),
                 "steps_per_s": round(Bg / vals[1], 1),
                 "ok_rate": round(ok_rate, 5),
                 "note": "run this section in a SECOND process to record "
                         "the persistent-cache first_call_s"})
        except Exception:
            log({"section": "gauge",
                 "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
