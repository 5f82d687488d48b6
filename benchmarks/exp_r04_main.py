#!/usr/bin/env python3
"""Round-4 consolidated on-device session (ONE process: the relay makes
per-process chip grants expensive, see docs/DESIGN notes).

Sections (each guarded; one JSON line per measurement):
  sched    cascade-schedule sweep: lane-iters/solve vs screen budgets,
           difficulty-sorted compaction, presort (VERDICT r3 item 2)
  diffik   zonotope-gauge diff-IK throughput, BASELINE config 4 shape
           (VERDICT r3 item 1)
  quality  Quality-mode wall vs engine gap: synced / pipelined-depth /
           in-program chain split (VERDICT r3 item 3)
  latency  B=8 single-shot dispatch/RTT/device split (VERDICT r3 item 8)
  shard    shard-count-1 overhead, pipelined multi-sample (VERDICT r3
           item 4b)

Env: OPTIK_R04_SECTIONS=sched,diffik,... selects sections (default all);
OPTIK_SWEEP_B batch for the schedule sweep (default 131072).
"""

import json
import os
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

    sections = os.environ.get(
        "OPTIK_R04_SECTIONS", "sched,diffik,quality,latency,shard").split(",")

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    dev = str(jax.devices()[0])
    log({"session": "r04_main", "device": dev, "sections": sections})

    def sync_inputs(*arrs):
        for a in arrs:
            np.asarray(a.ravel()[0])

    def make_batch(B):
        q_tgt = rng.uniform(lo, hi, size=(B, 7))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
        sync_inputs(tr, tt, x0)
        return tr, tt, x0

    # =====================================================================
    if "sched" in sections:
        B = int(os.environ.get("OPTIK_SWEEP_B", 131072))
        cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
        tr, tt, x0 = make_batch(B)

        VARIANTS = [
            # r3 production shape (now with difficulty-sorted compaction —
            # the delta vs r3's 308 lane-iters/solve isolates the sort).
            ("v0_r3default", dict(
                screens=[{"seeds": 8, "rounds": 1, "iters": 24,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}], final_p_blk=256)),
            # Screen-budget cut: the r3 iters histogram says ~87% of poses
            # converge by iter 12; the screen ran 24.
            ("v1_screen12", dict(
                screens=[{"seeds": 8, "rounds": 1, "iters": 12,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}], final_p_blk=256)),
            ("v2_screen10_keep3", dict(
                screens=[{"seeds": 8, "rounds": 1, "iters": 10,
                          "p_blk": 1024, "keep_div": 3},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}], final_p_blk=256)),
            ("v3_screen12_presort", dict(
                screens=[{"seeds": 8, "rounds": 1, "iters": 12,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}], final_p_blk=256, presort=True)),
            ("v4_screen12_mid16", dict(
                screens=[{"seeds": 8, "rounds": 1, "iters": 12,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 16}], final_p_blk=256)),
            # 4-seed screen: packs 2 poses per tile column (half the
            # lane cost per pose) at lower first-round success.
            ("v5_seeds4_screen12", dict(
                screens=[{"seeds": 4, "rounds": 1, "iters": 12,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}], final_p_blk=256)),
        ]
        DEPTH, SETS = 4, 3
        for name, kw in VARIANTS:
            try:
                solve = cascade.build_multiphase_solver(
                    robot.spec, cfg, dtype=jnp.float32, **kw)
                t0 = time.time()
                res = solve(tr, tt, x0)
                fc = int(res.found_count)
                compile_s = time.time() - t0
                li = int(res.lane_iters)

                def pipe():
                    t1 = time.perf_counter()
                    acc = None
                    for _ in range(DEPTH):
                        r2 = solve(tr, tt, x0)
                        acc = r2.found_count if acc is None \
                            else acc + r2.found_count
                    _ = int(acc)
                    return (time.perf_counter() - t1) / DEPTH

                pipe(); pipe()  # warm chained dispatch
                vals = []
                for _ in range(SETS):
                    vals.append(pipe())
                p50 = float(np.median(vals))
                log({"section": "sched", "variant": name,
                     "pipelined_ms": round(1e3 * p50, 2),
                     "solves_per_s": round(B / p50, 1),
                     "lane_iters": li,
                     "lane_iters_per_solve": round(li / B, 1),
                     "found": fc, "success_rate": round(fc / B, 5),
                     "spread": round((max(vals) - min(vals))
                                     / np.median(vals), 4),
                     "sets_ms": [round(1e3 * v, 2) for v in vals],
                     "compile_s": round(compile_s, 1), "batch": B})
            except Exception:
                log({"section": "sched", "variant": name,
                     "error": traceback.format_exc()[-400:]})

    # =====================================================================
    if "diffik" in sections:
        v_dir = np.array([0, 0, 0.1, 0, 0, 0.0])
        for B in (4096, 16384, 65536):
            try:
                x0d = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)),
                                  jnp.float32)
                v_we = jnp.asarray(np.tile(v_dir, (B, 1)), jnp.float32)
                v_max = jnp.asarray(np.full((B, 7), 0.75), jnp.float32)
                sync_inputs(x0d, v_we, v_max)
                t0 = time.time()
                a, v, ok = robot.diff_ik_batch(x0d, v_we, v_max)
                okr = float(np.asarray(ok).mean())
                compile_s = time.time() - t0
                # synced (config-4 comparable)
                t1 = time.perf_counter()
                a, v, ok = robot.diff_ik_batch(x0d, v_we, v_max)
                _ = np.asarray(a[0])
                synced = time.perf_counter() - t1
                # pipelined depth 8, sync on the last execution's scalar
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
                log({"section": "diffik", "batch": B,
                     "ok_rate": round(okr, 4),
                     "synced_steps_per_s": round(B / synced, 1),
                     "pipelined_steps_per_s": round(B / p50, 1),
                     "pipelined_ms": round(1e3 * p50, 2),
                     "spread": round((max(vals) - min(vals))
                                     / np.median(vals), 4),
                     "compile_s": round(compile_s, 1)})
            except Exception:
                log({"section": "diffik", "batch": B,
                     "error": traceback.format_exc()[-400:]})

    # =====================================================================
    if "quality" in sections:
        try:
            import functools

            cfg_q = SolverConfig.create("quality", max_restarts=256,
                                        seed_batch=64, max_iters=48)
            for B in (1024, 4096):
                trq, ttq, x0q = make_batch(B)
                t0 = time.time()
                res = robot.ik_batch(cfg_q, trq, ttq, x0q,
                                     validate_seeds=False)
                fc = int(np.asarray(res.found).sum())
                compile_s = time.time() - t0
                t1 = time.perf_counter()
                res = robot.ik_batch(cfg_q, trq, ttq, x0q,
                                     validate_seeds=False)
                _ = np.asarray(res.cost[0])
                synced = time.perf_counter() - t1
                row = {"section": "quality", "batch": B,
                       "success_rate": round(fc / B, 4),
                       "synced_solves_per_s": round(B / synced, 1),
                       "synced_ms": round(1e3 * synced, 2),
                       "compile_s": round(compile_s, 1)}
                for depth in (4, 16):
                    def pipe():
                        t1 = time.perf_counter()
                        last = None
                        for _ in range(depth):
                            last = robot.ik_batch(cfg_q, trq, ttq, x0q,
                                                  validate_seeds=False)
                        _ = np.asarray(last.cost[0])
                        return (time.perf_counter() - t1) / depth
                    pipe()
                    vals = [pipe() for _ in range(3)]
                    row[f"piped{depth}_ms"] = round(
                        1e3 * float(np.median(vals)), 2)
                    row[f"piped{depth}_solves_per_s"] = round(
                        B / float(np.median(vals)), 1)
                # In-PROGRAM chain: K solves inside one jit — pure device
                # time per solve, no relay dispatch in between.  A data
                # dependency (0 * cost) defeats CSE between iterations.
                kentry = robot._kernel_solver(cfg_q, None)
                if kentry is not None:
                    kfn, _blk = kentry
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
                    chain_compile = time.time() - t0
                    t1 = time.perf_counter()
                    _ = int(chain(trq, ttq, x0q))
                    per = (time.perf_counter() - t1) / K
                    row["inprogram_ms_per_solve"] = round(1e3 * per, 2)
                    row["inprogram_solves_per_s"] = round(B / per, 1)
                    row["inprogram_compile_s"] = round(chain_compile, 1)
                log(row)
        except Exception:
            log({"section": "quality",
                 "error": traceback.format_exc()[-400:]})

    # =====================================================================
    if "latency" in sections:
        try:
            cfg_l = SolverConfig(max_restarts=8, seed_batch=8, max_iters=32)
            B = 8
            trl, ttl, x0l = make_batch(B)
            t0 = time.time()
            res = robot.ik_batch(cfg_l, trl, ttl, x0l, validate_seeds=False)
            compile_s = time.time() - t0
            # synced single-solve latency (includes one relay RTT)
            lats = []
            for _ in range(20):
                t1 = time.perf_counter()
                res = robot.ik_batch(cfg_l, trl, ttl, x0l,
                                     validate_seeds=False)
                _ = np.asarray(res.cost[0])
                lats.append(time.perf_counter() - t1)
            # chained depth-16: per-call dispatch+device cost, RTT
            # amortized to 1/16
            def pipe(depth=16):
                t1 = time.perf_counter()
                last = None
                for _ in range(depth):
                    last = robot.ik_batch(cfg_l, trl, ttl, x0l,
                                          validate_seeds=False)
                _ = np.asarray(last.cost[0])
                return (time.perf_counter() - t1) / depth
            pipe(); pipe()
            per_call = float(np.median([pipe() for _ in range(3)]))
            # in-program chain: pure device time per solve
            kentry = robot._kernel_solver(cfg_l, None)
            in_prog = None
            if kentry is not None:
                kfn, _blk = kentry
                K = 64

                @jax.jit
                def chain(tr_, tt_, x0_):
                    # The kernel block is 256 poses wide (s=8 -> p_blk
                    # 256); tile the 8 poses up to one block, as ik_batch's
                    # padding would.
                    acc = jnp.zeros((), jnp.int32)
                    xcur = x0_
                    for _ in range(K):
                        r = kfn(jnp.tile(tr_, (32, 1, 1)),
                                jnp.tile(tt_, (32, 1)),
                                jnp.tile(xcur, (32, 1)))
                        acc = acc + jnp.sum(r.found.astype(jnp.int32))
                        xcur = x0_ + 0.0 * r.cost[:8, None]
                    return acc

                _ = int(chain(trl, ttl, x0l))
                t1 = time.perf_counter()
                _ = int(chain(trl, ttl, x0l))
                in_prog = (time.perf_counter() - t1) / K
            log({"section": "latency", "batch": B,
                 "synced_p50_ms": round(1e3 * float(np.median(lats)), 2),
                 "synced_p90_ms": round(
                     1e3 * float(np.percentile(lats, 90)), 2),
                 "chained_per_call_ms": round(1e3 * per_call, 2),
                 "inprogram_per_solve_ms": (
                     None if in_prog is None else round(1e3 * in_prog, 3)),
                 "compile_s": round(compile_s, 1),
                 "note": "synced-chained = relay RTT; chained-inprogram = "
                         "dispatch; inprogram = device+program"})
        except Exception:
            log({"section": "latency",
                 "error": traceback.format_exc()[-400:]})

    # =====================================================================
    if "shard" in sections:
        try:
            from optik_tpu.parallel import mesh as mesh_mod

            B = int(os.environ.get("OPTIK_SWEEP_B", 131072))
            cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
            tr, tt, x0 = make_batch(B)
            mesh1 = mesh_mod.make_mesh(jax.devices()[:1], data=1, seed=1)
            sharded = mesh_mod.build_sharded_cascade(robot, cfg, mesh1)
            local, _unit = cascade.build_default_solver(
                robot.spec, cfg, dtype=jnp.float32)
            DEPTH, SETS = 4, 3
            out = {"section": "shard", "batch": B}
            for name, fn in (("sharded_1", sharded), ("local", local)):
                t0 = time.time()
                res = fn(tr, tt, x0)
                fc = int(res.found_count)
                comp = time.time() - t0

                def pipe():
                    t1 = time.perf_counter()
                    acc = None
                    for _ in range(DEPTH):
                        r2 = fn(tr, tt, x0)
                        acc = r2.found_count if acc is None \
                            else acc + r2.found_count
                    _ = int(acc)
                    return (time.perf_counter() - t1) / DEPTH

                pipe(); pipe()
                vals = [pipe() for _ in range(SETS)]
                p50 = float(np.median(vals))
                out[f"{name}_pipelined_ms"] = round(1e3 * p50, 2)
                out[f"{name}_solves_per_s"] = round(B / p50, 1)
                out[f"{name}_spread"] = round(
                    (max(vals) - min(vals)) / np.median(vals), 4)
                out[f"{name}_found"] = fc
                out[f"{name}_compile_s"] = round(comp, 1)
            out["overhead_pct"] = round(
                100.0 * (out["sharded_1_pipelined_ms"]
                         / out["local_pipelined_ms"] - 1.0), 2)
            log(out)
        except Exception:
            log({"section": "shard",
                 "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
