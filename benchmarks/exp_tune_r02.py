#!/usr/bin/env python3
"""On-device cascade tuning sweep (round 2).

Steady-state throughput of the two-phase cascade across tile widths and
screen budgets, on the bench workload (16k random reachable Panda poses,
Speed mode, 64 restarts).  Inputs are made device-resident by an untimed
first solve of each batch; the timed pass re-solves them (bench.py
methodology).  One JSON line per config.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import jax
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
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
        return tr, tt, x0

    batches = [make_batch() for _ in range(3)]

    sweeps = [
        # (p_blk1, phase1_iters, phase1_seeds, p_blk2, tail_div)
        (512, None, None, 256, 8),    # current bench config (baseline)
        (1024, None, None, 256, 8),   # wider screen tile
        (2048, None, None, 256, 8),
        (512, 24, None, 256, 8),      # cheaper screen, tail catches rest
        (512, 16, None, 256, 8),
        (1024, 24, None, 256, 8),
        (512, None, None, 512, 8),    # wider tail tile
        (512, None, None, 128, 8),
        (512, None, 4, 256, 8),       # pose-packed screen (2 poses/col)
        (1024, 24, 4, 256, 8),
    ]

    # Three-phase schedules: the final full-budget replay runs ~40% of all
    # lane-iterations on ~12% of poses (every tail block carries a genuine
    # failure, so it runs the whole 8-round budget); inserting a cheap
    # 2-round middle phase shrinks the full-budget population ~8x.
    multi = [
        ("3ph a", [{"seeds": 8, "rounds": 1, "p_blk": 512, "keep_div": 8},
                   {"seeds": 8, "rounds": 2, "p_blk": 256, "keep_div": 8}],
         256),
        ("3ph b", [{"seeds": 8, "rounds": 1, "iters": 24, "p_blk": 512,
                    "keep_div": 4},
                   {"seeds": 8, "rounds": 2, "p_blk": 256, "keep_div": 16}],
         256),
    ]

    def run(tag, build):
        try:
            solve = build()
            for tr, tt, x0 in batches:
                res = solve(tr, tt, x0)
                _ = int(jnp.sum(res.found.astype(jnp.int32)))
            lat, found, work = [], 0, 0
            for tr, tt, x0 in batches:
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                found += int(jnp.sum(res.found.astype(jnp.int32)))
                lat.append(time.perf_counter() - t1)
                if res.lane_iters is not None:
                    work += int(res.lane_iters)
            p50 = float(np.median(lat))
            print(json.dumps({
                "cfg": tag, "solves_per_s": round(B / p50, 1),
                "p50_ms": round(1e3 * p50, 2),
                "success_rate": round(found / (B * len(batches)), 4),
                "lane_iters_per_batch": work // len(batches)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)

    for tag, screens, fp in multi:
        run(tag, lambda screens=screens, fp=fp: cascade.build_multiphase_solver(
            robot.spec, cfg, screens=screens, final_p_blk=fp))

    for p1, it1, s1, p2, td in sweeps:
        tag = f"p1={p1} it1={it1} s1={s1} p2={p2} td={td}"
        try:
            solve = cascade.build_cascade_solver(
                robot.spec, cfg, p_blk=p1, phase1_rounds=1, tail_div=td,
                p_blk2=p2, phase1_seeds=s1, phase1_iters=it1)
            # Warmup+residency: solve every batch once, untimed.
            for tr, tt, x0 in batches:
                res = solve(tr, tt, x0)
                _ = int(jnp.sum(res.found.astype(jnp.int32)))
            lat, found, work = [], 0, 0
            for tr, tt, x0 in batches:
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                found += int(jnp.sum(res.found.astype(jnp.int32)))
                lat.append(time.perf_counter() - t1)
                if res.lane_iters is not None:
                    work += int(res.lane_iters)
            p50 = float(np.median(lat))
            print(json.dumps({
                "cfg": tag, "solves_per_s": round(B / p50, 1),
                "p50_ms": round(1e3 * p50, 2),
                "success_rate": round(found / (B * len(batches)), 4),
                "lane_iters_per_batch": work // len(batches)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
