#!/usr/bin/env python3
"""Round-2 tuning, part 3: screen-iteration fine-tune + Quality tile width.

Speed: the 3-phase default screens at 3/4 max_iters (24 of 32); sweep the
screen depth — shallower screens shed work but push more poses into the
mid phase.  Quality (BASELINE config 2 shape, 64 seed lanes): the tall
(rows=64) layout currently runs p_blk=128; try 256 for better pipelining
if VMEM allows.
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
    from optik_tpu.ops.pallas import lm_kernel
    from optik_tpu.solver import cascade

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()
    rng = np.random.default_rng(42)
    lo, hi = robot.joint_limits()

    def make_batch(B):
        q_tgt = rng.uniform(lo, hi, size=(B, n))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jax.device_put(
            jnp.asarray(rng.uniform(lo, hi, size=(B, n)), jnp.float32))
        return tr, tt, x0

    def run(tag, solve, batches, B):
        try:
            for tr, tt, x0 in batches:
                res = solve(tr, tt, x0)
                _ = int(jnp.sum(res.found.astype(jnp.int32)))
            lat, found = [], 0
            for tr, tt, x0 in batches:
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                found += int(jnp.sum(res.found.astype(jnp.int32)))
                lat.append(time.perf_counter() - t1)
            p50 = float(np.median(lat))
            print(json.dumps({
                "cfg": tag, "solves_per_s": round(B / p50, 1),
                "p50_ms": round(1e3 * p50, 2), "found": found,
                "success_rate": round(found / (B * len(batches)), 5)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)

    # --- Speed: screen-depth sweep on the 3-phase schedule ---------------
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32,
                       tol_f=1e-6)
    B = 16384
    batches = [make_batch(B) for _ in range(5)]
    for it1 in (16, 20, 24, 28):
        def build(it1=it1):
            return cascade.build_multiphase_solver(
                robot.spec, cfg,
                screens=[{"seeds": 8, "rounds": 1, "iters": it1,
                          "p_blk": 1024, "keep_div": 4},
                         {"seeds": 8, "rounds": 2, "p_blk": 256,
                          "keep_div": 8}],
                final_p_blk=256)
        run(f"3ph it1={it1}", build(), batches, B)

    # --- Quality: tall-layout tile width ---------------------------------
    cfg_q = SolverConfig.create("quality", max_restarts=256, seed_batch=64,
                                max_iters=48)
    Bq = 1024
    qbatches = [make_batch(Bq) for _ in range(3)]
    for pb in (128, 256):
        try:
            fn = lm_kernel.build_kernel_solver(robot.spec, cfg_q,
                                               dtype=jnp.float32, p_blk=pb)
            run(f"quality p_blk={pb}", fn, qbatches, Bq)
        except Exception as e:
            print(json.dumps({"cfg": f"quality p_blk={pb}",
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
