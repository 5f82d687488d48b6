#!/usr/bin/env python3
"""North-star benchmark: Panda 7-DoF IK solves/s on one TPU chip.

Methodology mirrors the reference's published benchmark loop
(kylc/optik examples/example.py:19-47): random seed configuration, random
*reachable* target (FK of a random configuration), solve at the default
TRAC-IK-equivalent tolerance (tol_f = 1e-6 on the squared log-pose error,
matching the reference default, config.rs:56-59).  On the batch device the
10k-solve Python loop becomes sharded pose batches.

Prints ONE json line:
  {"metric": "panda_ik_solves_per_s", "value": ..., "unit": "solves/s",
   "vs_baseline": ...}

vs_baseline is measured against the driver target of 1e6 solves/s on a
v5p-8 (BASELINE.md), i.e. a per-chip share of 125k solves/s — note the
local chip is a v5e (far lower FLOPs/BW than a v5p core-pair).
Extra context fields (success rate, batch size, chip count) ride along.
"""

import json
import sys
import time

import numpy as np

PER_CHIP_TARGET = 1e6 / 8.0  # v5p-8 target spread over 8 chips


def main():
    import jax

    # The unrolled solver body compiles slowly (minutes through a remote-
    # compile tunnel); persist compiled executables so reruns start hot.
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()

    # Throughput configuration: Speed mode, 8 lockstep lanes with continuous
    # reseeding through a 64-restart budget (100% success on this workload),
    # bounded iterations.  tol_f matches the reference default.
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=48,
                       tol_f=1e-6)

    B = 4096  # poses per batch

    rng = np.random.default_rng(42)
    lo, hi = robot.joint_limits()

    def make_batch():
        q_tgt = rng.uniform(lo, hi, size=(B, n))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = rng.uniform(lo, hi, size=(B, n))
        return (np.asarray(tr, np.float32), np.asarray(tt, np.float32),
                np.asarray(x0, np.float32))

    solve = robot._solver(cfg, with_ee=False)

    # Warmup / compile.
    tr, tt, x0 = make_batch()
    res = solve(tr, tt, x0)
    jax.block_until_ready(res)

    # Timed runs on fresh batches (target generation excluded, as in the
    # reference loop which times only robot.ik()).
    import contextlib
    import os

    prof_dir = os.environ.get("OPTIK_PROFILE")
    prof = (jax.profiler.trace(prof_dir) if prof_dir
            else contextlib.nullcontext())

    iters = 5
    batches = [make_batch() for _ in range(iters)]
    found = 0
    with prof:
        t0 = time.perf_counter()
        for tr, tt, x0 in batches:
            res = solve(tr, tt, x0)
            jax.block_until_ready(res.found)
            found += int(np.asarray(res.found).sum())
        dt = time.perf_counter() - t0

    solves_per_s = B * iters / dt
    success = found / (B * iters)

    print(json.dumps({
        "metric": "panda_ik_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 4),
        "success_rate": round(success, 4),
        "batch": B,
        "seeds": cfg.total_restarts,
        "max_iters": cfg.max_iters,
        "chips": len(jax.devices()),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
