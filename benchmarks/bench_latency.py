#!/usr/bin/env python3
"""Single-solve IK latency on device: the BASELINE "p50 solve latency" row.

The reference's latency contract is tens of µs per solve on a CPU core with
a 0.1 s ceiling (kylc/optik README.md:24-28, config.rs:56); our native C++
host path records ~200 µs (tests/test_native.py).  This measures the TPU
path's scalar latency — ``robot.ik()`` routed through the single-shot VMEM
kernel with the pose padded to one tile block (robot.py) — which is
dispatch-dominated: the relay/PCIe round trip, not solver math, sets the
floor.  Methodology mirrors the reference's example loop (one solve per
timed call, examples/example.py:36-47).

Prints JSON lines:
  * scalar robot.ik() p50/p90 over N random reachable poses (full Python
    API surface, host-side parse + fetch included);
  * small-batch ik_batch latency for B in {1, 64, 256} (device path only,
    one scalar fetch), i.e. the real-time-control shape;
  * the batch size where per-solve cost crosses the native-CPU ~200 µs.
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

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    dev = str(jax.devices()[0])
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    rng = np.random.default_rng(7)
    lo, hi = robot.joint_limits()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    # --- scalar robot.ik(): the reference example loop, one pose a time ---
    targets = [np.asarray(robot.fk(rng.uniform(lo, hi))) for _ in range(n)]
    seeds = [rng.uniform(lo, hi) for _ in range(n)]
    robot.ik(cfg, targets[0], seeds[0])  # compile
    lats, ok = [], 0
    for tgt, x0 in zip(targets, seeds):
        t0 = time.perf_counter()
        out = robot.ik(cfg, tgt, x0)
        lats.append(time.perf_counter() - t0)
        ok += out is not None
    print(json.dumps({
        "metric": "scalar_ik_p50_us",
        "value": round(1e6 * float(np.median(lats)), 1), "unit": "us",
        "p90_us": round(1e6 * float(np.percentile(lats, 90)), 1),
        "success_rate": round(ok / n, 4), "solves": n, "device": dev,
    }), flush=True)

    # --- small-batch ik_batch: the real-time control shape ----------------
    for B in (1, 64, 256):
        qt = rng.uniform(lo, hi, size=(B, 7))
        tr, tt = robot.fk_batch(qt)
        x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
        jax.block_until_ready((tr, tt, x0))

        def solve():
            res = robot.ik_batch(cfg, tr, tt, x0, validate_seeds=False)
            return int(jnp.sum(res.found.astype(jnp.int32)))

        solve()  # compile + residency
        bl = []
        for _ in range(20):
            t0 = time.perf_counter()
            found = solve()
            bl.append(time.perf_counter() - t0)
        p50 = float(np.median(bl))
        print(json.dumps({
            "metric": "ik_batch_latency_us", "batch": B,
            "value": round(1e6 * p50, 1), "unit": "us",
            "per_solve_us": round(1e6 * p50 / B, 2),
            "p90_us": round(1e6 * float(np.percentile(bl, 90)), 1),
            "success_rate": round(found / B, 4), "device": dev,
        }), flush=True)


if __name__ == "__main__":
    main()
