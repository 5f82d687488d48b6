#!/usr/bin/env python3
"""Random-pose IK benchmark loop (port of kylc/optik examples/example.py).

Loads a model, generates random reachable targets, solves them, and prints
the average per-solve time and success rate.  Where the reference loops 10k
single solves through a thread pool, this drives sharded pose batches
through the lockstep solver — same workload, batch-native.

Usage:
    python example.py [<my_robot.urdf> <base_link> <ee_link>]

With no arguments the bundled Panda model is used.
"""

import sys
import time

import numpy as np

import pathlib
import sys

# Runnable from a source checkout without installing the package.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from optik_tpu import Robot, SolverConfig
from optik_tpu.models import asset_path

if len(sys.argv) >= 4:
    urdf_path, base_name, ee_name = sys.argv[1:4]
else:
    urdf_path, base_name, ee_name = (asset_path("panda.urdf"), "panda_link0",
                                     "panda_hand_tcp")

robot = Robot.from_urdf_file(urdf_path, base_name, ee_name)
config = SolverConfig(max_restarts=16, max_iters=64)

N = 10_000
B = 1_000  # poses per device batch

rng = np.random.default_rng()
lo, hi = robot.joint_limits()
lo = np.where(np.isfinite(lo), lo, -np.pi)
hi = np.where(np.isfinite(hi), hi, np.pi)
n = robot.num_positions()

total_time = 0.0
total_found = 0
for start in range(0, N, B):
    x0 = rng.uniform(lo, hi, size=(B, n))
    q_target = rng.uniform(lo, hi, size=(B, n))
    tr, tt = robot.fk_batch(q_target)

    t0 = time.perf_counter()
    # fk_batch outputs are device-resident; hand them straight to ik_batch
    # (a np.asarray round trip would pull them to host and re-upload).
    res = robot.ik_batch(config, tr, tt, x0)
    found = np.asarray(res.found)
    tf = time.perf_counter()

    total_time += tf - t0
    total_found += int(found.sum())
    print(f"Batch of {B}: {1e6 * (tf - t0) / B:.1f}µs/solve, "
          f"{found.mean():.1%} success")

print(f"Average time: {1e6 * total_time / N:.1f}µs")
print(f"Success rate: {total_found / N:.1%}")
