#!/usr/bin/env python3
"""Differential-IK trajectory integration (port of kylc/optik
examples/diff_ik.py — without the external Clarabel dependency: the LP is
solved exactly by the closed-form zonotope-gauge solver, solver/gauge.py).

Tracks a constant world-frame end-effector velocity under joint velocity
limits, integrating q forward with explicit Euler.

Usage:
    python diff_ik.py [<my_robot.urdf> <base_link> <ee_link>]
"""

import sys
import time

import numpy as np

import pathlib
import sys

# Runnable from a source checkout without installing the package.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from optik_tpu import Robot
from optik_tpu.models import asset_path

np.set_printoptions(precision=2, suppress=True)

if len(sys.argv) >= 4:
    urdf_path, base_name, ee_name = sys.argv[1:4]
else:
    urdf_path, base_name, ee_name = (asset_path("panda.urdf"), "panda_link0",
                                     "panda_hand_tcp")

robot = Robot.from_urdf_file(urdf_path, base_name, ee_name)

n = robot.num_positions()
V = np.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0])  # desired EE spatial velocity
qd_max = 0.75                                  # joint velocity limit
dt = 0.1

rng = np.random.default_rng(seed=42)
lo, hi = robot.joint_limits()
q = rng.uniform(np.where(np.isfinite(lo), lo, -np.pi),
                np.where(np.isfinite(hi), hi, np.pi))

for t in np.arange(0.0, 1.0, step=dt):
    t0 = time.perf_counter()
    sol = robot.diff_ik(q, V, [qd_max] * n)
    solve_us = 1e6 * (time.perf_counter() - t0)
    assert sol is not None

    alpha, qd_star = sol
    qd_star = np.array(qd_star)

    X_WE = robot.fk(q)
    R_WE = X_WE[:3, :3]
    JEq = robot.joint_jacobian(q)
    JWq = np.vstack((R_WE @ JEq[:3, :], R_WE @ JEq[3:, :]))
    V_star = JWq @ qd_star

    q = q + qd_star * dt

    print(f"--- t={t}")
    print("alpha    = ", alpha)
    print("qd*      = ", qd_star)
    print("V*       = ", V_star)
    print("|V* - aV|= ", np.linalg.norm(V_star - alpha * V))
    print("p_WE     = ", robot.fk(q)[:3, 3])
    print(f"Solve time: {int(solve_us)}µs")
