#!/usr/bin/env python3
"""Diff-IK velocity-limit sweep (port of kylc/optik examples/example_diff_ik.py).

Steps diff-IK with varying velocity limits and asserts the direction-only
scaling contract: V_tgt == V* / alpha.

Usage:
    python example_diff_ik.py [<my_robot.urdf> <base_link> <ee_link>]
"""

import sys

import numpy as np

from optik_tpu import Robot
from optik_tpu.models import asset_path

np.set_printoptions(suppress=True, precision=2)

if len(sys.argv) >= 4:
    urdf_path, base_name, ee_name = sys.argv[1:4]
else:
    urdf_path, base_name, ee_name = (asset_path("panda.urdf"), "panda_link0",
                                     "panda_hand_tcp")

robot = Robot.from_urdf_file(urdf_path, base_name, ee_name)
n = robot.num_positions()

rng = np.random.default_rng(seed=42)
lo, hi = robot.joint_limits()
x0 = rng.uniform(np.where(np.isfinite(lo), lo, -np.pi),
                 np.where(np.isfinite(hi), hi, np.pi))

for v_max in [0.1, 0.5, 1.0, 10.0]:
    V_tgt = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 1.0])

    if (sol := robot.diff_ik(x0, V_tgt, [v_max] * n)) is not None:
        alpha, v_star = sol
        v_star = np.array(v_star)

        J = robot.joint_jacobian(x0)
        R_W = robot.fk(x0)[:3, :3]
        J_W = np.vstack((R_W @ J[:3, :], R_W @ J[3:, :]))
        V_star = J_W @ v_star

        print("------")
        print("  x0    =", np.array(x0))
        print("  v_max =", np.array(v_max))
        print("  V_tgt =", V_tgt)
        print("  alpha =", alpha)
        print("  v*    =", v_star)
        print("  V*    =", V_star)

        assert -1e-6 <= alpha <= 1.0 + 1e-6
        np.testing.assert_allclose(V_tgt, V_star / alpha, atol=1e-5)
