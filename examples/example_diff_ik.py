#!/usr/bin/env python3
"""Direction-only velocity scaling, checked across a v_max sweep IN ONE BATCH.

The diff-IK contract (kylc/optik examples/example_diff_ik.py pins it with a
host-side loop): the solver may only *scale* the commanded spatial velocity,
never bend it — so for every solve, V_tgt == (J_W v*) / alpha.  Tightening
the joint-velocity limit shrinks alpha; the realized twist stays on the
commanded ray.

Here the sweep is what it should be on a batch machine: the four limit
settings are four lanes of one ``diff_ik_batch`` call (same state, same
command), solved simultaneously by the closed-form zonotope-gauge solver (solver/gauge.py), and the scaling
contract is asserted on the whole batch at once.

Usage:
    python example_diff_ik.py [<my_robot.urdf> <base_link> <ee_link>]
"""

import sys

import numpy as np

import pathlib
import sys

# Runnable from a source checkout without installing the package.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from optik_tpu import Robot
from optik_tpu.models import asset_path

np.set_printoptions(suppress=True, precision=3)

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

# One commanded twist, four velocity-limit settings -> a 4-lane batch.
limits = np.array([0.1, 0.5, 1.0, 10.0])
V_tgt = np.array([0.0, 0.0, 0.5, 0.0, 0.0, 1.0])
B = len(limits)

alpha, v_star, ok = robot.diff_ik_batch(
    np.broadcast_to(x0, (B, n)),
    np.broadcast_to(V_tgt, (B, 6)),
    np.broadcast_to(limits[:, None], (B, n)))
alpha, v_star, ok = map(np.asarray, (alpha, v_star, ok))
assert ok.all(), "QP failed on some lanes"

# Realized twist per lane: V* = J_W(x0) v*, with the local Jacobian rotated
# into the world frame (one Jacobian — the state is shared).
J = robot.joint_jacobian(x0)
R_W = robot.fk(x0)[:3, :3]
J_W = np.vstack((R_W @ J[:3, :], R_W @ J[3:, :]))
V_star = v_star @ J_W.T

print(f"x0 = {x0}")
print(f"V_tgt = {V_tgt}")
print(f"{'v_max':>6} {'alpha':>8}  realized twist V*")
for k in range(B):
    print(f"{limits[k]:>6} {alpha[k]:>8.4f}  {V_star[k]}")

# The contract, batched: alpha in [0, 1], |v| within each lane's limit,
# and the realized twist is exactly the scaled command.
assert np.all((alpha >= -1e-6) & (alpha <= 1.0 + 1e-6))
assert np.all(np.abs(v_star) <= limits[:, None] + 1e-6)
np.testing.assert_allclose(V_star / alpha[:, None],
                           np.broadcast_to(V_tgt, (B, 6)), atol=5e-5,
                           rtol=0)  # f32 QP: tracking residual ~1e-5
# Tighter limits can only shrink the feasible scaling.
assert np.all(np.diff(alpha) >= -1e-6)
print("ok: V_tgt == V*/alpha on every lane; alpha monotone in v_max")
