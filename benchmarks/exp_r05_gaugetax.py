#!/usr/bin/env python3
"""Taxonomy of gauge diff-IK ok=False lanes (VERDICT r4 item 4, PARITY leg).

Samples a large random batch through the exact gauge path (rescue off),
collects the ok=False lanes, and classifies each by the f64 SVD of its
world Jacobian:

  rank_deficient   sigma_min(J) / sigma_max(J) < 1e-6 — the zonotope is
                   genuinely degenerate (facet enumeration cannot certify;
                   Clarabel would still solve when V is in range);
  near_singular    1e-6 <= ratio < 1e-3 — f32 facet arithmetic loses the
                   cut (roundoff class);
  well_conditioned ratio >= 1e-3 — a genuine enumeration miss (should be
                   ~none).

Also reports how many of the failures the ADMM rescue path recovers —
the number behind the public default's ok rate.  CPU-safe (the gauge path
is element-wise; rates match the device).  Env: OPTIK_GAUGETAX_B.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from optik_tpu import Robot
    from optik_tpu.models import asset_path

    B = int(os.environ.get("OPTIK_GAUGETAX_B", 262144))
    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(123)

    x0 = rng.uniform(lo, hi, size=(B, 7))
    v_we = rng.standard_normal((B, 6)) * 0.2
    v_max = np.full((B, 7), 0.75)

    t0 = time.time()
    alpha, v, ok = robot.diff_ik_batch(x0, v_we, v_max, rescue=False)
    ok = np.asarray(ok)
    wall = time.time() - t0
    bad = np.flatnonzero(~ok)

    # f64 world Jacobians of the failed lanes.
    classes = {"rank_deficient": 0, "near_singular": 0,
               "well_conditioned": 0}
    ratios = []
    for i in bad:
        jl = robot.joint_jacobian(x0[i])
        m = robot.fk(x0[i])
        r = m[:3, :3]
        jw = np.concatenate([r @ jl[:3], r @ jl[3:]], axis=0)
        s = np.linalg.svd(jw, compute_uv=False)
        ratio = s[-1] / s[0]
        ratios.append(ratio)
        if ratio < 1e-6:
            classes["rank_deficient"] += 1
        elif ratio < 1e-3:
            classes["near_singular"] += 1
        else:
            classes["well_conditioned"] += 1

    # Does the public default (per-lane ADMM rescue) recover them?
    rescued = 0
    if bad.size:
        a2, v2, ok2 = robot.diff_ik_batch(x0[bad], v_we[bad], v_max[bad])
        rescued = int(np.asarray(ok2).sum())

    print(json.dumps({
        "metric": "gauge_failure_taxonomy",
        "batch": B,
        "ok_rate_gauge": round(float(ok.mean()), 6),
        "failures": int(bad.size),
        "classes": classes,
        "sigma_ratio_min": (round(float(np.min(ratios)), 9)
                            if ratios else None),
        "sigma_ratio_max": (round(float(np.max(ratios)), 9)
                            if ratios else None),
        "admm_rescued": rescued,
        "ok_rate_with_rescue": round(
            float((ok.sum() + rescued) / B), 6),
        "wall_s": round(wall, 1),
    }, default=float), flush=True)


if __name__ == "__main__":
    main()
