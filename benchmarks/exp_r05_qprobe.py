#!/usr/bin/env python3
"""Quality-mode work-floor probe (VERDICT r4 item 2 analysis leg).

The on-device measurement (artifacts/r05_main.out "quality") shows BASELINE
config 2 runs at lane_iters_per_solve = 12544 = (max_iters + 1) * rounds *
S EXACTLY — the lockstep ceiling: every 128-pose tile block executes the
full schedule because, among its 8192 lanes, some restart chain always
saturates all four attempt caps.

This probe measures the ATTEMPT-level distribution that ceiling hides:
per-lane active iterations (the lane's restart-chain length before it
stopped) via lm_loop(track_active=True) on the XLA path (CPU — the
schedule is platform-independent).  Reports:

  * E[chain] and the chain-length histogram;
  * the attempt-level work floor  E[chain] * S  per pose (what a machine
    with per-lane exit would pay);
  * the lockstep ratio  ceiling / floor  — how much a (hypothetical)
    save/resume attempt-compaction schedule could recover;
  * P(chain = ceiling): the fraction of lanes that saturate everything.

Env: OPTIK_QPROBE_B (default 512 poses).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.ops import soa
    from optik_tpu.solver import ik as ik_mod
    from optik_tpu.solver.lm_soa import lm_loop

    B = int(os.environ.get("OPTIK_QPROBE_B", 512))
    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    spec = robot.spec
    cfg = SolverConfig.create("quality", max_restarts=256, seed_batch=64,
                              max_iters=48)
    a = spec.num_positions
    s = cfg.seed_batch
    r_total = cfg.total_restarts
    rounds = -(-r_total // s)
    ceiling = (cfg.max_iters + 1) * rounds

    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(1)  # same seed as the device measurement
    qt = rng.uniform(lo, hi, size=(B, 7))
    tr, tt = robot.fk_batch(qt)
    x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)

    consts = soa.chain_constants(spec)
    lower = [float(v) for v in spec.lower]
    upper = [float(v) for v in spec.upper]
    opts = ik_mod.options_from_config(cfg)
    lo_s = np.where(np.isfinite(spec.lower), spec.lower, -np.pi)
    hi_s = np.where(np.isfinite(spec.upper), spec.upper, np.pi)

    @jax.jit
    def probe(tr, tt, x0):
        key = jax.random.PRNGKey(cfg.rng_seed)

        def draw(i):
            k = jax.random.fold_in(key, i)
            return jax.random.uniform(k, (a,), dtype=jnp.float32,
                                      minval=jnp.asarray(lo_s, jnp.float32),
                                      maxval=jnp.asarray(hi_s, jnp.float32))

        table = jax.vmap(draw)(jnp.arange(r_total))
        seeds = jnp.concatenate(
            [x0[:, None, :], jnp.broadcast_to(table[1:s], (B, s - 1, a))],
            axis=1)                                           # (B, S, A)
        xs0 = [seeds[..., j] for j in range(a)]
        tgtm = [[tr[:, None, i, j] for j in range(3)] for i in range(3)]
        tgtt = [tt[:, None, i] for i in range(3)]
        tables = [table[:, p] for p in range(a)]
        lookup = lambda idx: [jnp.take(t, idx) for t in tables]
        out = lm_loop(
            consts, lower, upper, opts, xs0, tgtm, tgtt,
            seed_lookup=lookup, lane_index=jnp.arange(s),
            total_restarts=r_total, s_lanes=s,
            explore_full_budget=True,
            qx0=[x0[:, None, j] for j in range(a)],
            track_active=True)
        return out.active_iters, out.iters

    act, block_iters = probe(jnp.asarray(tr, jnp.float32),
                             jnp.asarray(tt, jnp.float32), x0)
    act = np.asarray(act)  # (B, S)
    per_pose_max = act.max(axis=1)
    mean_chain = float(act.mean())
    floor_li = mean_chain * s                   # per pose, per-lane exit
    lockstep_li = float(np.mean(per_pose_max)) * s  # per pose, pose-local
    hist, edges = np.histogram(act, bins=[0, 50, 100, 150, 180, 195, 196,
                                          197])
    print(json.dumps({
        "metric": "quality_work_floor_probe",
        "batch": B, "seeds": s, "rounds": rounds,
        "ceiling_block_iters": ceiling,
        "measured_block_iters": int(block_iters),
        "mean_chain_iters": round(mean_chain, 1),
        "p_chain_saturated": round(float((act >= ceiling).mean()), 4),
        "chain_hist_bins": [int(v) for v in hist],
        "chain_hist_edges": [int(v) for v in edges],
        "attempt_floor_li_per_solve": round(floor_li, 1),
        "pose_local_li_per_solve": round(lockstep_li, 1),
        "device_measured_li_per_solve": ceiling * s,
        "lockstep_ratio_vs_floor": round(ceiling * s / floor_li, 2),
        "pose_local_ratio_vs_floor": round(lockstep_li / floor_li, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
