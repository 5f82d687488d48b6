#!/usr/bin/env python3
"""The BASELINE.json benchmark configurations, beyond the north-star:

  2. Batched random-restart IK: 1k random Panda poses x 256 seeds,
     Quality-mode nearest-to-seed selection.
  3. UR5 6-DoF with tight joint limits (boundary-active stress).
  4. Differential-IK Cartesian interpolation with velocity limits as
     batched QP steps.
  5. Motion-planning workload: 1M random pose queries in pose-sharded
     chunks (single-host version; the multi-host variant shards the same
     chunks over the "data" mesh axis).

Prints one JSON line per config.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import time

import jax
import numpy as np


def _sync(out):
    """Force completion: fetch one scalar (block_until_ready does not
    reliably serialize on relayed platforms).  One leaf suffices for the
    outputs of a single execution."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def _sync_all(tree):
    """Fetch one scalar from EVERY array: required when the leaves come
    from different executions/transfers — syncing only the first leaves
    the rest (e.g. queued host->device input uploads) to complete inside
    the timed region, which measured ~100 ms/chunk of hidden transfer
    stall on the relay (r3 motion-planning workload)."""
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf.ravel()[0])


def timed(fn):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    out = fn()
    _sync(out)
    return out, time.perf_counter() - t0


def timed_piped(fn, depth=8, sets=3):
    """Deployment-shape timing: chain ``depth`` executions, one sync.

    Each per-batch sync on the relayed chip costs a ~25-30 ms host round
    trip with the device idle (r3 profile), so ``timed`` measures tunnel
    latency for any sub-30 ms workload; the r4 quality-gap study
    (artifacts/r04_main.out) shows the pipelined rate matches the
    in-program device rate within ~15%.

    Returns ``(out, median, spread, sets_ms)`` over ``sets`` measured
    passes (after 1 warm pass) — the same multi-sample protocol the
    headline bench uses, so every recorded workload number carries its
    relay-weather error bar (VERDICT r4 "evidence hygiene").  ``spread``
    is (max - min) / median."""
    out = fn()
    _sync(out)

    def one():
        t0 = time.perf_counter()
        for _ in range(depth):
            out = fn()
        _sync(out)
        return (time.perf_counter() - t0) / depth

    one()
    vals = sorted(one() for _ in range(sets))
    med = vals[len(vals) // 2]
    spread = (vals[-1] - vals[0]) / med if med > 0 else 0.0
    return out, med, spread, [round(v * 1e3, 2) for v in vals]


def main():
    import pathlib as _pl
    jax.config.update(
        "jax_compilation_cache_dir",
        str(_pl.Path(__file__).resolve().parent.parent / ".jax_cache"))

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.models.chain import ChainSpec

    dev = str(jax.devices()[0])
    rng = np.random.default_rng(0)

    # --- config 2: 1k poses x 256 seeds, Quality mode --------------------
    # Recorded at the BASELINE shape (B=1024) AND at B=4096: Quality work
    # is uniform per pose, so bigger batches amortize dispatch/unpack —
    # B=1024 leaves ~25% on the table purely by batch size (r4 measured
    # 86.3k vs 110.2k in-program).  Both rows carry lane_iters_per_solve
    # and the attempt-level work floor so the schedule efficiency is
    # auditable (VERDICT r4 item 2): the floor is (mean_attempt_iters + 1)
    # * 256 attempts — every Quality pose consumes its full budget by
    # definition (lib.rs:398-408), so li/solve near the floor means the
    # lockstep machine wastes nothing beyond attempt-length variance
    # within its 8-row tile groups.
    panda = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = panda.joint_limits()
    cfg_q = SolverConfig.create("quality", max_restarts=256, seed_batch=64,
                                max_iters=48)
    for B in (1024, 4096):
        qt = rng.uniform(lo, hi, size=(B, 7))
        tr_b, tt_b = panda.fk_batch(qt)  # stays on device
        x0_b = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
        _sync_all((tr_b, tt_b, x0_b))
        # validate_seeds=False: device-resident x0 would cost a blocking
        # one-boolean fetch per chained call (seeds are in-limits by
        # construction here).
        res, dt, spread, sets_ms = timed_piped(
            lambda: panda.ik_batch(cfg_q, tr_b, tt_b, x0_b,
                                   validate_seeds=False))
        _, dt_sync = timed(
            lambda: panda.ik_batch(cfg_q, tr_b, tt_b, x0_b,
                                   validate_seeds=False))
        li = (float(res.lane_iters) if res.lane_iters is not None
              else float("nan"))
        row = {
            "metric": "panda_quality_256seed_solves_per_s",
            "value": round(B / dt, 1), "unit": "solves/s",
            "spread": round(spread, 4), "set_ms": sets_ms,
            "synced_solves_per_s": round(B / dt_sync, 1),
            "success_rate": round(
                float(jnp.mean(res.found.astype(jnp.float32))), 4),
            "lane_iters_per_solve": round(li / B, 1),
            "batch": B, "seeds": 256, "device": dev}
        if B == 1024:
            # Reused by the cap rows below.
            tr, tt, x0, res_q, dt_q = tr_b, tt_b, x0_b, res, dt
        print(json.dumps(row))
    B, res, dt = 1024, res_q, dt_q

    # Same workload under the quality_max_successes semantic extension
    # (config.py; VERDICT r2 item 7): truncate each pose's exploration after
    # k successful attempts.  Reports the quality give-up alongside the
    # speedup: mean/max seed-distance regression vs full reference
    # semantics over the found poses.
    d_full = jnp.linalg.norm(res.x - x0, axis=-1)
    for k in (8, 2):
        cfg_k = cfg_q.replace(quality_max_successes=k)
        res_k, dt_k = timed(
            lambda: panda.ik_batch(cfg_k, tr, tt, x0, validate_seeds=False))
        f = np.asarray(res.found) & np.asarray(res_k.found)
        d_k = jnp.linalg.norm(res_k.x - x0, axis=-1)
        dreg = np.asarray(d_k - d_full)[f]
        print(json.dumps({
            "metric": "panda_quality_256seed_cap_solves_per_s",
            "cap": k, "value": round(B / dt_k, 1), "unit": "solves/s",
            "speedup_vs_full": round(dt / dt_k, 3),
            "success_rate": round(
                float(jnp.mean(res_k.found.astype(jnp.float32))), 4),
            "seed_dist_regression_mean": round(float(dreg.mean()), 4),
            "seed_dist_regression_max": round(float(dreg.max()), 4),
            "batch": B, "seeds": 256, "device": dev}))

    # --- config 3: UR5 tight limits --------------------------------------
    ur5 = Robot.from_urdf_file(asset_path("ur5.urdf"), "base_link", "ee_link")
    spec = ur5.spec
    tight = ChainSpec(
        joint_names=spec.joint_names, origin_r=spec.origin_r,
        origin_t=spec.origin_t, axis=spec.axis, prismatic=spec.prismatic,
        lower=np.full(6, -np.pi / 2), upper=np.full(6, np.pi / 2),
        tip_r=spec.tip_r, tip_t=spec.tip_t)
    ur5t = Robot(tight, dtype=jnp.float32)
    B = 4096
    qt = rng.uniform(-np.pi / 2, np.pi / 2, size=(B, 6))
    tr5, tt5 = ur5t.fk_batch(qt)  # stays on device
    x05 = jnp.asarray(
        rng.uniform(-np.pi / 2, np.pi / 2, size=(B, 6)), jnp.float32)
    _sync_all((tr5, tt5, x05))
    cfg5 = SolverConfig(max_restarts=64, seed_batch=8, max_iters=48)
    res, dt, spread, sets_ms = timed_piped(
        lambda: ur5t.ik_batch(cfg5, tr5, tt5, x05, validate_seeds=False,
                              rescue_overflow=False))
    _, dt_sync = timed(
        lambda: ur5t.ik_batch(cfg5, tr5, tt5, x05, validate_seeds=False,
                              rescue_overflow=False))
    print(json.dumps({
        "metric": "ur5_tight_limits_solves_per_s",
        "value": round(B / dt, 1), "unit": "solves/s",
        "spread": round(spread, 4), "set_ms": sets_ms,
        "synced_solves_per_s": round(B / dt_sync, 1),
        "success_rate": round(float(jnp.mean(res.found.astype(jnp.float32))), 4),
        "batch": B, "device": dev}))

    # --- config 4: diff-IK batched QP steps ------------------------------
    B = 4096
    # Device-resident inputs (uploaded once, synced): a per-call host
    # upload would serialize the pipelined chain.
    x0d = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
    v_we = jnp.asarray(np.tile(np.array([0, 0, 0.1, 0, 0, 0.0]), (B, 1)),
                       jnp.float32)
    v_max = jnp.asarray(np.full((B, 7), 0.75), jnp.float32)
    _sync_all((x0d, v_we, v_max))
    # rescue=False inside the timed region (the per-call ok-mask fetch
    # would serialize the pipeline); one rescued call afterwards records
    # the Clarabel-parity ok rate the public default delivers.
    res, dt, spread, sets_ms = timed_piped(
        lambda: panda.diff_ik_batch(x0d, v_we, v_max, rescue=False))
    _, dt_sync = timed(
        lambda: panda.diff_ik_batch(x0d, v_we, v_max, rescue=False))
    res_rescued = panda.diff_ik_batch(x0d, v_we, v_max)
    print(json.dumps({
        "metric": "diff_ik_steps_per_s",
        "value": round(B / dt, 1), "unit": "steps/s",
        "spread": round(spread, 4), "set_ms": sets_ms,
        "synced_steps_per_s": round(B / dt_sync, 1),
        "ok_rate": round(float(jnp.mean(res[2].astype(jnp.float32))), 4),
        "ok_rate_rescued": round(
            float(jnp.mean(res_rescued[2].astype(jnp.float32))), 4),
        "batch": B, "device": dev}))

    # --- config 5: 1M-pose motion-planning workload ----------------------
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    # Chunk size is a dispatch-amortization knob: per-execution relay
    # overhead measured 0.5-13 ms depending on the day (PARITY r4 note).
    # Default 64k: the r5 full-sweep comparison recorded 2.97M solves/s
    # at 32k chunks vs 5.31M at 64k (spread 35% vs 1.1%,
    # artifacts/r05_workloads3/4.out) — device work per chunk must stay
    # well above the day's dispatch cost.  OPTIK_MP_CHUNK=8192 reproduces
    # the r3 methodology exactly.
    import os as _os
    chunk = int(_os.environ.get("OPTIK_MP_CHUNK", 65536))
    # Default: 4 chunks = 262k poses (a floor of 4 keeps the sweep's chain
    # deep enough to amortize dispatch); OPTIK_MP_CHUNKS=15 runs the full
    # ~1M-pose sweep (983,040 poses at the default chunk).
    n_chunks = int(_os.environ.get("OPTIK_MP_CHUNKS",
                                   max(4, 131072 // chunk)))
    # validate_seeds=False: chunk seeds are uniform-in-limits by
    # construction, and the per-call device-bool fetch of the validation
    # would serialize the chunk pipeline (robot.ik_batch docstring).
    solve = lambda a, b, c: panda.ik_batch(cfg, a, b, c,
                                           validate_seeds=False,
                                           rescue_overflow=False)
    # Warm up compile.
    qt = rng.uniform(lo, hi, size=(chunk, 7))
    trc, ttc = panda.fk_batch(qt)
    x0c = rng.uniform(lo, hi, size=(chunk, 7)).astype(np.float32)
    out = solve(trc, ttc, jnp.asarray(x0c))
    jax.block_until_ready(out)

    # Pre-generate chunks, then time the solve chain with a single sync.
    chunks = []
    for _ in range(n_chunks):
        qt = rng.uniform(lo, hi, size=(chunk, 7))
        trc, ttc = panda.fk_batch(qt)
        x0c = jnp.asarray(rng.uniform(lo, hi, size=(chunk, 7)), jnp.float32)
        chunks.append((trc, ttc, x0c))
    _sync_all(chunks)
    def sweep():
        t0 = time.perf_counter()
        count = jnp.zeros((), jnp.int32)
        for trc, ttc, x0c in chunks:
            out = solve(trc, ttc, x0c)
            c = out.found_count if out.found_count is not None \
                else jnp.sum(out.found.astype(jnp.int32))
            count = count + c
        found = int(count)  # single device->host fetch = the sync point
        return found, time.perf_counter() - t0

    # Cold sweep: every chunk's first execution.  On the relay, first use
    # of each input buffer pays ~60-100 ms of residency/queue work that a
    # non-relayed production host does not (bench.py measures the same
    # cold-vs-steady split per batch); the steady sweep re-solves the same
    # 131k poses with buffers genuinely warm and is the headline.
    found, dt_cold = sweep()
    sweeps = sorted(sweep()[1] for _ in range(3))
    found, _ = sweep()
    dt = sweeps[1]
    spread = (sweeps[-1] - sweeps[0]) / dt if dt > 0 else 0.0
    n = chunk * n_chunks
    print(json.dumps({
        "metric": "motion_planning_solves_per_s",
        "value": round(n / dt, 1), "unit": "solves/s",
        "spread": round(spread, 4),
        "set_s": [round(v, 3) for v in sweeps],
        "cold_sweep_solves_per_s": round(n / dt_cold, 1),
        "success_rate": round(found / n, 4),
        "poses": n, "device": dev}))


if __name__ == "__main__":
    main()
