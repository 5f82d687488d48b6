#!/usr/bin/env python3
"""North-star benchmark: Panda 7-DoF IK solves/s on one TPU chip.

Methodology mirrors the reference's published benchmark loop
(kylc/optik examples/example.py:19-47): random seed configuration, random
*reachable* target (FK of a random configuration), solve at the default
TRAC-IK-equivalent tolerance (tol_f = 1e-6 on the squared log-pose error,
matching the reference default, config.rs:56-59).  On the batch device the
10k-solve Python loop becomes pose batches through the VMEM-resident Pallas
solver kernel (ops/pallas/lm_kernel.py); the XLA SoA path is the automatic
fallback on platforms without Mosaic.

Prints ONE json line:
  {"metric": "panda_ik_solves_per_s", "value": ..., "unit": "solves/s",
   "vs_baseline": ...}

vs_baseline is measured against the driver target of 1e6 solves/s on a
v5p-8 (BASELINE.md), i.e. a per-chip share of 125k solves/s — note the
local chip is a v5e (far lower FLOPs/BW than a v5p core-pair).
Extra context fields (success rate, p50 batch latency, batch size, solver
path) ride along.
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 1e6 / 8.0  # v5p-8 target spread over 8 chips


def main():
    import jax

    # The unrolled solver body compiles slowly through a remote-compile
    # tunnel; persist compiled executables so reruns start hot.
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # Roofline accounting lowers the solver for the CPU backend; make sure
    # a "cpu" platform is registered alongside the TPU one (backends
    # initialize lazily, so this is still effective post-import).
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass

    import jax.numpy as jnp

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    n = robot.num_positions()

    # Throughput configuration (tuned on v5e): Speed mode, 8 lockstep lanes
    # with continuous reseeding through a 64-restart budget, 32 LM
    # iterations per attempt.  tol_f matches the reference default.
    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32,
                       tol_f=1e-6)
    # Overridable for smoke runs on slow backends (CI / CPU); small B
    # falls back to the XLA path at warmup (cascade tiles need B >= 1024).
    # Default picked from the r3 batch-size sweep (artifacts/bench_r03*):
    # pipelined solves/s at 16k/64k/128k/256k = 1.7M/2.9M/3.46M/3.69M vs
    # the 4.05M device-busy bound — 128k amortizes per-execution relay
    # overhead to ~15% while keeping cold-pass upload stalls bounded
    # (p90_cold 1.6 s vs 76 s at 256k).
    B = int(os.environ.get("OPTIK_BENCH_B", 131072))

    rng = np.random.default_rng(42)
    lo, hi = robot.joint_limits()

    # The HEADLINE goes through the public product API: Robot.ik_batch
    # routes large Speed-mode batches to the tuned 3-phase cascade on TPU
    # (robot.py _cascade_solver -> solver/cascade.build_default_solver) and
    # falls back to the XLA SoA path elsewhere — exactly what a user gets.
    # validate_seeds=False skips the per-call device-bool fetch (seeds here
    # are uniform-in-limits by construction; see the ik_batch docstring);
    # rescue_overflow=False likewise skips the per-call overflow-scalar
    # fetch — random reachable workloads sit at ~2.7x capacity headroom
    # (overflow_count stays available on the result for auditing).
    def solve(tr, tt, x0):
        return robot.ik_batch(cfg, tr, tt, x0, validate_seeds=False,
                              rescue_overflow=False)

    def make_batch():
        # Targets/seeds stay device-resident (fk_batch outputs live on the
        # device; x0 is uploaded once here, outside the timed region) — the
        # timed loop measures solving, as the reference's loop times only
        # robot.ik() (examples/example.py:36-38).
        q_tgt = rng.uniform(lo, hi, size=(B, n))
        tr, tt = robot.fk_batch(q_tgt)
        x0 = jax.device_put(
            jnp.asarray(rng.uniform(lo, hi, size=(B, n)), jnp.float32))
        jax.block_until_ready((tr, tt, x0))
        return tr, tt, x0

    # Warmup / compile (ik_batch handles kernel->XLA fallback internally,
    # with a loud one-shot warning).
    tr, tt, x0 = make_batch()
    res = solve(tr, tt, x0)
    jax.block_until_ready(res)
    solver_path = ("ik_batch/pallas-cascade" if any(
        isinstance(k, tuple) and k and k[0] == "cascade"
        for k in robot._solvers) else "ik_batch/xla")

    prof_dir = os.environ.get("OPTIK_PROFILE")
    prof = (jax.profiler.trace(prof_dir) if prof_dir
            else contextlib.nullcontext())

    # Variance-robust protocol (the relay's run-to-run spread was measured
    # at +-25% with the old single-pass design, VERDICT r2): SETS
    # independent steady passes over FRESH batch sets, each pass preceded by
    # a cold touch of its batches.  Target generation is excluded, as in
    # the reference loop which times only robot.ik()
    # (examples/example.py:36-38).  Each solve syncs via a device-scalar
    # fetch (block_until_ready does not reliably serialize on relayed
    # platforms, and queueing many large executions without syncing
    # serializes pathologically there).
    #
    # Cold touches include residual host->device input transfer on a
    # relayed chip (the pre-loop block_until_ready does not guarantee
    # residency there); steady passes re-solve genuinely device-resident
    # inputs — the same device work (lane_iters is deterministic and its
    # cross-batch spread is reported).  The HEADLINE is the
    # median-of-set-medians; ``spread`` = (max-min)/median over set medians
    # — a spread above ~10% means the environment, not the code, moved, and
    # the number should not be used for regression calls.  Cold stats ride
    # along as diagnostics: an outlier that appears cold but not steady is
    # a relay transfer stall, not engine time.
    sets = int(os.environ.get("OPTIK_BENCH_SETS", 5))
    iters = int(os.environ.get("OPTIK_BENCH_ITERS", 3))
    counts = []
    lat_cold = []
    work = []  # executed lane-iterations per batch (device work counter)
    set_medians = []
    set_pipe = []
    lat = []
    with prof:
        for _ in range(sets):
            batches = [make_batch() for _ in range(iters)]
            for tr, tt, x0 in batches:  # cold: first touch of each batch
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                counts.append(int(jnp.sum(res.found.astype(jnp.int32))))
                if res.lane_iters is not None:
                    work.append(int(res.lane_iters))
                lat_cold.append(time.perf_counter() - t1)
            set_lat = []
            for tr, tt, x0 in batches:  # steady, one sync per batch
                t1 = time.perf_counter()
                res = solve(tr, tt, x0)
                _ = int(jnp.sum(res.found.astype(jnp.int32)))
                set_lat.append(time.perf_counter() - t1)
            set_medians.append(float(np.median(set_lat)))
            lat.extend(set_lat)
            # Steady PIPELINED: chain the whole set through a device-side
            # accumulator, one scalar fetch at the end.  On the relayed
            # chip the per-batch sync above costs a ~25-30 ms host round
            # trip during which the device is idle (profiled: 94% device
            # idle between solves, artifacts/profile_r03_summary_*), so
            # the synced number measures the tunnel, not the engine.
            # Pipelining is the deployment shape (the reference's own
            # benchmark keeps its machine saturated, examples/example.py).
            # Chain depth: the r5 depth sweeps (artifacts/r05_main.out
            # "depth", r05_depth2.out) measured 28.2 / 24.6 / 22.5 / 21.3
            # ms/batch at depths 4/8/16/32 and 19.18 / 18.52 / 18.19 at
            # 24/48/96 (final schedule) — per-dispatch relay overhead
            # amortizes until the chain sits ON the 18.16 ms device-busy
            # bound (artifacts/PROFILE_r05.md).  Deployment shape is a
            # continuous stream, so the headline chains the set REPS times
            # (distinct batches cycling; depth = iters * reps = 96 by
            # default, ~1.8 s per pass).
            reps = int(os.environ.get("OPTIK_BENCH_PIPE_REPS", 32))

            def pipe_pass():
                t1 = time.perf_counter()
                acc = None
                for _ in range(reps):
                    for tr, tt, x0 in batches:
                        res = solve(tr, tt, x0)
                        # found_count is computed inside the solve program
                        # (IKResult.found_count) — a separate sum would
                        # cost one more queued execution per batch.
                        c = res.found_count if res.found_count is not None \
                            else jnp.sum(res.found.astype(jnp.int32))
                        acc = c if acc is None else acc + c
                _ = int(acc)  # single device->host fetch = the sync point
                return (time.perf_counter() - t1) / (iters * reps)

            pipe_pass()  # warm the relay's chained-dispatch path
            pipe_pass()  # (first chains after a sync run ~15% slow)
            set_pipe.append(pipe_pass())
    found = int(np.sum(counts))
    p50 = float(np.median(set_medians))
    p50_pipe = float(np.median(set_pipe))
    solves_per_s = B / p50_pipe
    synced_solves_per_s = B / p50
    spread = float((np.max(set_pipe) - np.min(set_pipe))
                   / np.median(set_pipe))
    success = found / (B * iters * sets)

    # Iterations-to-converge histogram (observability; VERDICT r1 item 9):
    # winning lane's LM iterations at first success, bucketed on device.
    hist = None
    if res.iters is not None:
        nb = int(cfg.max_iters) + 2
        hist = np.asarray(jnp.bincount(
            jnp.where(res.found, res.iters, 0), length=nb))[1:]
        hist = {str(i + 1): int(v) for i, v in enumerate(hist) if v}

    # Roofline / utilization (SURVEY §5): model FLOPs per lane-iteration
    # measured by XLA cost analysis of the shared loop core, against the
    # VPU f32 peak of this chip generation (utils/roofline.py).
    roof = {}
    try:
        from optik_tpu.utils import roofline

        cost = roofline.lane_iter_cost(robot.spec, cfg)
        if work:
            kind = jax.devices()[0].device_kind
            roof = roofline.utilization(
                float(np.median(work)), p50_pipe, cost["flops"], kind)
            roof["flops_per_lane_iter"] = round(cost["flops"], 1)
            roof["transcendentals_per_lane_iter"] = round(
                cost["transcendentals"], 1)
            roof["lane_iters_p50"] = float(np.median(work))
            # First-class schedule-efficiency metric (VERDICT r3 item 2):
            # executed lane-iterations per solve.  The median winning lane
            # converges in ~6-8 iterations; everything above ~8 x that is
            # schedule overhead (screen budgets, stragglers, reseed
            # adopts), the whole remaining distance to the device-busy
            # bound.
            roof["lane_iters_per_solve"] = round(
                float(np.median(work)) / B, 1)
            # Weighted-op speed-of-light model (utils/roofline.py): the
            # kernel's actual instruction mix (kernel math mode — atan2 and
            # sincos as polynomials) with multi-pass estimates for
            # div/sqrt; sol_fraction is achieved/SoL under that model,
            # which assumes perfect ALU packing — an EMPIRICAL achievable
            # bound is measured separately by benchmarks/bench_vpu_peak.py.
            ophist = roofline.op_histogram(robot.spec, cfg)
            lane_per_solve = float(np.median(work)) / B
            sol = roofline.speed_of_light(ophist["weighted_ops"],
                                          lane_per_solve, kind)
            if sol:
                roof["weighted_ops_per_lane_iter"] = round(
                    ophist["weighted_ops"], 1)
                roof["sol_solves_per_s_model"] = round(
                    sol["sol_solves_per_s"], 1)
                roof["sol_fraction"] = round(
                    solves_per_s / sol["sol_solves_per_s"], 4)
            roof = {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in roof.items()}
    except Exception as e:
        roof = {"roofline_error": repr(e)[:120]}

    out = {
        "metric": "panda_ik_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 4),
        "success_rate": round(success, 4),
        # Cross-set stability of the headline: >0.1 means the environment
        # moved during the run; do not regress on this number (see the
        # timing-loop comment).
        "spread": round(spread, 4),
        "spread_alert": spread > 0.1,
        # Per-batch-synced measurement (each solve pays one host round
        # trip — on the relay that is tunnel latency, not engine time).
        "synced_solves_per_s": round(synced_solves_per_s, 1),
        "set_medians_ms": [round(1e3 * m, 2) for m in set_medians],
        "set_pipelined_ms": [round(1e3 * m, 2) for m in set_pipe],
        "p50_pipelined_batch_ms": round(1e3 * p50_pipe, 2),
        "p50_batch_latency_ms": round(1e3 * p50, 2),
        "p90_batch_latency_ms": round(1e3 * float(np.percentile(lat, 90)),
                                      2),
        # Cold-pass stats (first touch of each batch): the gap vs the
        # steady numbers above is relay input-transfer overhead, not
        # engine time (see the timing-loop comment).
        "p50_cold_ms": round(1e3 * float(np.median(lat_cold)), 2),
        "p90_cold_ms": round(1e3 * float(np.percentile(lat_cold, 90)), 2),
        # Device work is uniform across batches when the spread is small:
        # latency outliers without a work spread are environmental.
        "lane_iters_spread": (round(float(np.max(work) / np.min(work)), 3)
                              if work else None),
        "iters_to_converge_hist": hist,
        "batch": B,
        "seeds": cfg.seed_batch,
        "restarts": cfg.total_restarts,
        "max_iters": cfg.max_iters,
        "solver": solver_path,
        "chips": len(jax.devices()),
        "device": str(jax.devices()[0]),
    }
    out.update(roof)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
