"""Roofline / utilization accounting for the LM solver.

SURVEY §5 asks for "per-kernel roofline accounting" in place of the
reference's criterion micro-benches (kylc/optik crates/optik/benches/
bench.rs).  The solver is VPU-bound element-wise math (the SoA path tiles
the lane axis perfectly and never touches the MXU — see ops/soa.py), so
utilization is model FLOPs against the VPU's f32 peak:

    util = lane_iters * flops_per_lane_iter / seconds / vpu_peak

* ``lane_iters`` comes from the solve itself (IKResult.lane_iters, counted
  on device: every executed loop iteration of every lane, including lanes
  frozen by Speed-mode pose freezing — frozen lanes still occupy VPU issue
  slots, their selects just keep the old state).
* ``flops_per_lane_iter`` is measured, not hand-counted: XLA's
  HloCostAnalysis counts a ``while`` body exactly ONCE per call site, so
  the flop count of the lowered batch solver is one loop iteration over all
  B*S lanes plus the one-time setup/selection (seed-table generation,
  per-pose argmin) — a few percent of the body at realistic lane counts.
  Dividing by the lane count gives FLOPs per lane-iteration with that
  one-time work amortized in, which is the honest numerator for "useful
  work the engine asked the VPU for".  The analysis runs on the
  UN-optimized module: post-optimization HLO duplicates producers into
  every consumer fusion (measured 14x on the solver body for CPU), which
  counts compiler-materialized recomputation, not algorithmic work.
  (Calibration: the count matches a hand count of the LM body —
  fused residual+Jacobian ~2.1 kFLOP/lane + J J^T build / 6x6 Cholesky /
  step / gain-ratio ~0.9 kFLOP/lane for the 7-DoF Panda.)
* Transcendentals (sin/cos/sqrt/atan2 in the Rodrigues/log-map chain) are
  reported separately — XLA does not fold them into ``flops``, and on the
  VPU they cost multiple ALU passes each, so achieved-FLOPs understates
  occupancy; utilization here is therefore a LOWER bound.
"""

from __future__ import annotations

from typing import Optional

# Public TPU architecture: each TensorCore pairs one (8, 128) VPU with 4
# independent ALUs per lane position (8*128*4 = 4096 ops/cycle) against 4
# 128x128 MXUs (4 * 128*128 * 2 = 131072 FLOPs/cycle), a fixed per-core
# ratio of 1/32 that cancels the clock.  The VPU f32 peak is therefore each
# generation's published per-chip bf16 MXU peak / 32.  ALUs are counted at
# 1 op/cycle; a pure-FMA workload could reach ~2x this, so utilization
# computed against it is conservative for FMA-dense code.
_MXU_BF16_PEAK = {
    # device_kind substring -> bf16 MXU peak FLOP/s per chip
    "v5 lite": 197e12,   # v5e: 1 core
    "v5e": 197e12,
    "v5p": 459e12,       # 2 cores
    "v6 lite": 918e12,   # trillium
    "v6e": 918e12,
    "v4": 275e12,        # 2 cores
    "v5": 459e12,        # plain "v5" only after the lite/p checks
}


def vpu_peak_flops(device_kind: str) -> Optional[float]:
    """Estimated VPU f32 peak FLOP/s for a jax device_kind, or None."""
    kind = device_kind.lower()
    for key, mxu_peak in _MXU_BF16_PEAK.items():
        if key in kind:
            return mxu_peak / 32.0
    return None


def lane_iter_cost(spec, cfg, dtype=None, b: int = 64) -> dict:
    """Measured per-lane-iteration cost of the LM loop for one robot+config.

    Lowers the XLA-path batch solver (solver/ik.build_batch_solver — the
    exact loop core the Pallas kernel shares, solver/lm_soa.lm_loop) for the
    CPU backend and reads XLA's HloCostAnalysis.  Returns a dict with
    ``flops`` and ``transcendentals`` per lane-iteration.
    """
    import jax
    import jax.numpy as jnp

    from ..solver import ik as ik_mod

    dtype = dtype or jnp.float32
    s = min(cfg.seed_batch, cfg.total_restarts)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.default_matmul_precision("float32"):
        # The precision decorator hides the jit object; __wrapped__ is the
        # jitted solve_batch, which exposes .lower for cost analysis.
        fn = ik_mod.build_batch_solver(spec, cfg, dtype).__wrapped__
        args = (
            jax.ShapeDtypeStruct((b, 3, 3), dtype),
            jax.ShapeDtypeStruct((b, 3), dtype),
            jax.ShapeDtypeStruct((b, spec.num_positions), dtype),
        )
        # Pre-optimization analysis: each traced op once (see module doc).
        cost = fn.lower(*args).cost_analysis()
    lanes = float(b * s)
    return {
        "flops": float(cost.get("flops", 0.0)) / lanes,
        "transcendentals": float(cost.get("transcendentals", 0.0)) / lanes,
    }


def utilization(lane_iters: float, seconds: float, flops_per_iter: float,
                device_kind: str) -> dict:
    """Achieved model FLOP/s and VPU utilization for a timed solve."""
    achieved = lane_iters * flops_per_iter / max(seconds, 1e-12)
    peak = vpu_peak_flops(device_kind)
    out = {"model_gflops_per_s": achieved / 1e9}
    if peak:
        out["vpu_peak_gflops_est"] = peak / 1e9
        out["vpu_util"] = achieved / peak
    return out
