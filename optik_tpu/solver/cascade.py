"""Two-phase Speed-mode batch scheduler ("cascade") for the kernel path.

Why: the Pallas solver (ops/pallas/lm_kernel.py) runs a whole pose-block in
one lockstep loop, and Speed-mode pose freezing stops a pose's lanes at its
earliest success — but the *block* keeps iterating until every pose in it
has stopped.  A single non-converging pose therefore holds its block for
the entire restart budget ((max_iters + 1) x rounds iterations) while clean
blocks exit after a few dozen.  At realistic failure rates (~0.1% of random
Panda poses with a 64-restart budget) most blocks contain at least one such
straggler, so the mean block time approaches the worst case.

The cascade bounds that waste:

  phase 1  screen *all* poses with only the first restart rounds
           (default: 2 rounds of ``seed_batch`` lanes — a small, uniform
           budget);
  compact  gather the failed poses (a deterministic stable argsort) into a
           fixed-size tail batch of ``ceil(B / tail_div)`` poses;
  phase 2  replay the *full* restart schedule on the tail only;
  merge    scatter phase-2 results back over the phase-1 failures.

Semantics vs. the single-shot schedule (kernel with the full budget):

  * the found mask is identical: phase 1 computes a prefix of the
    single-shot lockstep schedule, and phase 2 *is* the single-shot
    schedule for every pose phase 1 failed;
  * the winning restart for a pose solved in phase 1 can differ from
    single-shot in one corner — a lane that reseeds past the phase-1 budget
    early could, in single-shot, reach success a few iterations before a
    phase-1-visible success.  Both winners satisfy the same tolerances and
    the selection stays deterministic at any batch size;
  * if more than ``B / tail_div`` poses fail phase 1, the overflow keeps its
    phase-1 failure instead of getting the full budget (the tail batch is
    static).  ``tail_div`` = 8 gives ~40x headroom at the observed ~0.3%
    phase-1 failure rate on random reachable Panda poses.

The reference has no analog (its work-stealing restarts never idle,
lib.rs:298-301); this is scheduling for a lockstep machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SolutionMode, SolverConfig
from . import ik as ik_mod
from ..ops.pallas import lm_kernel


# Module-level jits: these MUST NOT be defined per solve() call — a fresh
# function object means a retrace + recompile round trip on every batch,
# which on a relayed TPU costs seconds (observed: 60x throughput loss).

@functools.partial(jax.jit, static_argnums=4)
def _compact(found, tgt_r, tgt_t, x0, b2):
    """Gather the first b2 poses in failures-first stable order."""
    order = jnp.argsort(found.astype(jnp.int32), stable=True)
    idx = order[:b2]
    return idx, tgt_r[idx], tgt_t[idx], x0[idx]


@jax.jit
def _merge(res1, idx, res2):
    take2 = ~res1.found[idx] & res2.found
    found = res1.found.at[idx].set(res1.found[idx] | res2.found)
    x = res1.x.at[idx].set(jnp.where(take2[:, None], res2.x, res1.x[idx]))
    cost = res1.cost.at[idx].set(jnp.where(take2, res2.cost, res1.cost[idx]))
    return ik_mod.IKResult(found=found, x=x, cost=cost)


def build_cascade_solver(spec, cfg: SolverConfig, dtype=jnp.float32,
                         p_blk: int = 256, phase1_rounds: int = 2,
                         tail_div: int = 8, p_blk2: int | None = None,
                         interpret: bool = False):
    """Compile the two-phase solver; fn(tgt_r, tgt_t, x0) -> IKResult.

    Requires Speed mode and a multi-round restart budget
    (total_restarts > seed_batch); callers should fall back to the plain
    kernel otherwise.  B must be a multiple of ``p_blk``.
    """
    if cfg.solution_mode != SolutionMode.SPEED:
        raise ValueError("cascade scheduling is Speed-mode only")
    s = min(cfg.seed_batch, cfg.total_restarts)
    r1 = phase1_rounds * s
    if cfg.total_restarts <= r1:
        raise ValueError("restart budget fits in phase 1; use the kernel")

    blk2 = p_blk2 or p_blk
    solve1 = lm_kernel.build_kernel_solver(
        spec, cfg.replace(max_restarts=r1), dtype, p_blk=p_blk,
        interpret=interpret)
    solve2 = lm_kernel.build_kernel_solver(
        spec, cfg, dtype, p_blk=blk2, interpret=interpret)

    def solve(tgt_r, tgt_t, x0):
        b = tgt_r.shape[0]
        b2 = min(b, -(-max(b // tail_div, 1) // blk2) * blk2)
        res1 = solve1(tgt_r, tgt_t, x0)
        idx, tr2, tt2, x02 = _compact(res1.found, tgt_r, tgt_t, x0, b2)
        res2 = solve2(tr2, tt2, x02)
        return _merge(res1, idx, res2)

    return solve
