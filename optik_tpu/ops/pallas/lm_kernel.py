"""Pallas TPU kernel: the complete lockstep LM solve resident in VMEM.

Under XLA, the solver's ``while_loop`` carry (~60 lane-shaped arrays) round
trips through HBM every iteration and the body splits across several fusion
kernels.  This kernel runs the *entire* loop for a block of lanes inside one
``pallas_call``: all state lives in VMEM/registers for the duration, HBM is
touched exactly twice (read seeds/targets, write results).

Layout: lanes are (S, P) tiles — the restart-seed axis in *sublanes*
(S = 8 seeds fills a float32 tile's sublane dimension exactly) and poses in
*lanes*, with the grid striding pose blocks of width ``p_blk``.  Component
arrays are (S, P) 2-D tiles throughout, so the shared loop core
(solver/lm_soa.lm_loop) runs unchanged inside the kernel — the only
kernel-specific pieces are ref plumbing and a gather-free seed lookup
(an unrolled select chain over the round axis, since dynamic gathers don't
vectorize on the VPU).

Semantics match solver/lm_soa.solve_soa exactly (same loop core); pinned by
tests/test_pallas.py in interpreter mode and by on-device comparisons.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SolutionMode, SolverConfig
from ...ops import soa
from ...solver import ik as ik_mod
from ...solver.lm_soa import lm_loop


def build_kernel_solver(spec, cfg: SolverConfig, dtype=jnp.float32,
                        p_blk: int = 256, interpret: bool = False):
    """Compile a Pallas-backed batched IK solver for one robot+config.

    Returns ``fn(tgt_r (B,3,3), tgt_t (B,3), x0 (B,A)) -> IKResult``.
    B must be a multiple of ``p_blk``.  The restart lane count is
    cfg.seed_batch (capped by the budget); the remaining budget runs through
    continuous reseeding, identical to the XLA path.
    """
    consts = soa.chain_constants(spec)
    a = spec.num_positions
    lower = [float(v) for v in spec.lower]
    upper = [float(v) for v in spec.upper]
    lo_s = np.where(np.isfinite(spec.lower), spec.lower, -np.pi)
    hi_s = np.where(np.isfinite(spec.upper), spec.upper, np.pi)
    opts = ik_mod.options_from_config(cfg)

    r_total = cfg.total_restarts
    s = min(cfg.seed_batch, r_total)
    use_reseed = r_total > s
    rounds = -(-r_total // s)
    mode = cfg.solution_mode

    def kernel(x0_ref,    # (A, S, P_BLK) seeds, lane 0 = caller x0
               tgt_ref,   # (12, P_BLK) target pose components
               tab_ref,   # (rounds, A, S) stride seed table (padded)
               qx0_ref,   # (A, P_BLK) caller seed (quality distance ref)
               x_ref,     # out (A, S, P_BLK)
               f_ref,     # out (S, P_BLK)
               succ_ref,  # out (S, P_BLK) int8
               idx_ref):  # out (S, P_BLK) int32 restart index
        xs0 = [x0_ref[p] for p in range(a)]
        tgtm = [[tgt_ref[3 * i + j][None, :] for j in range(3)]
                for i in range(3)]
        tgtt = [tgt_ref[9 + i][None, :] for i in range(3)]

        seed_lookup = None
        lane_index = None
        if use_reseed:
            # Gather-free lookup: the round k of a lane is
            # (cur_idx - lane) / S; select tab[k] with an unrolled chain.
            lane_col = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)

            def lookup(cur_idx):
                k_lane = (cur_idx - lane_col) // s  # (S, P)
                out = [jnp.zeros_like(xs0[0])] * a
                for k in range(rounds):
                    sel = k_lane == k
                    for p in range(a):
                        row = tab_ref[k, p][:, None]  # (S, 1)
                        out[p] = jnp.where(sel, row, out[p])
                return out

            seed_lookup = lookup
            lane_index = lane_col

        qx0 = None
        if mode == SolutionMode.QUALITY:
            qx0 = [qx0_ref[p][None, :] for p in range(a)]

        with soa.approx_atan2():
            res = lm_loop(
            consts, lower, upper, opts, xs0, tgtm, tgtt,
            seed_lookup=seed_lookup, lane_index=lane_index,
            total_restarts=r_total, s_lanes=s,
            success_stops_group=(mode == SolutionMode.SPEED),
            group_axis=0,
            explore_full_budget=(mode == SolutionMode.QUALITY),
            qx0=qx0)

        for p in range(a):
            x_ref[p] = res.xs[p]
        f_ref[...] = res.f
        succ_ref[...] = res.success.astype(jnp.int8)
        if res.restart_index is not None:
            idx_ref[...] = res.restart_index
        else:
            idx_ref[...] = jax.lax.broadcasted_iota(
                jnp.int32, res.f.shape, 0)

    @functools.partial(jax.jit, static_argnums=())
    def solve(tgt_r, tgt_t, x0):
        b = tgt_r.shape[0]
        if b % p_blk:
            raise ValueError(f"batch {b} not a multiple of p_blk={p_blk}")

        lo = jnp.asarray(lo_s, dtype)
        hi = jnp.asarray(hi_s, dtype)
        key = jax.random.PRNGKey(cfg.rng_seed)

        def draw(i):
            k = jax.random.fold_in(key, i)
            return jax.random.uniform(k, (a,), dtype=dtype, minval=lo,
                                      maxval=hi)

        r_pad = rounds * s
        table = jax.vmap(draw)(jnp.arange(r_pad))          # (r_pad, A)
        tab = table.reshape(rounds, s, a).transpose(0, 2, 1)  # (rounds, A, S)

        # Seeds laid out (A, S, B): lane 0 = caller's x0.
        x0_t = jnp.asarray(x0, dtype).T                    # (A, B)
        seeds_rest = tab[0, :, 1:]                          # (A, S-1)
        seeds = jnp.concatenate(
            [x0_t[:, None, :],
             jnp.broadcast_to(seeds_rest[:, :, None], (a, s - 1, b))],
            axis=1)                                         # (A, S, B)

        tgt = jnp.concatenate(
            [jnp.asarray(tgt_r, dtype).reshape(b, 9).T,
             jnp.asarray(tgt_t, dtype).T], axis=0)          # (12, B)

        grid = (b // p_blk,)
        out_shapes = (
            jax.ShapeDtypeStruct((a, s, b), dtype),
            jax.ShapeDtypeStruct((s, b), dtype),
            jax.ShapeDtypeStruct((s, b), jnp.int8),
            jax.ShapeDtypeStruct((s, b), jnp.int32),
        )
        xs, fs, succ, ridx = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((a, s, p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((12, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rounds, a, s), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((a, s, p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seeds, tgt, tab, x0_t)

        # Winner selection per pose (same reductions as the XLA path).
        xs = xs.transpose(2, 1, 0)        # (B, S, A)
        fs = fs.T                          # (B, S)
        succ_b = succ.T.astype(bool)
        ridx_b = ridx.T
        x0_arr = jnp.asarray(x0, dtype)
        if mode == SolutionMode.SPEED:
            out = jax.vmap(lambda xsi, fsi, si, x0i, ri: ik_mod._select(
                mode, xsi, fsi, si, x0i, ri))(xs, fs, succ_b, x0_arr, ridx_b)
        else:
            out = jax.vmap(lambda xsi, fsi, si, x0i: ik_mod._select(
                mode, xsi, fsi, si, x0i))(xs, fs, succ_b, x0_arr)
        return out

    return solve
