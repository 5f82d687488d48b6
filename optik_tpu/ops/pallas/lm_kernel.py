"""Pallas TPU kernel: the complete lockstep LM solve resident in VMEM.

Under XLA, the solver's ``while_loop`` carry (~60 lane-shaped arrays) round
trips through HBM every iteration and the body splits across several fusion
kernels.  This kernel runs the *entire* loop for a block of lanes inside one
``pallas_call``: all state lives in VMEM/registers for the duration, HBM is
touched exactly twice (read seeds/targets, write results).

Layout: lanes are (8, P) tiles — 8 sublane rows (the f32 tile minimum) and
poses in *lanes*, with the grid striding pose blocks of width ``p_blk``.
The 8 rows are **pose-packed**: with S seeds per pose (S in {1, 2, 4, 8}),
each tile column carries G = 8 // S poses — row r serves seed ``r % S`` of
pose ``(r // S) * (B // G) + column``.  Packing is the throughput lever: the
sublane dimension is a hardware constant, so a pose that only needs S seed
lanes should share the tile with 8/S - 1 other poses rather than pad.  The
same restart budget still applies per pose (lanes stride it by S rounds of
continuous reseeding), so success is budget-equivalent to the unpacked
layout; Speed-mode pose freezing reduces over row groups via a tiny
block-diagonal matmul (see solver/lm_soa.lm_loop group_size).

Component arrays are (8, P) 2-D tiles throughout, so the shared loop core
(solver/lm_soa.lm_loop) runs unchanged inside the kernel — the only
kernel-specific pieces are ref plumbing and a gather-free seed lookup
(an unrolled select chain over the round axis, since dynamic gathers don't
vectorize on the VPU).

Semantics match solver/lm_soa.solve_soa exactly (same loop core); pinned by
tests/test_pallas.py in interpreter mode and by on-device comparisons.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SolutionMode, SolverConfig
from ...ops import soa
from ...solver import ik as ik_mod
from ...solver.lm_soa import lm_loop

_ROWS = 8  # f32 tile sublane count: the physical row dimension of all lanes

# Loop-body applications per while-loop condition check (identical schedule
# semantics for any value; see solver/lm_soa.lm_loop unroll).  The r3
# depth-4 measurement called this neutral (3.48M vs 3.46M,
# artifacts/bench_r03i_unroll1.out), but depth-4 chains carry ~5 ms/batch
# of relay dispatch noise; the r5 depth-16 sweeps resolve real wins —
# 21.1 / 20.3 / 18.9 / 19.0 ms per 128k batch at unroll 1/2/3/4
# (artifacts/r05_sched.out, r05_unroll34.out), identical found set at
# every setting (lane-iters/solve rises 219.7 -> 224.5 at 3 from
# trailing no-op body applications: cheaper than the serialized
# loop-condition checks they replace; 4's extra slack costs more than
# its checks save).  Cost: ~1.5x kernel compile time, paid once per
# cache. The knob: OPTIK_KERNEL_UNROLL.
import os as _os

DEFAULT_UNROLL = int(_os.environ.get("OPTIK_KERNEL_UNROLL", "3"))


def fold_ee_offset(consts, ee_offset):
    """Compose a constant EE offset into the chain's synthetic tip joint.

    ``ee_offset`` is a 4x4 matrix or an ``(R (3,3), t (3,))`` pair.  The
    reference applies the offset as ``ee = last_joint * ee_offset``
    (kinematics.rs:163); with the tip transform T and offset E this is
    ``T' = T @ E`` — a trace-time constant fold, so the kernel pays nothing.
    """
    org_r, org_t, axes, pris, tip_r, tip_t, has_tip = consts
    if isinstance(ee_offset, tuple):
        er, et = np.asarray(ee_offset[0], np.float64), \
            np.asarray(ee_offset[1], np.float64)
    else:
        m = np.asarray(ee_offset, np.float64)
        er, et = m[:3, :3], m[:3, 3]
    tr = np.asarray(tip_r, np.float64)
    tt = np.asarray(tip_t, np.float64)
    new_r = tr @ er
    new_t = tt + tr @ et
    new_tip_r = [[float(new_r[i, k]) for k in range(3)] for i in range(3)]
    new_tip_t = [float(new_t[i]) for i in range(3)]
    has = not (np.allclose(new_r, np.eye(3)) and np.allclose(new_t, 0.0))
    return org_r, org_t, axes, pris, new_tip_r, new_tip_t, has


def build_kernel_solver(spec, cfg: SolverConfig, dtype=jnp.float32,
                        p_blk: int = 256, interpret: bool = False,
                        ee_offset=None, unroll: int | None = None):
    """Compile a Pallas-backed batched IK solver for one robot+config.

    Returns ``fn(tgt_r (B,3,3), tgt_t (B,3), x0 (B,A)) -> IKResult``.
    The restart lane count S is cfg.seed_batch (capped by the budget); when
    S < 8 the kernel packs ``8 // S`` poses per tile column (see module
    docstring), and B must be a multiple of ``p_blk * (8 // S)``.  The
    remaining budget runs through continuous reseeding, identical to the
    XLA path.

    ``ee_offset``, when given as a 4x4 (or (R (3,3), t (3,)) pair), is
    constant for the solver build and folds into the chain's synthetic tip
    joint — zero runtime cost, same contract as threading it through FK
    (reference: crates/optik/src/kinematics.rs:163, lib.rs:241-247).
    Per-axis linear/angular weighting from the config is applied exactly as
    on the XLA path (conjugated with each lane's target rotation; reference
    contract crates/optik/src/objective.rs:7-38,102-104).
    """
    consts = soa.chain_constants(spec)
    if ee_offset is not None:
        consts = fold_ee_offset(consts, ee_offset)
    a = spec.num_positions
    lower = [float(v) for v in spec.lower]
    upper = [float(v) for v in spec.upper]
    lo_s = np.where(np.isfinite(spec.lower), spec.lower, -np.pi)
    hi_s = np.where(np.isfinite(spec.upper), spec.upper, np.pi)
    opts = ik_mod.options_from_config(cfg)

    if unroll is None:
        # Interpret-mode (CI) defaults to 1 to keep trace/compile time down;
        # results are bitwise identical at any unroll (lm_loop docstring),
        # and test_pallas pins that equivalence explicitly once.
        unroll = 1 if interpret else DEFAULT_UNROLL
    r_total = cfg.total_restarts
    s = min(cfg.seed_batch, r_total)
    if _ROWS % s:
        # Non-divisor seed counts fall back to a padded (s, P) layout.
        g = 1
        rows = s
    else:
        g = _ROWS // s
        rows = _ROWS
    use_reseed = r_total > s
    rounds = -(-r_total // s)
    mode = cfg.solution_mode

    def kernel(x0_ref,    # (A, rows, P_BLK) seeds, row k*S = caller x0
               tgt_ref,   # (12, rows, P_BLK) target pose components
               tab_ref,   # (rounds, A, rows) stride seed table (padded)
               qx0_ref,   # (A, rows, P_BLK) caller seed (quality dist ref)
               x_ref,     # out (A, rows, P_BLK)
               f_ref,     # out (rows, P_BLK)
               succ_ref,  # out (rows, P_BLK) int8
               idx_ref,   # out (rows, P_BLK) int32 restart index
               sit_ref,   # out (rows, P_BLK) int32 iters at first success
               bit_ref):  # out (rows, P_BLK) int32 block loop iterations
        xs0 = [x0_ref[p] for p in range(a)]
        if g == 1:
            # One pose per column: target components stay (1, P) broadcast
            # rows — materializing 8 identical sublanes would turn every
            # target-involving op from 1 vreg into 4.
            tgtm = [[tgt_ref[3 * i + j, 0][None, :] for j in range(3)]
                    for i in range(3)]
            tgtt = [tgt_ref[9 + i, 0][None, :] for i in range(3)]
        else:
            tgtm = [[tgt_ref[3 * i + j] for j in range(3)] for i in range(3)]
            tgtt = [tgt_ref[9 + i] for i in range(3)]

        # Row r serves seed stream r % S (identical streams across packs).
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        lane_col = row_iota % s if g > 1 else row_iota

        seed_lookup = None
        lane_index = None
        if use_reseed:
            # Gather-free lookup: the round k of a lane is
            # (cur_idx - lane) / S; select tab[k] with an unrolled chain.
            def lookup(cur_idx):
                k_lane = (cur_idx - lane_col) // s  # (rows, P)
                out = [jnp.zeros_like(xs0[0])] * a
                for k in range(rounds):
                    sel = k_lane == k
                    for p in range(a):
                        row = tab_ref[k, p][:, None]  # (rows, 1)
                        out[p] = jnp.where(sel, row, out[p])
                return out

            seed_lookup = lookup
            lane_index = lane_col

        qx0 = None
        if mode == SolutionMode.QUALITY:
            if g == 1:
                qx0 = [qx0_ref[p, 0][None, :] for p in range(a)]
            else:
                qx0 = [qx0_ref[p] for p in range(a)]

        # Per-axis weighting, conjugated with each lane's target rotation —
        # identical construction to the XLA path (solver/lm_soa.solve_soa);
        # None when both weights are identity.  Omitting this silently
        # solves the unweighted objective (round-1 confirmed bug).
        weight6 = soa.weight6_from_config(tgtm, cfg.linear_weight,
                                          cfg.angular_weight)

        with soa.approx_atan2():
            res = lm_loop(
            consts, lower, upper, opts, xs0, tgtm, tgtt, weight6=weight6,
            seed_lookup=seed_lookup, lane_index=lane_index,
            total_restarts=r_total, s_lanes=s,
            success_stops_group=(mode == SolutionMode.SPEED),
            group_axis=0, group_size=s if g > 1 else None,
            explore_full_budget=(mode == SolutionMode.QUALITY),
            qx0=qx0,
            group_success_cap=(
                cfg.quality_max_successes or None
                if mode == SolutionMode.QUALITY else None),
            unroll=unroll)

        for p in range(a):
            x_ref[p] = res.xs[p]
        f_ref[...] = res.f
        succ_ref[...] = res.success.astype(jnp.int8)
        if res.restart_index is not None:
            idx_ref[...] = res.restart_index
        else:
            idx_ref[...] = jnp.broadcast_to(lane_col, res.f.shape)
        sit_ref[...] = jnp.broadcast_to(res.succ_iters, res.f.shape)
        # Block's executed loop-iteration count, written to every element.
        # The scalar rides on an iota-derived (rows, 1) tile: Mosaic rejects
        # replicated-constant -> tiled relayouts of i32 vectors (see
        # solver/lm_soa.py zero_i), and scalar+tiled adds are safe.
        bit_ref[...] = jnp.broadcast_to(lane_col * 0 + res.iters,
                                        res.f.shape)

    @functools.partial(jax.jit, static_argnums=())
    def solve(tgt_r, tgt_t, x0, restart_offset=None, lane0_stream=None):
        b = tgt_r.shape[0]
        if b % (p_blk * g):
            raise ValueError(
                f"batch {b} not a multiple of p_blk*packs={p_blk * g}")
        bg = b // g  # tile columns; pose = pack * bg + column

        lo = jnp.asarray(lo_s, dtype)
        hi = jnp.asarray(hi_s, dtype)
        key = jax.random.PRNGKey(cfg.rng_seed)

        # ``restart_offset`` (traced scalar) shifts the fold_in indices of
        # the random-restart draws — the unlimited-restart rounds
        # (robot.ik_batch, max_restarts=0) continue the deterministic
        # restart stream across rounds without a recompile.
        off = 0 if restart_offset is None else restart_offset

        def draw(i):
            k = jax.random.fold_in(key, i + off)
            return jax.random.uniform(k, (a,), dtype=dtype, minval=lo,
                                      maxval=hi)

        r_pad = rounds * s
        table = jax.vmap(draw)(jnp.arange(r_pad))           # (r_pad, A)
        tab_s = table.reshape(rounds, s, a)                 # (rounds, S, A)
        # Physical row r of round k draws restart k*S + r%S.
        tab = jnp.tile(tab_s, (1, g, 1)).transpose(0, 2, 1)  # (rounds, A, rows)

        # Seeds laid out (A, rows, BG): row h*S is pack h's caller x0, rows
        # h*S+1 .. h*S+S-1 are the shared round-0 random seeds.
        x0_t = jnp.asarray(x0, dtype).T.reshape(a, g, bg)    # (A, G, BG)
        # ``lane0_stream`` (traced bool scalar): replace the caller-x0 seed
        # rows with the restart stream's OWN index-``off`` draw — the
        # seed-sharded entry (parallel/mesh.build_seed_sharded_solver) sets
        # this on every chip but the first so the union of per-chip attempt
        # sets is exactly the global fold_in stream (chip 0 keeps x0 at
        # restart index 0, like the reference's restart 0, lib.rs:366-370).
        # Quality-mode seed distances still measure against the true x0
        # (qx0 below derives from x0_t before this substitution).
        seed0_t = x0_t
        if lane0_stream is not None:
            alt = tab_s[0, 0]                                # (A,) = draw(off)
            seed0_t = jnp.where(lane0_stream,
                                jnp.broadcast_to(alt[:, None, None],
                                                 x0_t.shape), x0_t)
        row_list = []
        for h in range(g):
            row_list.append(seed0_t[:, h][:, None, :])       # seed 0
            if s > 1:
                rest = tab_s[0, 1:].T                        # (A, S-1)
                row_list.append(
                    jnp.broadcast_to(rest[:, :, None], (a, s - 1, bg)))
        seeds = jnp.concatenate(row_list, axis=1)            # (A, rows, BG)

        # Targets: component i, row r, col j = pose (r // S) * BG + j.
        # g == 1 keeps a single broadcast row instead of 8 copies.
        tgt12 = jnp.concatenate(
            [jnp.asarray(tgt_r, dtype).reshape(b, 9).T,
             jnp.asarray(tgt_t, dtype).T], axis=0)           # (12, B)
        if g == 1:
            tgt = tgt12[:, None, :]                          # (12, 1, BG)
            qx0 = x0_t                                       # (A, 1, BG)
        else:
            tgt = jnp.repeat(tgt12.reshape(12, g, bg), s,
                             axis=1)                         # (12, rows, BG)
            qx0 = jnp.repeat(x0_t, s, axis=1)                # (A, rows, BG)

        grid = (bg // p_blk,)
        out_shapes = (
            jax.ShapeDtypeStruct((a, rows, bg), dtype),
            jax.ShapeDtypeStruct((rows, bg), dtype),
            jax.ShapeDtypeStruct((rows, bg), jnp.int8),
            jax.ShapeDtypeStruct((rows, bg), jnp.int32),
            jax.ShapeDtypeStruct((rows, bg), jnp.int32),
            jax.ShapeDtypeStruct((rows, bg), jnp.int32),
        )
        xs, fs, succ, ridx, sit, bit = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((a, rows, p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((12, tgt.shape[1], p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rounds, a, rows), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, qx0.shape[1], p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((a, rows, p_blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, p_blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(seeds, tgt, tab, qx0)

        # Unpack (*, rows, BG) -> per-pose (B, S, *): row r of column j is
        # seed r % S of pose (r // S) * BG + j.
        def unpack(arr):  # (rows, BG) -> (B, S)
            return arr.reshape(g, s, bg).transpose(0, 2, 1).reshape(b, s)

        xs = xs.reshape(a, g, s, bg).transpose(1, 3, 2, 0).reshape(b, s, a)
        fs = unpack(fs)
        succ_b = unpack(succ).astype(bool)
        ridx_b = unpack(ridx)
        sit_b = unpack(sit)

        # Winner selection per pose — the same argmin semantics as
        # ik._select, vectorized as a one-hot reduction instead of a
        # vmapped gather: TPU lowers the (B, S, A) gather to a slow
        # scalar-indexed path (profiled at ~0.5 ms/solve, 16% of device
        # time on v5e), while the one-hot select is pure vector ops.
        x0_arr = jnp.asarray(x0, dtype)
        if mode == SolutionMode.SPEED:
            # Deterministic "first success": lowest restart index.
            big = jnp.iinfo(jnp.int32).max
            sel_key = jnp.where(succ_b, ridx_b, big)
            idx = jnp.argmin(sel_key, axis=1)                    # (B,)
            win_key = jnp.min(sel_key, axis=1)                   # (B,) i32
        else:
            # Quality: min seed distance among successes.
            dist = jnp.linalg.norm(xs - x0_arr[:, None, :], axis=-1)
            keyed = jnp.where(succ_b, dist, jnp.inf)
            idx = jnp.argmin(keyed, axis=1)
            win_key = jnp.min(keyed, axis=1)                     # (B,) dtype
        onehot = idx[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (b, s), 1)                                # (B, S)
        # Select+reduce, NOT a one-hot matmul: dot_general would ride the
        # MXU at default (bf16-input) precision and truncate solutions.
        x_win = jnp.sum(jnp.where(onehot[:, :, None], xs, 0.0), axis=1)
        cost = jnp.sum(jnp.where(onehot, fs, 0.0), axis=1)
        iters = jnp.sum(jnp.where(onehot, sit_b, 0), axis=1)
        out = ik_mod.IKResult(found=jnp.any(succ_b, axis=1), x=x_win,
                              cost=cost, iters=iters, sel_key=win_key)
        # Work accounting: every lane of a block runs its block's full loop
        # count, so total lane-iterations = sum over blocks x (rows*p_blk).
        lane_iters = jnp.sum(bit[0, ::p_blk]) * (rows * p_blk)
        return out._replace(
            lane_iters=lane_iters,
            found_count=jnp.sum(out.found.astype(jnp.int32)))

    return solve
