#!/usr/bin/env python3
"""Bisect: which feature of the no-reseed kernel crashes the Mosaic helper.

Builds minimal pallas kernels around solver/lm_soa.lm_loop with feature
flags toggled, on the Panda chain, and reports compile ok/err per variant.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from optik_tpu import Robot, SolverConfig
    from optik_tpu.models import asset_path
    from optik_tpu.ops import soa
    from optik_tpu.ops.pallas import lm_kernel
    from optik_tpu.solver import ik as ik_mod
    from optik_tpu.solver.lm_soa import lm_loop

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    spec = robot.spec
    consts = soa.chain_constants(spec)
    a = spec.num_positions
    lower = [float(v) for v in spec.lower]
    upper = [float(v) for v in spec.upper]
    S, P = 8, 256
    rng = np.random.default_rng(0)
    lo, hi = robot.joint_limits()

    q_tgt = rng.uniform(lo, hi, size=(P, a))
    tr, tt = robot.fk_batch(q_tgt)
    tgt = jnp.concatenate([jnp.asarray(tr, jnp.float32).reshape(P, 9).T,
                           jnp.asarray(tt, jnp.float32).T], axis=0)
    seeds = jnp.asarray(
        rng.uniform(lo, hi, size=(S, P, a)).transpose(2, 0, 1), jnp.float32)
    jax.block_until_ready((tgt, seeds))

    def variant(name, *, max_iters=32, group_stop=True):
        opts = ik_mod.options_from_config(
            SolverConfig(max_restarts=S, seed_batch=S, max_iters=max_iters))

        def kernel(x0_ref, tgt_ref, x_ref, f_ref):
            xs0 = [x0_ref[p] for p in range(a)]
            tgtm = [[tgt_ref[3 * i + j][None, :] for j in range(3)]
                    for i in range(3)]
            tgtt = [tgt_ref[9 + i][None, :] for i in range(3)]
            with soa.approx_atan2():
                res = lm_loop(consts, lower, upper, opts, xs0, tgtm, tgtt,
                              total_restarts=S, s_lanes=S,
                              success_stops_group=group_stop, group_axis=0)
            for p in range(a):
                x_ref[p] = res.xs[p]
            f_ref[...] = res.f

        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pltpu.VMEM)),
                out_shape=(jax.ShapeDtypeStruct((a, S, P), jnp.float32),
                           jax.ShapeDtypeStruct((S, P), jnp.float32)),
            )(seeds, tgt)
            jax.block_until_ready(out)
            print(json.dumps({"case": name, "ok": True}), flush=True)
        except Exception as e:
            msg = str(e).splitlines()
            print(json.dumps({"case": name, "ok": False,
                              "err": (msg[0] if msg else "")[:200]}),
                  flush=True)

    variant("noreseed_groupstop_i32", max_iters=32, group_stop=True)
    variant("noreseed_nogroupstop_i32", max_iters=32, group_stop=False)
    variant("noreseed_groupstop_i8", max_iters=8, group_stop=True)

    # Known-good shape for reference: 2-round reseed via the real builder.
    try:
        cfg = SolverConfig(max_restarts=2 * S, seed_batch=S, max_iters=32)
        solve = lm_kernel.build_kernel_solver(spec, cfg, p_blk=P)
        x0 = jnp.asarray(rng.uniform(lo, hi, size=(P, a)), jnp.float32)
        res = solve(jnp.asarray(tr, jnp.float32), jnp.asarray(tt, jnp.float32), x0)
        jax.block_until_ready(res.found)
        print(json.dumps({"case": "reseed_2round_builder", "ok": True,
                          "succ": int(jnp.sum(res.found.astype(jnp.int32)))}),
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        print(json.dumps({"case": "reseed_2round_builder", "ok": False,
                          "err": (msg[0] if msg else "")[:200]}), flush=True)


if __name__ == "__main__":
    main()
