"""Device-mesh sharding for batched IK.

The reference's parallelism is a single-host rayon pool (lib.rs:38-47); the
scaling axes here are the TPU-native analogs mapped out in SURVEY.md §2:

  * ``data``  — pose queries (the reference's stream of independent solves);
  * ``seed``  — restart seeds (the reference's work-stealing restart axis).

Sharding strategy: lanes are laid out (B, S, A) and annotated with
``NamedSharding(mesh, P("data", "seed"))``; everything in the LM loop is
per-lane elementwise, so XLA partitions it with zero communication, and the
Speed/Quality winner selection (an argmin over S per pose) compiles to an
argmin-reduce collective across the ``seed`` axis over ICI.  On a multi-host
pod the ``data`` axis spans hosts (DCN) — pose shards never talk to each
other.

Single-host multi-chip works out of the box; multi-host requires the caller
to have run ``jax.distributed.initialize`` first (standard JAX runtime).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..ops import kinematics as K
from ..solver import ik as ik_mod, lm
from ..utils.precision import with_f32_matmuls


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None,
              seed: int = 1) -> Mesh:
    """Build a (data, seed) mesh over the given (default: all) devices.

    ``data * seed`` must equal the device count; ``data`` defaults to
    ``len(devices) // seed``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // seed
    if data * seed != n:
        raise ValueError(f"mesh shape {data}x{seed} != {n} devices")
    arr = np.array(devices).reshape(data, seed)
    return Mesh(arr, ("data", "seed"))


@with_f32_matmuls
@partial(jax.jit, static_argnums=(1,), static_argnames=("mesh",))
def _ik_sharded(params: K.ChainParams, cfg: SolverConfig,
                tgt_r, tgt_t, x0, *, mesh: Mesh) -> ik_mod.IKResult:
    """jit body: (B,3,3),(B,3),(B,A) -> IKResult, lanes sharded over mesh."""
    b = tgt_r.shape[0]
    s = cfg.total_restarts
    a = params.num_positions

    key = jax.random.PRNGKey(cfg.rng_seed)
    seeds = jax.vmap(
        lambda x: ik_mod.restart_seeds(params, x, key, s))(x0)  # (B, S, A)

    lane_spec = NamedSharding(mesh, P("data", "seed"))
    seeds = jax.lax.with_sharding_constraint(seeds, lane_spec)

    # Flatten to (B*S, ...) for the lockstep solver; the layout constraint
    # above pins the partitioning so the reshape stays local.
    lanes = seeds.reshape(b * s, a)
    tgt_r_l = jnp.repeat(tgt_r, s, axis=0)
    tgt_t_l = jnp.repeat(tgt_t, s, axis=0)

    res = lm.solve(params, lanes, tgt_r_l, tgt_t_l,
                   ik_mod.options_from_config(cfg),
                   wl=cfg.linear_weight, wa=cfg.angular_weight)

    xs = res.x.reshape(b, s, a)
    fs = res.f.reshape(b, s)
    succ = res.success.reshape(b, s)
    xs = jax.lax.with_sharding_constraint(xs, lane_spec)

    # Selection: argmin over the seed axis -> argmin-reduce collective over
    # ICI when S is sharded.
    out = jax.vmap(lambda xsi, fsi, si, x0i: ik_mod._select(
        cfg.solution_mode, xsi, fsi, si, x0i))(xs, fs, succ, x0)
    out_spec = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda v: jax.lax.with_sharding_constraint(v, out_spec), out)


def ik_sharded(params: K.ChainParams, cfg: SolverConfig,
               tgt_r, tgt_t, x0, mesh: Mesh) -> ik_mod.IKResult:
    """Solve B poses x S seeds sharded over a (data, seed) mesh.

    B must be divisible by mesh.shape['data'] and S by mesh.shape['seed'].
    """
    if tgt_r.shape[0] % mesh.shape["data"]:
        raise ValueError("pose batch not divisible by mesh 'data' axis")
    if cfg.total_restarts % mesh.shape["seed"]:
        raise ValueError("restart count not divisible by mesh 'seed' axis")
    return _ik_sharded(params, cfg, tgt_r, tgt_t, x0, mesh=mesh)
