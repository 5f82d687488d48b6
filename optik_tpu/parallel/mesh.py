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


_solver_cache = {}


def ik_sharded(robot, cfg: SolverConfig, tgt_r, tgt_t, x0,
               mesh: Mesh) -> ik_mod.IKResult:
    """Solve B poses x S seeds sharded over a (data, seed) mesh.

    ``robot`` is an optik_tpu.Robot.  B must be divisible by
    mesh.shape['data'] and S (cfg.total_restarts) by mesh.shape['seed'].
    Lanes run on the SoA fast path; the winner selection lowers to a
    seed-axis argmin-reduce collective.
    """
    if tgt_r.shape[0] % mesh.shape["data"]:
        raise ValueError("pose batch not divisible by mesh 'data' axis")
    if cfg.total_restarts % mesh.shape["seed"]:
        raise ValueError("restart count not divisible by mesh 'seed' axis")

    # Keyed on the spec's *content*, not id() — ids are recycled after GC
    # and a stale entry would serve the wrong chain constants.
    key = (robot.spec.content_key(), robot.dtype, cfg, mesh)
    fn = _solver_cache.get(key)
    if fn is None:
        fn = ik_mod.build_batch_solver(robot.spec, cfg, robot.dtype,
                                       mesh=mesh)
        _solver_cache[key] = fn

    multiproc = any(d.process_index != jax.process_index()
                    for d in mesh.devices.flat)

    def to_global(x):
        """Host data -> device array; on a multi-process mesh, assemble a
        global jax.Array from the (process-replicated) host copy so each
        process only materializes its addressable pose shards."""
        x = np.asarray(x, robot.dtype)
        if not multiproc:
            return jnp.asarray(x)
        sharding = NamedSharding(mesh, P("data"))
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return fn(to_global(tgt_r), to_global(tgt_t), to_global(x0))
