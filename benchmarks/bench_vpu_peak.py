#!/usr/bin/env python3
"""Empirical VPU throughput brackets for the solver's instruction profile.

The model speed-of-light in utils/roofline.py assumes perfect ALU packing
(4 ops/lane-position/cycle on public TPU generations).  Real elementwise
code is limited by dependency chains: the VPU can only pack independent
ops.  This measures, with synthetic Pallas kernels on the actual chip:

  * ``ilp8``   — 8 independent mul+add chains: the practical upper bound
                 for packable elementwise code;
  * ``serial`` — one fully dependent mul+add chain: the latency-bound
                 floor (ILP=1);
  * ``mix``    — a solver-shaped blend (interleaved mul/add chains with
                 selects, compares and a division), dependency depth ~4:
                 the achievable bound for code like the LM body.

The solver's achieved weighted ops/s (bench.py ``sol_fraction`` inputs)
lands inside [serial, ilp8]; ``achieved / mix`` is the honest "fraction of
achievable" number (VERDICT r2: nobody knew whether 7% VPU util meant 7%
or 40% of achievable).  Prints one JSON line per kernel.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools
import json
import time

import jax
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.devices()[0].platform not in ("tpu", "axon")
    P = 512 if not interp else 128   # (8, 512) f32 = 4 vregs per array
    # Kernel runtimes must dwarf the ~28 ms relay round trip per timed
    # call (the r03 first attempt measured pure RTT): at plausible VPU
    # rates these iteration counts give kernels of hundreds of ms.
    N_IT = (1 << 21) if not interp else 8
    C = 8            # parallel state arrays

    def run(name, body_fn, ops_per_iter, n_it=None, reps=3, chain=4):
        """body_fn: (list of C arrays) -> list of C arrays.

        Times ``chain`` data-dependent kernel launches with ONE final
        fetch, so the ~28 ms relay round trip amortizes over the chain
        (a single launch measured pure RTT on the first attempt, r03).
        """
        n_it = n_it or N_IT

        def kernel(x_ref, o_ref):
            xs0 = tuple(x_ref[i] for i in range(C))

            def body(_, xs):
                return tuple(body_fn(list(xs)))

            out = jax.lax.fori_loop(0, n_it, body, xs0)
            for i in range(C):
                o_ref[i] = out[i]

        @jax.jit
        def go(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, 8, P), jnp.float32),
                interpret=interp,  # CPU: mechanics only, numbers meaningless
            )(x)

        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.0, (C, 8, P)),
            jnp.float32)
        r = go(x)
        _ = float(jnp.sum(r))
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = x
            for _k in range(chain):
                r = go(r)
            _ = float(jnp.sum(r))  # one fetch syncs the whole chain
            lat.append((time.perf_counter() - t0) / chain)
        dt = float(np.median(lat))
        total_ops = ops_per_iter * 8 * P * n_it
        print(json.dumps({
            "metric": f"vpu_{name}_gops_per_s",
            "value": round(total_ops / dt / 1e9, 1), "unit": "Gop/s",
            "ops_per_iter_per_elem": ops_per_iter,
            "p50_ms": round(1e3 * dt, 3),
            "device": str(jax.devices()[0]),
        }), flush=True)

    # ilp8: C independent x = x * a + b chains -> 2*C ops/elem/iter.
    def ilp8(xs):
        return [x * 1.000001 + 1e-7 for x in xs]

    run("ilp8", ilp8, 2 * C)

    # serial: one dependent chain, 16 deep; other arrays untouched.
    def serial(xs):
        y = xs[0]
        for _ in range(16):
            y = y * 1.000001 + 1e-7
        xs[0] = y
        return xs

    run("serial", serial, 32)

    # mix: solver-shaped — per array: 2 fma-ish ops + a neighbor add
    # (dependency depth ~3-4 across C chains), every 4th array a compare +
    # select, one division per iteration over one array.  Op count below.
    def mix(xs):
        out = []
        for i, x in enumerate(xs):
            y = x * 1.000001 + 1e-7          # 2
            y = y + xs[(i + 1) % C] * 1e-9   # 2
            if i % 4 == 0:
                m = y > x                     # 1
                y = jnp.where(m, y, x)        # 1
            out.append(y)
        out[0] = out[0] / (out[1] + 2.0)      # 2 (div counts 1 op here)
        return out

    mix_ops = C * 4 + (C // 4) * 2 + 2
    run("mix", mix, mix_ops)


if __name__ == "__main__":
    main()
