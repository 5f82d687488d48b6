#!/usr/bin/env python3
"""Micro-probe: which Pallas primitives crash the relay's Mosaic compiler.

Each case is a tiny standalone kernel; compile+run and report ok/err.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, P = 8, 256


def run(name, kernel, out_shape):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        out = jax.jit(f)()
        jax.block_until_ready(out)
        print(json.dumps({"case": name, "ok": True}), flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        print(json.dumps({"case": name, "ok": False,
                          "err": (msg[0] if msg else "")[:160]}), flush=True)


def main():
    i32sp = jax.ShapeDtypeStruct((S, P), jnp.int32)
    i8sp = jax.ShapeDtypeStruct((S, P), jnp.int8)

    run("iota_dim0", lambda o: o.__setitem__(
        ..., jax.lax.broadcasted_iota(jnp.int32, (S, P), 0)), i32sp)
    run("iota_dim1", lambda o: o.__setitem__(
        ..., jax.lax.broadcasted_iota(jnp.int32, (S, P), 1)), i32sp)
    run("iota_s1_broadcast", lambda o: o.__setitem__(
        ..., jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0), (S, P))), i32sp)
    run("zeros_i32", lambda o: o.__setitem__(
        ..., jnp.zeros((S, P), jnp.int32)), i32sp)
    run("int8_store", lambda o: o.__setitem__(
        ..., (jnp.zeros((S, P), jnp.float32) > 1).astype(jnp.int8)), i8sp)

    def wl_i32(o):
        def body(c):
            x, it = c
            return x + 1, it + 1

        x, _ = jax.lax.while_loop(
            lambda c: c[1] < 4, body,
            (jnp.zeros((S, P), jnp.int32), jnp.zeros((), jnp.int32)))
        o[...] = x

    run("while_i32_carry", wl_i32, i32sp)

    def wl_mixed(o):
        def body(c):
            x, m, it = c
            m2 = m | (x > 2.0)
            x2 = jnp.where(m2 > 0, x, x + 1.0)
            return x2, m2.astype(jnp.int32), it + 1

        x, m, _ = jax.lax.while_loop(
            lambda c: (c[2] < 8) & ~jnp.all(c[1] > 0), body,
            (jnp.zeros((S, P), jnp.float32), jnp.zeros((S, P), jnp.int32),
             jnp.zeros((), jnp.int32)))
        o[...] = m

    run("while_mask_all_exit", wl_mixed, i32sp)


if __name__ == "__main__":
    main()
