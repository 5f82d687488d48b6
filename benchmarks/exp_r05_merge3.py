"""Microbench: cascade merge scatter vs map-scatter+gather on device.

The round-5 profile (artifacts/PROFILE_r05.md) attributes 0.99 ms/128k-batch
to the 3-level merge's per-field scatters (5 fields x 3 levels).  TPU scatter
with non-sorted unique indices can lower to a serial row-update loop; this
experiment measures, at the exact production shapes, three formulations:

  A  per-field scatter (current `_merge`, drop-mode redirect)
  B  one int32 map scatter + per-field gather-select
  C  packed single scatter (fields concatenated to one (b2, 10) buffer)

Each is iterated in a lax.fori chain inside one jit so per-dispatch relay
overhead amortizes, mirroring the bench.py depth protocol.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 131072
LEVELS = [(B, B // 4), (B // 4, B // 32), (B // 32, B // 32)]
N = 7
REPS = 50


def mk(level, key):
    b, b2 = level
    k1, k2, k3 = jax.random.split(key, 3)
    parent = {
        "found": jax.random.bernoulli(k1, 0.75, (b,)),
        "x": jax.random.normal(k2, (b, N)),
        "cost": jax.random.uniform(k3, (b,)),
        "iters": jax.random.randint(k1, (b,), 0, 64),
    }
    child = {
        "found": jax.random.bernoulli(k2, 0.9, (b2,)),
        "x": jax.random.normal(k3, (b2, N)),
        "cost": jax.random.uniform(k1, (b2,)),
        "iters": jax.random.randint(k2, (b2,), 0, 64),
    }
    idx = jax.random.permutation(k3, b)[:b2]
    return parent, child, idx


def merge_a(parent, child, idx):
    b = parent["found"].shape[0]
    take2 = ~parent["found"][idx] & child["found"]
    idx_eff = jnp.where(take2, idx, b)
    out = {}
    for k in parent:
        out[k] = parent[k].at[idx_eff].set(child[k], mode="drop")
    return out


def merge_b(parent, child, idx):
    b = parent["found"].shape[0]
    b2 = idx.shape[0]
    take2 = ~parent["found"][idx] & child["found"]
    idx_eff = jnp.where(take2, idx, b)
    m = jnp.full((b,), -1, jnp.int32).at[idx_eff].set(
        jnp.arange(b2, dtype=jnp.int32), mode="drop")
    sel = m >= 0
    mc = jnp.maximum(m, 0)
    out = {}
    for k in parent:
        c = child[k][mc]
        if c.ndim > 1:
            out[k] = jnp.where(sel[:, None], c, parent[k])
        else:
            out[k] = jnp.where(sel, c, parent[k])
    return out


def merge_c(parent, child, idx):
    b = parent["found"].shape[0]
    take2 = ~parent["found"][idx] & child["found"]
    idx_eff = jnp.where(take2, idx, b)
    pp = jnp.concatenate(
        [parent["x"], parent["cost"][:, None],
         parent["found"].astype(jnp.float32)[:, None],
         parent["iters"].astype(jnp.float32)[:, None]], axis=1)
    cc = jnp.concatenate(
        [child["x"], child["cost"][:, None],
         child["found"].astype(jnp.float32)[:, None],
         child["iters"].astype(jnp.float32)[:, None]], axis=1)
    o = pp.at[idx_eff].set(cc, mode="drop")
    return {"x": o[:, :N], "cost": o[:, N],
            "found": o[:, N + 1] > 0.5,
            "iters": o[:, N + 2].astype(jnp.int32)}


def chain(fn, data):
    @jax.jit
    def run(data):
        def body(i, acc):
            tot = acc
            for parent, child, idx in data:
                # perturb child cost by acc so the chain has a data dep
                child = dict(child, cost=child["cost"] + tot * 1e-12)
                out = fn(parent, child, idx)
                tot = tot + out["cost"][0]
            return tot
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    return run


def main():
    key = jax.random.PRNGKey(0)
    data = []
    for lv in LEVELS:
        key, sub = jax.random.split(key)
        data.append(mk(lv, sub))
    data = jax.device_put(data)

    # correctness: B and C must match A bitwise
    for name, fn in [("B", merge_b), ("C", merge_c)]:
        for d in data:
            a = merge_a(*d)
            o = fn(*d)
            for k in a:
                assert np.array_equal(np.asarray(a[k]), np.asarray(o[k])), \
                    (name, k)
    print("bitwise parity: B, C == A", flush=True)

    for name, fn in [("A_scatter", merge_a), ("B_mapgather", merge_b),
                     ("C_packed", merge_c)]:
        run = chain(fn, data)
        run(data).block_until_ready()  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(data).block_until_ready()
            ts.append((time.perf_counter() - t0) / REPS * 1e3)
        ms = float(np.median(ts))
        print(json.dumps({"form": name, "ms_per_3level_merge": round(ms, 4),
                          "sets_ms": [round(t, 4) for t in ts]}), flush=True)


if __name__ == "__main__":
    main()
