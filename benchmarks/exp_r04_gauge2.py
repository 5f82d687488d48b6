#!/usr/bin/env python3
"""Round-4 session 5: stacked-facet gauge solver on device — compile time
and throughput A/B vs the recorded unrolled-form numbers, plus an 8-DoF
exact-path smoke (previously ADMM-only)."""

import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(obj):
    print(json.dumps(obj), flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from optik_tpu import Robot
    from optik_tpu.models import asset_path

    robot = Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                 "panda_hand_tcp", dtype=jnp.float32)
    lo, hi = robot.joint_limits()
    rng = np.random.default_rng(42)
    log({"session": "r04_gauge2", "device": str(jax.devices()[0])})

    v_dir = np.array([0, 0, 0.1, 0, 0, 0.0])
    for B in (4096, 65536, 131072):
        try:
            x0d = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)), jnp.float32)
            v_we = jnp.asarray(np.tile(v_dir, (B, 1)), jnp.float32)
            v_max = jnp.asarray(np.full((B, 7), 0.75), jnp.float32)
            for a in (x0d, v_we, v_max):
                np.asarray(a.ravel()[0])
            t0 = time.time()
            a_, v_, ok_ = robot.diff_ik_batch(x0d, v_we, v_max)
            okr = float(np.asarray(ok_).mean())
            compile_s = time.time() - t0
            DEPTH = 8

            def pipe():
                t1 = time.perf_counter()
                last = None
                for _ in range(DEPTH):
                    last = robot.diff_ik_batch(x0d, v_we, v_max)
                _ = np.asarray(last[0][0])
                return (time.perf_counter() - t1) / DEPTH

            pipe(); pipe()
            vals = [pipe() for _ in range(3)]
            p50 = float(np.median(vals))
            log({"section": "gauge_stacked", "batch": B,
                 "ok_rate": round(okr, 4),
                 "pipelined_steps_per_s": round(B / p50, 1),
                 "pipelined_ms": round(1e3 * p50, 2),
                 "spread": round((max(vals) - min(vals)) / np.median(vals),
                                 4),
                 "compile_s": round(compile_s, 1)})
        except Exception:
            log({"section": "gauge_stacked", "batch": B,
                 "error": traceback.format_exc()[-400:]})

    # 8-DoF exact path on device (compile + correctness smoke).
    try:
        links = "".join(f'<link name="l{i}"/>' for i in range(9))
        joints = "".join(
            f'<joint name="j{i}" type="revolute">'
            f'<parent link="l{i}"/><child link="l{i + 1}"/>'
            f'<origin xyz="0.2 0 0.1" rpy="0 0 0"/>'
            f'<axis xyz="{"0 0 1" if i % 2 == 0 else "0 1 0"}"/>'
            f'<limit lower="-2.5" upper="2.5" effort="1" velocity="1"/>'
            f'</joint>' for i in range(8))
        bot8 = Robot.from_urdf_str(
            f'<robot name="s8">{links}{joints}</robot>', "l0", "l8")
        B = 4096
        x08 = jnp.asarray(rng.uniform(-2.5, 2.5, size=(B, 8)), jnp.float32)
        vw8 = jnp.asarray(rng.standard_normal((B, 6)), jnp.float32)
        vm8 = jnp.asarray(np.ones((B, 8)), jnp.float32)
        for a in (x08, vw8, vm8):
            np.asarray(a.ravel()[0])
        t0 = time.time()
        a8, v8, ok8 = bot8.diff_ik_batch(x08, vw8, vm8)
        okr = float(np.asarray(ok8).mean())
        compile_s = time.time() - t0
        t1 = time.perf_counter()
        last = None
        for _ in range(8):
            last = bot8.diff_ik_batch(x08, vw8, vm8)
        _ = np.asarray(last[0][0])
        per = (time.perf_counter() - t1) / 8
        log({"section": "gauge8dof", "batch": B, "ok_rate": round(okr, 4),
             "pipelined_steps_per_s": round(B / per, 1),
             "compile_s": round(compile_s, 1)})
    except Exception:
        log({"section": "gauge8dof",
             "error": traceback.format_exc()[-400:]})


if __name__ == "__main__":
    main()
