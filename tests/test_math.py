"""Golden-data math tests vs Pinocchio-derived fixtures.

Port of the reference's test family (kylc/optik crates/optik/tests/test_math.rs):
so3 log / right Jacobian and se3 log / right Jacobian over 10 random SE(3)
inputs, plus the explicit zero-rotation singularity case.  Fixtures are the
language-neutral JSON files from the reference test suite (values generated
with Pinocchio).  Epsilon 1e-6, matching the reference.

Extra coverage beyond the reference:
  * all functions are exercised in batch (vmapped) form as well as singly;
  * matrix <-> quaternion round trips;
  * the right Jacobian is finite at exactly theta = 0 (the reference NaNs
    there — we deliberately fix that).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from optik_tpu.math import se3, so3

DATA = pathlib.Path(__file__).parent / "data"


def load(name):
    with open(DATA / name) as f:
        return json.load(f)


def inputs():
    """Fixture transforms as (quat[x,y,z,w], translation) numpy arrays."""
    raw = load("test_math_inputs.json")
    quats = np.array([d["rotation"] for d in raw])
    trans = np.array([d["translation"] for d in raw])
    return quats, trans


def load_matrices(name, n):
    """Fixture matrices are nalgebra-serde serialized, i.e. COLUMN-major
    flat lists; reshape then transpose to get row-major matrices."""
    flat = np.array(load(name)).reshape(-1, n, n)
    return np.swapaxes(flat, -1, -2)


def test_so3_log():
    quats, _ = inputs()
    expected = np.array(load("test_math_outputs_so3_log.json"))
    got = np.asarray(so3.quat_log(jnp.asarray(quats)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_so3_log_from_matrix():
    quats, _ = inputs()
    expected = np.array(load("test_math_outputs_so3_log.json"))
    mats = so3.quat_to_mat(jnp.asarray(quats))
    got = np.asarray(so3.mat_log(mats))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_so3_log_singularity():
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(so3.quat_log(q)), np.zeros(3),
                               atol=1e-6)
    # Negative-w representative of the identity as well (double cover).
    q = jnp.array([0.0, 0.0, 0.0, -1.0])
    np.testing.assert_allclose(np.asarray(so3.quat_log(q)), np.zeros(3),
                               atol=1e-6)


def test_so3_right_jacobian():
    quats, _ = inputs()
    expected = load_matrices("test_math_outputs_so3_right_jacobian.json", 3)
    w = so3.quat_log(jnp.asarray(quats))
    got = np.asarray(so3.right_jacobian(w))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_so3_right_jacobian_finite_at_zero():
    j = np.asarray(so3.right_jacobian(jnp.zeros(3)))
    np.testing.assert_allclose(j, np.eye(3), atol=1e-12)


def test_se3_log():
    quats, trans = inputs()
    expected = np.array(load("test_math_outputs_se3_log.json"))
    r = so3.quat_to_mat(jnp.asarray(quats))
    got = np.asarray(se3.log(r, jnp.asarray(trans)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_se3_log_identity():
    got = np.asarray(se3.log(jnp.eye(3), jnp.array([1.0, -2.0, 3.0])))
    np.testing.assert_allclose(got, [1.0, -2.0, 3.0, 0.0, 0.0, 0.0],
                               atol=1e-12)


def test_se3_right_jacobian():
    quats, trans = inputs()
    expected = load_matrices("test_math_outputs_se3_right_jacobian.json", 6)
    r = so3.quat_to_mat(jnp.asarray(quats))
    got = np.asarray(se3.right_jacobian(r, jnp.asarray(trans)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_batched_matches_single():
    """vmapped evaluation must agree with per-sample evaluation exactly."""
    quats, trans = inputs()
    r = so3.quat_to_mat(jnp.asarray(quats))
    t = jnp.asarray(trans)

    batched = se3.right_jacobian(r, t)
    single = jnp.stack([se3.right_jacobian(r[i], t[i])
                        for i in range(r.shape[0])])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(single))

    vmapped = jax.vmap(se3.right_jacobian)(r, t)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(single),
                               atol=1e-12)


def test_mat_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    r = so3.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(so3.mat_to_quat(r))
    # Quaternions match up to sign.
    dots = np.abs(np.sum(q2 * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-12)


def test_rodrigues_vs_quat():
    rng = np.random.default_rng(1)
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-np.pi, np.pi, size=(32,))
    r = so3.rodrigues(jnp.asarray(axis), jnp.asarray(angle))
    # Reference construction via quaternion exp.
    half = angle / 2
    q = np.concatenate([axis * np.sin(half)[:, None],
                        np.cos(half)[:, None]], axis=-1)
    r_ref = so3.quat_to_mat(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-12)
