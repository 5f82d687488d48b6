"""Unrolled Cholesky solve vs numpy reference."""

import jax.numpy as jnp
import numpy as np

from optik_tpu.math import linalg


def random_spd(rng, b, n):
    m = rng.normal(size=(b, n, n))
    return m @ np.swapaxes(m, -1, -2) + 1e-3 * np.eye(n)


def test_cholesky_solve_6x6():
    rng = np.random.default_rng(0)
    a = random_spd(rng, 64, 6)
    b = rng.normal(size=(64, 6))
    x = np.asarray(linalg.cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-8,
                               atol=1e-10)


def test_cholesky_solve_sizes():
    rng = np.random.default_rng(1)
    for n in (1, 2, 3, 7, 8):
        a = random_spd(rng, 8, n)
        b = rng.normal(size=(8, n))
        x = np.asarray(linalg.cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-7,
                                   atol=1e-9)


def test_cholesky_solve_unbatched():
    rng = np.random.default_rng(2)
    a = random_spd(rng, 1, 6)[0]
    b = rng.normal(size=6)
    x = np.asarray(linalg.cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-8)
