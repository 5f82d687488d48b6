"""Matmul precision control.

On TPU, XLA's DEFAULT matmul precision routes f32 contractions through
bfloat16 passes (~3 decimal digits).  The IK pipeline chains 7+ small
rotation products per FK and feeds the result into a 1e-6 tolerance check, so
bf16 contraction noise (~1e-3) destroys convergence (measured: success rate
drops from ~94% to ~12% on the Panda benchmark).  The contractions here are
tiny 3x3/6x6 ops far from the MXU-bound regime, so full-f32 precision costs
little — every public jitted entry point traces under this context.
"""

from __future__ import annotations

import functools

import jax


def with_f32_matmuls(fn):
    """Decorator: trace ``fn`` under full-float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
