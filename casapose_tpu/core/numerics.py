"""Numerically-safe primitives shared across the framework.

The reference leans on TF's ``divide_no_nan`` / ``multiply_no_nan``
(e.g. casapose/pose_estimation/voting_layers_2d.py:90,107-108 and
casapose/utils/loss_functions.py:110). JAX has no direct equivalents, and a
naive ``where(b != 0, a / b, 0)`` is wrong under autodiff (NaN gradients leak
through the untaken branch), so these wrappers double-``where`` the operand.
"""

import functools

import jax
import jax.numpy as jnp


def f32_precision(fn):
    """Trace ``fn`` under full-float32 matmul precision.

    TPU matmuls default to bf16 passes; pose/voting linear algebra (tiny
    matrices, long reductions) needs real float32. Decorating the public
    entry points keeps the precision choice local to the numerics that need
    it while convolutions elsewhere keep the fast default.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper


def divide_no_nan(a, b):
    """a / b, returning 0 where b == 0, safe under reverse-mode autodiff."""
    b_ok = b != 0
    safe_b = jnp.where(b_ok, b, 1)
    return jnp.where(b_ok, a / safe_b, 0)


def multiply_no_nan(a, b):
    """a * b, returning 0 where b == 0 even if a is inf/NaN there."""
    b_ok = b != 0
    safe_a = jnp.where(b_ok, a, 0)
    return jnp.where(b_ok, safe_a * b, 0)


def safe_l2_normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along ``axis``; zero vectors stay zero (no NaN).

    Mirrors ``tf.math.l2_normalize`` semantics used for ground-truth
    direction fields (casapose/utils/image_utils.py:61).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jnp.where(sq > eps, jnp.sqrt(1.0 / jnp.maximum(sq, eps)), 0.0)
