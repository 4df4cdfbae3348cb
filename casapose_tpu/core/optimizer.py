"""Optimizers with the exact reference (tf.keras legacy Adam) update rule.

The reference trains with ``tf.keras.optimizers.Adam(learning_rate=sched)``
(train_casapose.py:347). Its legacy update rule differs from
``optax.adam`` in two ways that matter for step-level parity:

  * the bias correction is folded into the step size
    ``lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)`` and the denominator uses the
    UNcorrected second moment: ``var -= lr_t * m / (sqrt(v) + eps)`` — so
    the effective epsilon scales with ``1/sqrt(1 - b2^t)`` early in
    training, whereas optax applies a fixed eps to the corrected moment;
  * the default epsilon is 1e-7 (optax: 1e-8).

For gradients near zero (dead units, masked pixels) the two rules diverge
measurably in the first steps; this implementation pins the reference
semantics bit-for-bit so cross-framework train parity holds at f32.
"""

from typing import Any, Callable, Union

import jax
import jax.numpy as jnp
import optax


def adam_tf(
    learning_rate: Union[float, Callable[[Any], Any]],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """tf.keras legacy Adam (adam.py in keras 2.x) as an optax transform.

    The schedule is evaluated at the pre-increment step count (TF evaluates
    at ``optimizer.iterations``, which is 0 during the first apply).
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        new_updates = jax.tree.map(lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu)
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
