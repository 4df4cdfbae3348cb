"""Learning-rate schedules and mutable loss-weight handling.

Optax equivalents of casapose/utils/learning_rate_schedules.py plus the
piecewise-constant construction used by the train script
(train_casapose.py:334-345).
"""

from typing import Optional, Sequence

import optax


def exponential_decay_late_start(
    initial_learning_rate: float,
    decay_steps: int,
    decay_steps_start: int,
    decay_rate: float,
    staircase: bool = True,
):
    """Exponential decay that only begins after ``decay_steps_start`` steps.

    Mirrors ``ExponentialDecayLateStart`` (learning_rate_schedules.py:25-49)
    exactly, including the offset term: once ``decay_steps_start != 0``, the
    exponent gets +1 the moment decay starts (the first decay "fires" at
    ``start``, not ``start + decay_steps``):

      p(step) = 0                                   if step < start
              = offset + (step - start)/decay_steps otherwise,
        offset = 0 if start == 0 else 1
      lr(step) = lr0 * decay_rate ** (floor(p) if staircase else p)
    """

    def schedule(step):
        import jax.numpy as jnp

        offset = 0.0 if decay_steps_start == 0 else 1.0
        p = jnp.where(
            step < decay_steps_start,
            0.0,
            offset + (step - decay_steps_start) / decay_steps,
        )
        p = jnp.floor(p) if staircase else p
        return initial_learning_rate * (decay_rate**p)

    return schedule


def make_lr_schedule(
    lr: float,
    lr_decay: float,
    lr_epochs: int,
    lr_epochs_start: int,
    lr_epochs_steps: Optional[Sequence[int]],
    train_batches: int,
):
    """Config -> schedule, matching train_casapose.py:334-345 exactly.

    With ``lr_epochs_steps`` set, boundaries are (epoch*batches - 1) with
    values lr * decay^i; otherwise the late-start exponential decay applies.
    """
    if lr_epochs_steps is not None:
        boundaries_and_scales = {int(e * train_batches - 1): lr_decay for e in lr_epochs_steps}
        return optax.piecewise_constant_schedule(lr, boundaries_and_scales)
    return exponential_decay_late_start(
        lr,
        decay_steps=train_batches * lr_epochs,
        decay_steps_start=train_batches * lr_epochs_start,
        decay_rate=lr_decay,
    )


class LossWeightHandler:
    """Mutable loss-weight container (learning_rate_schedules.py:62-115).

    The default pipeline never updates the weights, but the handler keeps
    the update/clamp API for parity.
    """

    def __init__(
        self,
        mask_loss_weight=1.0,
        vertex_loss_weight=0.5,
        proxy_loss_weight=0.015,
        kp_loss_weight=0.0,
        filter_vertex_with_segmentation=False,
        filter_high_proxy_errors=False,
        update_rate=1.0,
        min_weight=0.0001,
        max_weight=1.0,
    ):
        self.mask_loss_weight = mask_loss_weight
        self.vertex_loss_weight = vertex_loss_weight
        self.proxy_loss_weight = proxy_loss_weight
        self.kp_loss_weight = kp_loss_weight
        self.filter_vertex_with_segmentation = filter_vertex_with_segmentation
        self.filter_high_proxy_errors = filter_high_proxy_errors
        self.update_rate = update_rate
        self.min_weight = min_weight
        self.max_weight = max_weight

    def update(self):
        def clamp(w):
            return min(max(w * self.update_rate, self.min_weight), self.max_weight)

        self.mask_loss_weight = clamp(self.mask_loss_weight)
        self.vertex_loss_weight = clamp(self.vertex_loss_weight)
        self.proxy_loss_weight = clamp(self.proxy_loss_weight)
        self.kp_loss_weight = clamp(self.kp_loss_weight)

    def as_loss_weights(self):
        from casapose_tpu.losses.losses import LossWeights

        return LossWeights(
            mask_loss_weight=float(self.mask_loss_weight),
            vertex_loss_weight=float(self.vertex_loss_weight),
            proxy_loss_weight=float(self.proxy_loss_weight),
            kp_loss_weight=float(self.kp_loss_weight),
            filter_vertex_with_segmentation=bool(self.filter_vertex_with_segmentation),
            filter_high_proxy_errors=bool(self.filter_high_proxy_errors),
        )

    def print(self):
        print(
            f"loss weights: mask {self.mask_loss_weight}, vertex {self.vertex_loss_weight}, "
            f"proxy {self.proxy_loss_weight}, keypoint {self.kp_loss_weight}"
        )
