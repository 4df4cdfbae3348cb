"""Learning-rate schedules and loss-weight handler."""

import numpy as np

from casapose_tpu.losses.schedules import LossWeightHandler, exponential_decay_late_start, make_lr_schedule


def _reference_late_start(lr0, decay_steps, decay_steps_start, decay_rate, staircase, step):
    """Literal transcription of ExponentialDecayLateStart.__call__
    (casapose/utils/learning_rate_schedules.py:25-49)."""
    offset = 0.0 if decay_steps_start == 0 else 1.0
    p = 0.0 if step < decay_steps_start else offset + (step - decay_steps_start) / decay_steps
    if staircase:
        p = np.floor(p)
    return lr0 * decay_rate**p


def test_exponential_decay_late_start():
    """Pinned to the reference formula, incl. the +1 offset when
    decay_steps_start != 0 (the first decay fires AT `start`)."""
    sched = exponential_decay_late_start(0.1, decay_steps=100, decay_steps_start=50, decay_rate=0.5)
    for step in [0, 49, 50, 51, 149, 150, 151, 250, 500]:
        expected = _reference_late_start(0.1, 100, 50, 0.5, True, step)
        np.testing.assert_allclose(float(sched(step)), expected, err_msg=f"step {step}")
    # spot values: decay begins immediately at start (offset term)
    np.testing.assert_allclose(float(sched(49)), 0.1)
    np.testing.assert_allclose(float(sched(50)), 0.05)
    np.testing.assert_allclose(float(sched(150)), 0.025)


def test_exponential_decay_no_late_start():
    """start == 0: no offset — plain staircase exponential decay."""
    sched = exponential_decay_late_start(0.1, decay_steps=100, decay_steps_start=0, decay_rate=0.5)
    for step in [0, 99, 100, 199, 200]:
        expected = _reference_late_start(0.1, 100, 0, 0.5, True, step)
        np.testing.assert_allclose(float(sched(step)), expected, err_msg=f"step {step}")
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(100)), 0.05)


def test_exponential_decay_non_staircase():
    sched = exponential_decay_late_start(0.1, decay_steps=100, decay_steps_start=50, decay_rate=0.5, staircase=False)
    for step in [0, 49, 50, 100, 250]:
        expected = _reference_late_start(0.1, 100, 50, 0.5, False, step)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6, err_msg=f"step {step}")


def test_piecewise_schedule_from_config():
    # config semantics: boundaries at epoch*batches - 1, values lr * decay^i
    sched = make_lr_schedule(1e-3, 0.5, 15, 0, [50, 75, 90], train_batches=10)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(498)), 1e-3)
    np.testing.assert_allclose(float(sched(500)), 5e-4)
    np.testing.assert_allclose(float(sched(749)), 5e-4 * 0.5)
    np.testing.assert_allclose(float(sched(899)), 1e-3 * 0.125)


def test_loss_weight_handler():
    h = LossWeightHandler(mask_loss_weight=1.0, vertex_loss_weight=0.5, update_rate=0.5, min_weight=0.2)
    lw = h.as_loss_weights()
    assert lw.mask_loss_weight == 1.0
    h.update()
    assert h.mask_loss_weight == 0.5
    h.update()
    h.update()
    assert h.vertex_loss_weight == 0.2  # clamped at min
