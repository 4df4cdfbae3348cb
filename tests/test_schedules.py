"""Learning-rate schedules and loss-weight handler."""

import numpy as np

from casapose_tpu.losses.schedules import LossWeightHandler, exponential_decay_late_start, make_lr_schedule


def test_exponential_decay_late_start():
    sched = exponential_decay_late_start(0.1, decay_steps=100, decay_steps_start=50, decay_rate=0.5)
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(49)), 0.1)
    np.testing.assert_allclose(float(sched(149)), 0.1)  # staircase: floor((149-50)/100)=0
    np.testing.assert_allclose(float(sched(150)), 0.05)
    np.testing.assert_allclose(float(sched(250)), 0.025)


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
