"""Config parser semantics vs. the shipped configs."""

import numpy as np

from casapose_tpu.utils.config import parse_config


def test_parse_config_8():
    opt = parse_config(["-c", "configs/config_8.ini"])
    assert opt.modelname == "casapose_c_gcu5"
    assert opt.estimate_confidence is True
    assert opt.estimate_coords is True
    assert opt.confidence_regularization is True
    assert opt.imagesize == (448, 448)
    assert opt.imagesize_test == (480, 640)
    assert opt.object.split(",")[0] == "obj_000001"
    assert len(opt.object.split(",")) == 8
    assert opt.lr_epochs_steps == [50, 75, 90]
    assert opt.mask_loss_weight == 1.0
    assert opt.vertex_loss_weight == 0.5
    assert opt.proxy_loss_weight == 0.015
    assert opt.keypoint_loss_weight == 0.007
    assert opt.max_keypoint_pixel_error == 12.5
    assert opt.train_vectors_with_ground_truth is True
    assert opt.batchsize == 4
    assert opt.manualseed == 1237
    assert opt.outf == "output/train_casapose_8_objects"
    # objects_to_copy matrix: csv + background row
    assert opt.objects_to_copy.shape == (9, 2)
    np.testing.assert_array_equal(opt.objects_to_copy[:, 0], np.arange(9))


def test_parse_config_cli_override():
    opt = parse_config(["-c", "configs/config_8.ini", "--batchsize", "16", "--imagesize", "320"])
    assert opt.batchsize == 16
    assert opt.imagesize == (320, 320)


def test_parse_config_13():
    opt = parse_config(["-c", "configs/config_13.ini"])
    assert len(opt.object.split(",")) == 13
    assert opt.filter_test_with_gt is True
    assert opt.datatest_path_filter[0] == "000001"
    assert len(opt.datatest_path_filter) == 13
