"""Training engine: jit-compiled train/eval steps + the epoch loop.

Rebuild of the reference's L4 layer (train_casapose.py:494-938) as pure
functions around a single jit-compiled step:

  host batch (uint8 images, GT arrays)
    -> [jit] device finishing (normalize, one-hot, photometric jitter)
    -> [jit] GT vector fields (ops.vectorfield)
    -> [jit] network forward (models)
    -> [jit] LS voting + keypoint reprojection loss (ops.voting, losses)
    -> [jit] composite loss, grads, Adam update (optax)

Everything between host batch and metrics lives in ONE compiled program, so
there are no host round-trips inside the step (the reference crosses the
host boundary for BPnP/cv2 every step). Data parallelism: the step is
jitted over a (data, model) mesh with the batch sharded on ``data`` —
gradient psum and cross-replica BatchNorm fall out of GSPMD (see
casapose_tpu/parallel/mesh.py).
"""

import dataclasses
import datetime
import os
import time
from functools import partial
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from casapose_tpu.core.checkpoint import (
    export_keras_h5,
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
    save_weights_npz,
)
from casapose_tpu.data.pipeline import prepare_device_batch
from casapose_tpu.losses.losses import LossWeights, composite_loss, keypoint_reprojection_loss
from casapose_tpu.losses.schedules import LossWeightHandler, make_lr_schedule
from casapose_tpu.models.registry import get_model
from casapose_tpu.ops.vectorfield import get_all_vectorfields
from casapose_tpu.ops.voting import ls_voting
from casapose_tpu.parallel.mesh import make_mesh, shard_batch
from casapose_tpu.pose.evaluation import estimate_and_evaluate_poses, evaluate_pose_estimates


def _cache_records_enabled(opt) -> bool:
    """--cache_records unset (None) means ON for training: the decoded-frame
    cache pays off from epoch 2 onward. Evaluation defaults it off."""
    v = getattr(opt, "cache_records", None)
    return True if v is None else bool(v)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration of the train/eval step (hashable for jit)."""

    no_objects: int
    no_points: int
    estimate_confidence: bool
    estimate_coords: bool
    train_vectors_with_ground_truth: bool
    use_bpnp_reprojection_loss: bool
    confidence_regularization: bool
    separated_vectorfields: bool
    max_keypoint_pixel_error: float
    noise: float
    brightness: float
    contrast: float
    saturation: float
    hue: float
    use_imgaug: bool
    color_dataset: bool = True
    # Rematerialize the network forward in the backward pass instead of
    # storing every conv activation between fwd and bwd (jax.checkpoint).
    # Cuts peak HBM (enables larger per-chip batches) for ~1 extra forward
    # of recompute; the step is bandwidth-bound so measure before enabling
    # (benchmarks/profile_remat.py). Off by default.
    remat: bool = False


def build_model_from_opt(opt, no_objects):
    ver_dim = opt.no_points * 2
    if opt.modelname == "pvnet":
        ver_dim *= no_objects
    if opt.estimate_confidence:
        ver_dim += opt.no_points
    kwargs = {}
    custom = getattr(opt, "custom_decoder_params", None)
    if custom:
        # Pass through unconditionally: the registry raises a clear error
        # when the model is not casapose_custom (silently dropping the flag
        # would train the wrong architecture).
        kwargs["decoder_params"] = custom
    # bf16 compute policy: params/optimizer/losses stay f32; conv/BN
    # activations run in bf16 (halves HBM activation traffic — the train
    # step is bandwidth-bound, benchmarks/profile_train.py).
    if getattr(opt, "compute_dtype", "float32") == "bfloat16":
        import jax.numpy as jnp

        kwargs["dtype"] = jnp.bfloat16
    return get_model(opt.modelname, ver_dim=ver_dim, seg_dim=1 + no_objects, base_model=opt.backbonename, **kwargs)


def init_model(model, imagesize, train_vectors_with_ground_truth, seed=0):
    h, w = imagesize
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    gt = jnp.zeros((1, h, w, model.seg_dim), jnp.float32) if train_vectors_with_ground_truth else None
    # jit the init: eager op-by-op initialization dispatches hundreds of tiny
    # kernels (minutes over a remote TPU tunnel); one compiled program is
    # seconds.
    init_fn = jax.jit(partial(model.init, train=False))
    variables = init_fn(jax.random.PRNGKey(seed), img, gt)
    return variables


def forward_and_loss(
    model,
    params,
    batch_stats,
    batch,
    cfg: StepConfig,
    loss_weights: LossWeights,
    rng,
    train: bool,
    pose_estimation: bool = False,
    min_num_eval: int = 200,
):
    """Shared forward pass + loss for train/eval (ref train_step :506-677)."""
    no_objects = cfg.no_objects  # number of foreground objects
    seg_dim = no_objects + 1
    k = cfg.no_points

    img, target_seg = prepare_device_batch(
        batch["img"],
        batch["seg"],
        seg_dim,
        rng_key=rng if train else None,
        noise=cfg.noise if train else 0.0,
        brightness=cfg.brightness,
        contrast=cfg.contrast,
        saturation=cfg.saturation,
        hue=cfg.hue,
        color_jitter=train and not cfg.use_imgaug,
        grayscale_to_rgb=not cfg.color_dataset,
    )
    keypoints2d = batch["keypoints2d"]
    keypoints3d = batch["keypoints3d"]
    cam_mat = batch["camera"]
    diameters = batch["diameters"]
    offsets = batch["offsets"]
    filtered_seg = batch["seg"]
    poses_gt = batch["poses_gt"]

    target_dirs = get_all_vectorfields(target_seg, keypoints2d, filtered_seg, cfg.separated_vectorfields)

    gt_seg_input = target_seg if cfg.train_vectors_with_ground_truth else None
    variables = {"params": params, "batch_stats": batch_stats}
    if train:

        def apply_train(params, img, gt_seg_input):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, img, gt_seg_input, train=True, mutable=["batch_stats"]
            )

        if cfg.remat:
            apply_train = jax.checkpoint(apply_train)
        output_net, mutated = apply_train(params, img, gt_seg_input)
        new_batch_stats = mutated["batch_stats"]
    else:
        output_net = model.apply(variables, img, gt_seg_input, train=False)
        new_batch_stats = batch_stats

    output_seg = output_net[..., :seg_dim]
    if cfg.estimate_confidence:
        output_dirs = output_net[..., seg_dim : seg_dim + 2 * k]
        confidence = output_net[..., seg_dim + 2 * k :]
    else:
        output_dirs = output_net[..., seg_dim:]
        confidence = None

    kp_loss = None
    poses_est = None
    points_est = None
    if cfg.estimate_coords:
        voting_seg = target_seg if cfg.train_vectors_with_ground_truth else output_seg
        coords = ls_voting(voting_seg, output_dirs, confidence, num_points=k)
        kp_loss, poses_est, points_est = keypoint_reprojection_loss(
            coords,
            output_seg,
            poses_gt,
            keypoints3d,
            target_seg,
            cam_mat,
            offsets,
            confidence,
            max_pixel_error=cfg.max_keypoint_pixel_error,
            min_num=50,
            use_bpnp_reprojection_loss=cfg.use_bpnp_reprojection_loss,
            estimate_poses=cfg.use_bpnp_reprojection_loss if train else True,
            confidence_regularization=cfg.confidence_regularization and train,
        )

    losses = composite_loss(
        output_seg,
        target_seg,
        output_dirs,
        target_dirs,
        keypoints2d,
        loss_weights,
        filtered_seg=filtered_seg if train else None,
        pixel_gt_count=batch["pixel_gt_count"] if train else None,
        kp_loss=kp_loss,
    )

    aux = {
        "batch_stats": new_batch_stats,
        "output_seg": output_seg,
        "output_dirs": output_dirs,
        "poses_est": poses_est,
        "points_est": points_est,
        "target_seg": target_seg,
    }

    if pose_estimation:
        if cfg.estimate_coords:
            pose_stats, _, _ = evaluate_pose_estimates(
                points_est,
                poses_est,
                poses_gt,
                target_seg,
                keypoints3d,
                cam_mat,
                diameters,
                min_num=min_num_eval,
            )
        else:
            pose_stats, _, _ = estimate_and_evaluate_poses(
                output_seg,
                target_seg,
                output_dirs,
                poses_gt,
                keypoints3d,
                cam_mat,
                diameters,
                offsets,
                min_num=min_num_eval,
            )
        aux["pose_stats"] = pose_stats

    return losses, aux


def build_train_step(model, tx, cfg: StepConfig, loss_weights: LossWeights):
    """One optimizer step, fully jitted; donates the train state."""

    def step_fn(state: TrainState, batch, rng):
        def loss_fn(params):
            losses, aux = forward_and_loss(
                model, params, state.batch_stats, batch, cfg, loss_weights, rng, train=True
            )
            return losses[0], (losses, aux)

        grads, (losses, aux) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, jnp.stack(losses)

    return jax.jit(step_fn, donate_argnums=(0,))


def build_eval_step(model, cfg: StepConfig, loss_weights: LossWeights, pose_validation: bool, min_num_eval=200):
    def step_fn(state: TrainState, batch, rng):
        losses, aux = forward_and_loss(
            model,
            state.params,
            state.batch_stats,
            batch,
            cfg,
            loss_weights,
            rng,
            train=False,
            pose_estimation=pose_validation,
            min_num_eval=min_num_eval,
        )
        out = {"losses": jnp.stack(losses)}
        if pose_validation:
            out["pose_stats"] = aux["pose_stats"]
        return out

    return jax.jit(step_fn)


def step_config_from_opt(opt, no_objects) -> StepConfig:
    return StepConfig(
        no_objects=no_objects,
        no_points=opt.no_points,
        estimate_confidence=bool(opt.estimate_confidence),
        estimate_coords=bool(opt.estimate_coords),
        train_vectors_with_ground_truth=bool(opt.train_vectors_with_ground_truth),
        use_bpnp_reprojection_loss=bool(opt.use_bpnp_reprojection_loss),
        confidence_regularization=bool(opt.confidence_regularization),
        separated_vectorfields=opt.modelname == "pvnet",
        max_keypoint_pixel_error=float(opt.max_keypoint_pixel_error),
        noise=float(opt.noise),
        brightness=float(opt.brightness),
        contrast=float(opt.contrast),
        saturation=float(opt.saturation),
        hue=float(opt.hue),
        use_imgaug=bool(opt.use_imgaug),
        color_dataset=bool(opt.color_dataset),
        remat=bool(getattr(opt, "remat", False)),
    )


def _device_batch(batch, mesh):
    keep = {k: v for k, v in batch.items() if k != "image_id"}
    return shard_batch(mesh, keep)


def run_training(opt):
    """Full training driver (mirrors train_casapose.py's main flow)."""
    from casapose_tpu.data.ndds import VectorfieldDataset

    print("start:", datetime.datetime.now().time())
    # The environment's experimental TPU plugin ignores the JAX_PLATFORMS
    # env var; apply it via jax.config so CPU-forced smoke runs work on TPU
    # hosts (same workaround as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # Match the f32 reference numerics (see utils/config.py --matmul_precision).
    if getattr(opt, "matmul_precision", None):
        jax.config.update("jax_default_matmul_precision", opt.matmul_precision)
    # Persistent compile cache: repeated CLI runs skip the minutes-long
    # cold compile over a remote TPU tunnel.
    from casapose_tpu.core.cache import setup_compilation_cache

    setup_compilation_cache()
    checkpoint_path = os.path.join(opt.outf, opt.net)
    frozen_path = os.path.join(opt.outf, "frozen_model")
    for p in (opt.outf, checkpoint_path, frozen_path):
        os.makedirs(p, exist_ok=True)
    with open(os.path.join(opt.outf, "header.txt"), "w") as f:
        f.write(str(opt))

    np.random.seed(opt.manualseed)
    objectsofinterest = [x.strip() for x in opt.object.split(",")]
    no_objects = len(objectsofinterest)
    use_split = opt.data == opt.datatest
    separated = opt.modelname == "pvnet"

    mesh = make_mesh(batch_size=opt.batchsize)

    train_dataset = VectorfieldDataset(
        root=opt.data,
        path_meshes=opt.datameshes,
        path_filter_root=opt.data_path_filter,
        color_input=opt.color_dataset,
        no_points=opt.no_points,
        objectsofinterest=objectsofinterest,
        noise=opt.noise,
        random_translation=(opt.translation, opt.translation),
        random_rotation=opt.rotation,
        use_train_split=use_split,
        train_validation_split=opt.train_validation_split,
        output_folder=opt.outf,
        use_imgaug=opt.use_imgaug,
        random_crop=True,
        separated_vectorfields=separated,
        contrast=opt.contrast,
        brightness=opt.brightness,
        hue=opt.hue,
        saturation=opt.saturation,
        wxyz_quaterion_input=opt.data_wxyz_quaterion,
        record_cache_dir=(
            os.path.join(opt.outf, "record_cache", "train") if _cache_records_enabled(opt) else None
        ),
    )
    trainingdata, train_batches = train_dataset.generate_dataset(
        opt.batchsize, opt.epochs, opt.prefetch, opt.imagesize, opt.crop_factor, opt.workers, no_objects,
        seed=opt.manualseed,
    )
    print(f"training data: {train_batches} batches")

    if opt.save_debug_batch:
        from casapose_tpu.utils.visualization import save_batches

        save_batches(trainingdata, os.path.join(opt.outf, "visual_batch"))
        print("saved debug batch; exiting (save_debug_batch)")
        return None

    testingdata, test_batches, test_dataset = None, 0, None
    if opt.datatest:
        test_dataset = VectorfieldDataset(
            root=opt.datatest,
            path_meshes=opt.datameshes,
            path_filter_root=opt.datatest_path_filter,
            color_input=opt.color_dataset,
            no_points=opt.no_points,
            objectsofinterest=objectsofinterest,
            noise=0.00001,
            random_translation=(0, 0),
            random_rotation=0,
            use_validation_split=use_split,
            train_validation_split=opt.train_validation_split,
            output_folder=opt.outf,
            random_crop=False,
            separated_vectorfields=separated,
            wxyz_quaterion_input=opt.datatest_wxyz_quaterion,
            record_cache_dir=(
                os.path.join(opt.outf, "record_cache", "test") if _cache_records_enabled(opt) else None
            ),
        )
        testingdata, test_batches = test_dataset.generate_dataset(
            opt.batchsize, opt.epochs, opt.prefetch, opt.imagesize, opt.crop_factor, opt.workers, no_objects,
            seed=opt.manualseed + 1,
        )
        print(f"testing data: {test_batches} batches")

    model = build_model_from_opt(opt, no_objects)
    variables = init_model(model, opt.imagesize, opt.train_vectors_with_ground_truth, seed=opt.manualseed)

    # ImageNet backbone init, as the reference always does for training
    # (resnet.py:322-326, train_casapose.py:329). Resolution order:
    # $CASAPOSE_IMAGENET_H5 -> ~/.keras/models cache -> download.
    if opt.pretrained:
        from casapose_tpu.core.checkpoint import load_imagenet_backbone

        variables, n_bb = load_imagenet_backbone(variables, base_model=opt.backbonename)
        if n_bb:
            print(f"initialized backbone from imagenet weights ({n_bb} arrays)")
        else:
            print("pretrained=1 but imagenet weights unavailable; training from random init")

    lr_schedule = make_lr_schedule(
        opt.lr, opt.lr_decay, opt.lr_epochs, opt.lr_epochs_start, opt.lr_epochs_steps, int(train_batches)
    )
    # Reference optimizer semantics exactly (tf.keras legacy Adam,
    # train_casapose.py:347) — see core/optimizer.py for why optax.adam
    # is not step-equivalent.
    from casapose_tpu.core.optimizer import adam_tf

    tx = adam_tf(lr_schedule)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if opt.load_h5_weights:
        from casapose_tpu.core.checkpoint import import_keras_h5, load_weights_npz

        fname = os.path.join(frozen_path, opt.load_h5_filename)
        if os.path.exists(fname + ".npz"):
            merged, n, _ = load_weights_npz(fname + ".npz", {"params": params, "batch_stats": batch_stats})
            params, batch_stats = merged["params"], merged["batch_stats"]
            print(f"loaded {n} arrays from {fname}.npz")
        elif os.path.exists(fname + ".h5"):
            merged, n, _ = import_keras_h5(fname + ".h5", {"params": params, "batch_stats": batch_stats})
            params, batch_stats = merged["params"], merged["batch_stats"]
            print(f"imported {n} arrays from {fname}.h5")

    # Weight surgery (train_casapose.py:352-447): expand a trained network
    # to more objects (copy seg-conv columns + CLADE rows per the
    # objects_to_copy mapping) or add confidence maps to a confidence-less
    # net (copy the first ver_dim vertex-conv columns).
    if opt.copy_weights_from_backup_network or opt.copy_weights_add_confidence_maps:
        from casapose_tpu.core.checkpoint import (
            apply_expansion_surgery,
            copy_weights_vertex,
            import_keras_h5,
            load_weights_npz,
        )

        ver_dim = model.ver_dim
        if opt.copy_weights_add_confidence_maps and opt.estimate_confidence:
            backup_model = get_model(
                opt.modelname, ver_dim=ver_dim - opt.no_points, seg_dim=1 + no_objects,
                base_model=opt.backbonename,
            )
        else:
            backup_model = get_model(
                opt.modelname, ver_dim=ver_dim, seg_dim=1 + opt.objects_in_input_network,
                base_model=opt.backbonename,
            )
        backup_vars = dict(
            init_model(backup_model, opt.imagesize, False, seed=opt.manualseed)
        )
        fname = os.path.join(frozen_path, opt.load_h5_filename)
        if os.path.exists(fname + ".npz"):
            backup_vars, n, _ = load_weights_npz(fname + ".npz", backup_vars)
        elif os.path.exists(fname + ".h5"):
            backup_vars, n, _ = import_keras_h5(fname + ".h5", backup_vars)
        else:
            raise FileNotFoundError(f"backup network weights not found at {fname}.(npz|h5)")
        print(f"loaded backup network ({n} arrays)")
        if opt.copy_weights_add_confidence_maps and opt.estimate_confidence:
            params = copy_weights_vertex(params, backup_vars["params"], ver_dim - opt.no_points)
        else:
            params = apply_expansion_surgery(params, backup_vars["params"], opt.objects_to_copy)

    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32)
    )

    start_epoch = 1
    restored, step = restore_checkpoint(checkpoint_path, state)
    if restored is not None:
        state = restored
        start_epoch = int(step) + 1
        print(f"restored checkpoint at epoch {step}")

    loss_handler = LossWeightHandler(
        mask_loss_weight=opt.mask_loss_weight,
        vertex_loss_weight=opt.vertex_loss_weight,
        proxy_loss_weight=opt.proxy_loss_weight,
        kp_loss_weight=opt.keypoint_loss_weight,
        filter_vertex_with_segmentation=opt.filter_vertex_with_segmentation,
        filter_high_proxy_errors=opt.filter_high_proxy_errors,
    )
    loss_weights = loss_handler.as_loss_weights()
    cfg = step_config_from_opt(opt, no_objects)

    train_step = build_train_step(model, tx, cfg, loss_weights)
    eval_step = build_eval_step(model, cfg, loss_weights, pose_validation=False)
    eval_pose_step = build_eval_step(model, cfg, loss_weights, pose_validation=True)

    for name, hdr in (
        ("loss_train.csv", "epoch,batchid,loss,mask_loss,vertex_loss,proxy_loss,keypoint_loss,"
                           "mask_loss_weight,vertex_loss_weight,proxy_loss_weight, kp_loss_weight\n"),
        ("loss_test.csv", "epoch,batchid,loss,mask_loss,vertex_loss,proxy_loss,keypoint_loss,"
                          "mask_loss_weight,vertex_loss_weight,proxy_loss_weight, kp_loss_weight\n"),
        ("train_summary.csv", "epoch,learning_rate,loss,mask_loss,vertex_loss,proxy_loss,keypoint_loss\n"),
    ):
        with open(os.path.join(opt.outf, name), "w") as f:
            f.write(hdr)
    with open(os.path.join(opt.outf, "test_summary.csv"), "w") as f:
        s = "epoch,learning_rate,loss,mask_loss,vertex_loss,proxy_loss,keypoint_loss"
        for obj in objectsofinterest:
            s += f",2d_{obj}"
        for obj in objectsofinterest:
            s += f",3d_{obj}"
        f.write(s + "\n")

    rng = jax.random.PRNGKey(opt.manualseed)

    def log_batch(namefile, epoch, batch_idx, losses):
        with open(os.path.join(opt.outf, namefile), "a") as f:
            f.write(
                "{}, {},{:.15f},{:.7f},{:.7f},{:.7f},{:.7f},{:.4f},{:.4f},{:.4f},{:.4f}\n".format(
                    epoch, batch_idx + 1, losses[0], losses[1], losses[2], losses[3], losses[4],
                    loss_handler.mask_loss_weight, loss_handler.vertex_loss_weight,
                    loss_handler.proxy_loss_weight, loss_handler.kp_loss_weight,
                )
            )

    for epoch in range(start_epoch, opt.epochs + 1):
        # ------------------------------------------------------- train epoch
        # Device->host loss fetches are expensive (~1s each through remote
        # TPU tunnels), so per-batch losses are kept on device and flushed
        # to the CSV once per loginterval — identical file contents, ~10x
        # fewer host synchronizations.
        epoch_loss = np.zeros(5)
        pending = []
        t0 = time.time()

        def flush_pending():
            nonlocal epoch_loss
            for b_idx, loss_dev in pending:
                loss_np = np.asarray(loss_dev)
                epoch_loss += loss_np
                log_batch("loss_train.csv", epoch, b_idx, loss_np)
            pending.clear()

        # jax.profiler trace of up to 5 post-warmup steps of the first
        # epoch (SURVEY §5.1 tracing subsystem). Start/stop indices clamp
        # to the dataset size so short runs still produce a trace.
        profile_dir = getattr(opt, "profile_dir", None) if epoch == start_epoch else None
        prof_start = min(10, max(int(train_batches) - 1, 0))
        prof_stop = min(prof_start + 5, int(train_batches))
        prof_active = False
        for batch_idx in range(int(train_batches)):
            if profile_dir:
                if batch_idx == prof_start and not prof_active:
                    jax.profiler.start_trace(profile_dir)
                    prof_active = True
                elif batch_idx == prof_stop and prof_active:
                    jax.profiler.stop_trace()
                    print(f"wrote profiler trace to {profile_dir}")
                    profile_dir = None
                    prof_active = False
            batch = trainingdata.get_next()
            rng, sub = jax.random.split(rng)
            state, losses = train_step(state, _device_batch(batch, mesh), sub)
            pending.append((batch_idx, losses))
            if (batch_idx + 1) % opt.loginterval == 0:
                flush_pending()
                print(
                    f"{datetime.datetime.now().time()}  Train Epoch: {epoch}, Batch idx: {batch_idx + 1}, "
                    f"Epoch Loss: {epoch_loss[0] / (batch_idx + 1):.15f}"
                )
                print(f"Time {time.time() - t0}")
                t0 = time.time()
        if prof_active:  # loop ended before prof_stop (short dataset)
            jax.profiler.stop_trace()
            print(f"wrote profiler trace to {profile_dir}")
        flush_pending()
        epoch_loss /= max(int(train_batches), 1)
        lr_now = float(lr_schedule(int(state.step)))
        print("==========================")
        print(
            f"== TRAINING == Finished epoch {epoch} (lr={lr_now:.7f}) with total loss: {epoch_loss[0]:.7f} "
            f"--- mask: {epoch_loss[1]:.7f}, vector: {epoch_loss[2]:.7f}, proxy: {epoch_loss[3]:.7f}, "
            f"keypoint: {epoch_loss[4]:.7f} =="
        )
        with open(os.path.join(opt.outf, "train_summary.csv"), "a") as f:
            f.write(
                f"{epoch},{lr_now},{epoch_loss[0]:.7f},{epoch_loss[1]:.7f},{epoch_loss[2]:.7f},"
                f"{epoch_loss[3]:.7f},{epoch_loss[4]:.7f}\n"
            )

        # -------------------------------------------------------- validation
        if testingdata is not None:
            pose_validation = epoch % opt.validationinterval == 0
            vstep = eval_pose_step if pose_validation else eval_step
            epoch_loss = np.zeros(5)
            acc = np.zeros((6, no_objects))
            for batch_idx in range(int(test_batches)):
                batch = testingdata.get_next()
                rng, sub = jax.random.split(rng)
                out = vstep(state, _device_batch(batch, mesh), sub)
                losses = np.asarray(out["losses"])
                epoch_loss += losses
                log_batch("loss_test.csv", epoch, batch_idx, losses)
                if pose_validation:
                    ps = [np.asarray(x) for x in out["pose_stats"]]
                    acc[0] += ps[0]  # valid 2d
                    acc[1] += ps[1]  # valid 3d
                    acc[2] += ps[2]  # gt count
                    acc[3] += ps[7]  # fp (stats row 7, as the eval harness uses; row 3 is all-zero on the LS path)
                    acc[4] += ps[4]  # err 2d
                    acc[5] += ps[5]  # err 3d
            epoch_loss /= max(int(test_batches), 1)
            print(
                f"== VALIDATION == Finished epoch {epoch} with total loss: {epoch_loss[0]:.7f} "
                f"--- mask: {epoch_loss[1]:.7f}, vector: {epoch_loss[2]:.7f}, proxy: {epoch_loss[3]:.7f}, "
                f"keypoint: {epoch_loss[4]:.7f} =="
            )
            err_2d = err_3d = None
            if pose_validation:
                with np.errstate(divide="ignore", invalid="ignore"):
                    err_2d = np.nan_to_num(acc[0] / acc[2])
                    err_3d = np.nan_to_num(acc[1] / acc[2])
                print(f"2D Valid: {err_2d}")
                print(f"2D Valid (mean): {err_2d.mean()}")
                print(f"3D Valid: {err_3d}")
                print(f"3D Valid (mean): {err_3d.mean()}")
            with open(os.path.join(opt.outf, "test_summary.csv"), "a") as f:
                s = (
                    f"{epoch},{lr_now},{epoch_loss[0]:.7f},{epoch_loss[1]:.7f},{epoch_loss[2]:.7f},"
                    f"{epoch_loss[3]:.7f},{epoch_loss[4]:.7f}"
                )
                if pose_validation:
                    for i in range(no_objects):
                        s += f",{err_2d[i]:.4f}"
                    for i in range(no_objects):
                        s += f",{err_3d[i]:.4f}"
                f.write(s + "\n")
        print("==========================")

        # Multi-host: state is replicated, so host 0 writing is sufficient
        # (and concurrent writers would race on the same files).
        if epoch % opt.saveinterval == 0 and jax.process_index() == 0:
            save_checkpoint(checkpoint_path, jax.device_get(state), epoch)
            host_vars = {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            }
            save_weights_npz(os.path.join(frozen_path, "result_w.npz"), host_vars)
            # The portable artifact the reference ecosystem consumes
            # (reference train_casapose.py:903): weights trained here load
            # directly into the reference's eval/surgery flows via
            # load_weights(by_name=True).
            export_keras_h5(os.path.join(frozen_path, "result_w.h5"), host_vars, model=model)

    if jax.process_index() == 0:
        save_checkpoint(checkpoint_path, jax.device_get(state), opt.epochs)
    print("end:", datetime.datetime.now().time())
    return state
