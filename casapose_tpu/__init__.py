"""casapose_tpu — a TPU-native multi-object 6-DoF pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the CASAPose
reference (fraunhoferhhi/casapose, BMVC 2022): one RGB image ->
per-pixel semantic segmentation + per-pixel 2D keypoint vector fields ->
differentiable least-squares / RANSAC keypoint voting -> EPnP + Gauss-Newton
pose solve -> object poses, evaluated with ADD(-S) / 2D-reprojection metrics.

Design principles (TPU-first, not a port):
  * All compute-path code is jit-compiled JAX with static shapes; the
    reference's host escapes (cv2 PnP via ``tf.numpy_function``,
    tfa ``connected_components``) are replaced by on-device, batched
    formulations (``casapose_tpu.pose.epnp``, ``casapose_tpu.ops``).
  * Gather-heavy ops (partial convolution, guided upsampling) are
    reformulated as shift+select/matmul so they map onto the MXU/VPU.
  * Data parallelism is expressed with ``jax.sharding`` over a device
    mesh; cross-replica BatchNorm falls out of global-batch reductions
    under GSPMD (see ``casapose_tpu.parallel``).
"""

__version__ = "0.1.0"
