"""PMT-TPU: TPU-native joint semantic segmentation + disparity framework.

A from-scratch JAX/Flax/XLA/Pallas re-design of the capabilities of
cuevhv/PMT_learning_for_semantic_segmentation_and_disparity (a PyTorch/CUDA
research codebase for joint semantic segmentation and stereo disparity
estimation on the ROSeS / garden / cityscapes / kitti datasets).

Design stance (TPU-first, not a port):
  * one SPMD train step compiled with ``jax.jit`` over a ``jax.sharding.Mesh``,
    with explicit collectives via ``shard_map`` where named axes are needed
    (cross-replica batch-norm, gradient ``psum``);
  * NHWC layouts and bf16-friendly compute so convolutions tile onto the MXU;
  * Pallas kernels for the ops the reference delegates to CUDA
    (``spatial_correlation_sampler``) or python loops (PSMNet cost volume);
  * on-device metrics (confusion matrices as one-hot matmuls) instead of the
    reference's per-step numpy round-trips;
  * orbax checkpoints of a pytree train-state instead of pickled .pth.tar.

Subpackages
-----------
core        config system (every reference CLI flag), registries, precision
parallel    device mesh, data-parallel shardings, spatial sharding
ops         correlation, cost volume, warping, resize, edge ops (Pallas + lax)
models      the full model zoo (sdnet family, deeplab, psmnet, hanet)
losses      seg/disp/edge/multitask losses incl. custom_vjp focal-Tversky
metrics     on-device confusion matrix, IoU, P/R/F1, disparity errors
data        manifest reader, dataset math, augmentations, input pipeline
training    train state, optimizers, SPMD step functions, loop, checkpoints
evaluation  evaluator, tiled inference, TTA
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
