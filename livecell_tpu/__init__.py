"""livecell_tpu — a TPU-native instance-segmentation framework for LIVECell.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (jakubradziejewski/livecell-instance-segmentation): LIVECell download,
tile preprocessing, a custom Mask R-CNN (ResNet-18 + CBAM + FPN + RPN +
box/mask heads), a transfer Mask R-CNN (ResNet-50 FPN), training loops,
box-metric evaluation, tiled full-frame inference with overlap dedup
stitching, serving, and pipeline explainability.

Design stance (TPU-first, not a port):
  * every device computation runs under one jit with static shapes;
    variable-length sets (instances, proposals, detections) are padded to
    fixed slot counts with validity masks,
  * RoIAlign / mask crop-resize / mask pasting are expressed as dense
    interpolation-matrix einsums that map onto the MXU instead of
    gather-based CUDA kernels,
  * NMS is a fixed-iteration greedy select kernel,
  * data parallelism is jax.sharding over a Mesh (ICI collectives inserted
    by XLA), not NCCL.
"""

__version__ = "0.1.0"

from livecell_tpu.config import Config, ModelConfig, TrainConfig, TileConfig  # noqa: F401
