"""Typed configuration for the whole framework.

The reference scatters its hyperparameters across call sites (see e.g.
reference proposal_utils.py:12-36, custom_maskrcnn.py:185-192, rpn.py:76-81,
preprocess_dataset.py:13,33). Here every constant lives in one frozen
dataclass tree so jitted functions can close over it as static state.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Tiling geometry (reference preprocess_dataset.py:33,86-124 and
    visualize.py:16-24).

    A full LIVECell frame (704x520) is divided into a grid_size x grid_size
    lattice of "mini tiles"; a window_size x window_size window of mini
    tiles slides over all positions, producing (grid_size - window_size + 1)^2
    overlapping tiles.
    """

    frame_width: int = 704
    frame_height: int = 520
    tiles_per_image: int = 25
    window_size: int = 3

    @property
    def grid_size(self) -> int:
        # int(sqrt(25)) + 2 == 7 (reference preprocess_dataset.py:33)
        return int(self.tiles_per_image ** 0.5) + 2

    @property
    def mini_tile_width(self) -> int:
        return self.frame_width // self.grid_size  # 100

    @property
    def mini_tile_height(self) -> int:
        return self.frame_height // self.grid_size  # 74

    @property
    def tile_width(self) -> int:
        return self.mini_tile_width * self.window_size  # 300

    @property
    def tile_height(self) -> int:
        return self.mini_tile_height * self.window_size  # 222

    @property
    def tiles_per_row(self) -> int:
        return self.grid_size - self.window_size + 1  # 5

    @property
    def num_tiles(self) -> int:
        return self.tiles_per_row ** 2  # 25


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Custom Mask R-CNN architecture + detection hyperparameters.

    Values mirror the reference model exactly:
      * anchors: sizes (32,64,128) x ratios (0.5,1,2), stride-4 level
        (reference custom_maskrcnn.py:55-57, anchor_generator.py:8)
      * RoIAlign 7x7, spatial_scale 1/4, sampling_ratio 2
        (reference custom_maskrcnn.py:48-50)
      * training proposals: top-500, score>0.01, min size 5, sample 128
        (reference proposal_utils.py:12-31, custom_maskrcnn.py:117)
      * inference proposals: top-250, score>0.3, min size 10, NMS 0.4,
        keep 50 (reference proposal_utils.py:33-59)
      * detection: score>0.4, NMS 0.5 (reference custom_maskrcnn.py:185-192)
      * RPN matching 0.5/0.3, 128 pos cap, 256 total
        (reference rpn.py:76-81)
      * box fg IoU >= 0.4, mask fg IoU > 0.3
        (reference custom_maskrcnn.py:226,251; mask_utils.py:97)
    """

    num_classes: int = 2

    # Padded input size fed to the network. The raw tile is 300x222; we pad
    # right/bottom with zeros to lane/sublane-friendly multiples so XLA maps
    # convs onto the MXU without ragged edges. Fully convolutional, so the
    # pad region only produces extra background anchors.
    image_height: int = 224
    image_width: int = 304

    # Backbone / FPN.
    backbone_channels: Tuple[int, int, int, int] = (64, 128, 256, 512)
    fpn_channels: int = 256
    cbam_reduction: int = 16
    cbam_spatial_kernel: int = 7

    # Anchors (level-0 of the FPN, stride 4).
    anchor_sizes: Tuple[int, ...] = (32, 64, 128)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_stride: int = 4

    # RoIAlign.
    roi_output_size: int = 7
    roi_spatial_scale: float = 0.25
    roi_sampling_ratio: int = 2

    # Mask head.
    mask_size: int = 28

    # RPN loss sampling.
    rpn_pos_iou: float = 0.5
    rpn_neg_iou: float = 0.3
    rpn_pos_per_image: int = 128
    rpn_batch_per_image: int = 256

    # Training proposals.
    train_pre_topk: int = 500
    train_score_thresh: float = 0.01
    train_min_box_size: float = 5.0
    train_num_samples: int = 128

    # Inference proposals.
    infer_pre_topk: int = 250
    infer_score_thresh: float = 0.3
    infer_nms_thresh: float = 0.4
    infer_post_nms: int = 50
    infer_min_box_size: float = 10.0

    # Detection head postprocess.
    det_score_thresh: float = 0.4
    det_nms_thresh: float = 0.5
    max_detections: int = 50

    # Second-stage matching thresholds.
    box_fg_iou: float = 0.4
    mask_fg_iou: float = 0.3

    # Static instance-slot count for padded ground truth.
    max_instances: int = 128

    # Fixed mode only: run the mask head on the top-N mask-fg-ranked
    # sampled proposals instead of all train_num_samples (0 = all, the
    # reference behavior, custom_maskrcnn.py:124). The mask loss zeroes
    # non-fg proposals anyway, so when the per-image fg count is <= N
    # the loss is identical and the mask head's train FLOPs (~70% of the
    # fixed-mode step) shrink by train_num_samples/N.
    mask_train_samples: int = 0

    # Normalize the backbone with running statistics even in train mode
    # (torchvision FrozenBatchNorm2d semantics — the reference's
    # pretrained backbone, train_transfer.py:22). Skips the per-step
    # batch-stat reduction passes over every backbone activation; a
    # measured perf/quality trade (see STATUS round 3).
    frozen_bn: bool = False

    # Compute the 7x7/2 stem conv via space-to-depth (same math and
    # parameter tree, 4x MXU lane occupancy on C_in=3 — see
    # models/resnet.py:StemConvS2D). bf16-reduction-order different
    # only; a measured perf option.
    stem_s2d: bool = False

    # Compute dtype for the conv/matmul path (params stay f32).
    compute_dtype: str = "bfloat16"

    # RoIAlign einsum precision ("default" = one MXU pass on bf16
    # inputs; "highest" = exact fp32 parity with the CUDA kernel).
    roi_precision: str = "default"

    # RoIAlign backend: "einsum" (XLA MXU contractions), "pallas"
    # (fused VMEM kernel, TPU only — keeps the row-interpolated
    # intermediate on-chip; see ops/pallas_roi_align.py), or "auto"
    # (pallas on TPU hardware, einsum elsewhere).
    roi_backend: str = "auto"

    # Anchor-GT matcher backend for the RPN losses: "xla" (IoU matrix +
    # argmax reductions, matched boxes via one-hot einsum), "pallas"
    # (fused VMEM kernel, IoU matrix never hits HBM; see
    # ops/pallas_match.py), or "auto" (pallas on TPU, xla elsewhere).
    match_backend: str = "auto"

    # Top-k backend for TRAINING-time selection (proposal pre-top-k and
    # the RPN balanced-sampling thresholds): "exact" (lax.top_k = full
    # sort on TPU), "approx" (single-pass ApproxTopK HLO, recall ~0.95
    # over iid-uniform sampling priorities / objectness — statistically
    # equivalent sampling), or "auto" (approx on TPU hardware, exact
    # elsewhere). Inference always uses exact top-k. See ops/topk.py.
    topk_backend: str = "auto"

    # Quirk-fix switches. The reference trains the box/mask heads on
    # batch element 0 only and supervises RPN objectness of image 0
    # against batch-concatenated GT (SURVEY.md §3.1). Defaults preserve
    # those semantics for comparability; enabling trains every image in
    # the batch (per-image RPN matching included), which uses a DP batch
    # properly.
    heads_all_images: bool = False

    # The reference computes RPN bbox deltas but never decodes them —
    # proposals and final boxes are raw anchors (proposal_utils.py:25,47;
    # SURVEY.md §3.1). With decode_proposals=True the deltas are trained
    # (smooth-L1 on positive anchors) and applied, and the box head's
    # class-1 deltas refine final boxes at inference.
    decode_proposals: bool = False

    # Box-coder weights for the second-stage (box head) deltas, active
    # only with decode_proposals=True: targets are scaled up at encode
    # and predictions scaled down at decode (torchvision's Fast R-CNN
    # (10,10,5,5) coding). Sharpens the localization gradient relative
    # to classification; RPN deltas stay unweighted (1,1,1,1) as in
    # torchvision.
    box_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)

    # With decode_proposals=True, additionally supervise RPN deltas on
    # each GT's single best anchor even when its IoU is below
    # rpn_pos_iou (torchvision's allow_low_quality_matches). Without
    # this, GT whose best anchor misses the 0.5 gate get no delta
    # supervision at all and their decoded proposals are noise.
    rpn_force_best_anchor: bool = True

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_ratios)

    @property
    def feature_height(self) -> int:
        """Stride-4 (level-0) feature height for the padded input.

        conv1 (k7 s2 p3) then maxpool (k3 s2 p1), both floor-mode like torch.
        """
        h = (self.image_height + 2 * 3 - 7) // 2 + 1
        return (h + 2 * 1 - 3) // 2 + 1

    @property
    def feature_width(self) -> int:
        w = (self.image_width + 2 * 3 - 7) // 2 + 1
        return (w + 2 * 1 - 3) // 2 + 1

    @property
    def num_anchors(self) -> int:
        return self.feature_height * self.feature_width * self.num_anchors_per_cell


def strict_equivalence_config(mcfg: "ModelConfig") -> "ModelConfig":
    """A deterministic variant of `mcfg` for sharding-equivalence tests.

    The production bf16 step tolerates selection flips between
    compilations (a one-ULP rounding difference in the proposal top-k
    swaps which boxes train the heads), so sharded-vs-single gates on
    it must be graded (tests/test_device_data.py, test_multihost_procs).
    This config removes every nondeterminism source that is not the
    sharding machinery itself:

      - f32 compute (one-ULP bf16 reassociation noise is what flips
        selections),
      - exact top-k (no ApproxTopK HLO),
      - the XLA matcher + einsum RoIAlign at "highest" precision
        (bitwise-reproducible lowerings; the Pallas kernels tile
        differently under different shardings),
      - frozen BN (no cross-device batch-stat reduction, whose
        summation order legitimately differs between mesh layouts).

    Under it, the only cross-device arithmetic left is the gradient
    psum, whose f32 reassociation noise is ~1e-7 relative — so the
    strict tests can gate at rel 1e-6 across multiple steps.
    """
    import dataclasses

    return dataclasses.replace(
        mcfg, compute_dtype="float32", topk_backend="exact",
        match_backend="xla", roi_backend="einsum",
        roi_precision="highest", frozen_bn=True)


def model_config_to_dict(mcfg: "ModelConfig") -> dict:
    """JSON-serializable dict of a ModelConfig (tuples become lists)."""
    d = dataclasses.asdict(mcfg)
    return {k: list(v) if isinstance(v, tuple) else v for k, v in d.items()}


def model_config_from_dict(d: dict) -> "ModelConfig":
    """Inverse of model_config_to_dict; ignores unknown keys so old
    checkpoints stay loadable as fields evolve."""
    fields = {f.name: f for f in dataclasses.fields(ModelConfig)}
    kw = {}
    for k, v in d.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        kw[k] = v
    return ModelConfig(**kw)


def add_train_shape_flags(parser) -> None:
    """Training-side dense-scene knobs (anchor geometry + budgets).

    The reference hard-codes anchor sizes 32/64/128 at stride 4
    (anchor_generator.py:8) and budgets top-500/sample-128
    (proposal_utils.py:12-14) / RPN 128+256 (rpn.py:80-99). LIVECell
    cells have ~20 px median diameter and ~59 instances/tile, so both
    the geometry and the budgets starve dense scenes; these flags adapt
    them at train time (stored in the checkpoint so eval reconstructs
    the exact model).
    """
    parser.add_argument("--anchor_sizes", type=str, default=None,
                        help="comma-separated anchor sizes (reference "
                             "32,64,128; LIVECell-scale cells want e.g. "
                             "12,24,48)")
    parser.add_argument("--anchor_ratios", type=str, default=None,
                        help="comma-separated anchor aspect ratios "
                             "(reference 0.5,1,2)")
    parser.add_argument("--train_topk", type=int, default=0,
                        help="training proposals kept before sampling "
                             "(reference 500)")
    parser.add_argument("--train_samples", type=int, default=0,
                        help="proposals sampled into the box/mask heads "
                             "per image (reference 128)")
    parser.add_argument("--rpn_batch", type=int, default=0,
                        help="anchors sampled into the RPN loss per "
                             "image (reference 256)")
    parser.add_argument("--rpn_pos", type=int, default=0,
                        help="positive-anchor cap within --rpn_batch "
                             "(reference 128)")
    parser.add_argument("--stem_s2d", action="store_true",
                        help="compute the stem conv via space-to-depth "
                             "(identical math + param tree, full MXU "
                             "lanes; models/resnet.py:StemConvS2D)")


def apply_train_shape_flags(mcfg: "ModelConfig", args) -> "ModelConfig":
    """Apply add_train_shape_flags CLI values onto a ModelConfig."""
    kw = {}
    if getattr(args, "anchor_sizes", None):
        kw["anchor_sizes"] = tuple(
            int(s) for s in args.anchor_sizes.split(","))
    if getattr(args, "anchor_ratios", None):
        kw["anchor_ratios"] = tuple(
            float(s) for s in args.anchor_ratios.split(","))
    if getattr(args, "train_topk", 0):
        kw["train_pre_topk"] = args.train_topk
    if getattr(args, "train_samples", 0):
        kw["train_num_samples"] = args.train_samples
    if getattr(args, "rpn_batch", 0):
        kw["rpn_batch_per_image"] = args.rpn_batch
    if getattr(args, "rpn_pos", 0):
        kw["rpn_pos_per_image"] = args.rpn_pos
    if getattr(args, "stem_s2d", False):
        kw["stem_s2d"] = True
    return dataclasses.replace(mcfg, **kw) if kw else mcfg


def apply_dense_flags(mcfg: "ModelConfig", dets: int = 0,
                      infer_nms: float = 0.0, det_nms: float = 0.0
                      ) -> "ModelConfig":
    """Lift the reference's structural detection caps for dense scenes.

    The reference caps inference at 50 detections with NMS 0.4/0.5
    (proposal_utils.py:33-59), which bounds recall on dense LIVECell
    tiles (>100 cells). `dets=N` sets infer_post_nms = max_detections =
    N and infer_pre_topk = 5N; `infer_nms`/`det_nms` override the IoU
    thresholds. Zero values keep the reference behavior.
    """
    if dets:
        mcfg = dataclasses.replace(
            mcfg, infer_pre_topk=5 * dets, infer_post_nms=dets,
            max_detections=dets)
    if infer_nms or det_nms:
        mcfg = dataclasses.replace(
            mcfg, infer_nms_thresh=infer_nms or mcfg.infer_nms_thresh,
            det_nms_thresh=det_nms or mcfg.det_nms_thresh)
    return mcfg


def add_dense_flags(parser) -> None:
    """Attach the shared --dets/--infer_nms/--det_nms CLI flags."""
    parser.add_argument("--dets", type=int, default=0,
                        help="detection budget per tile (sets "
                             "infer_post_nms = max_detections = N and "
                             "infer_pre_topk = 5N; 0 keeps the "
                             "reference's 50-detection cap)")
    parser.add_argument("--infer_nms", type=float, default=0.0,
                        help="proposal NMS IoU (reference 0.4; dense "
                             "tiles benefit from 0.7)")
    parser.add_argument("--det_nms", type=float, default=0.0,
                        help="final detection NMS IoU (reference 0.5)")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference train_custom.py:212-219,297-302)."""

    batch_size: int = 2
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    num_epochs: int = 5
    lr_step_size: int = 2       # StepLR(step_size=2, gamma=0.1)
    lr_gamma: float = 0.1
    seed: int = 0
    eval_score_thresh: float = 0.5   # reference train_custom.py:131
    eval_iou_thresh: float = 0.5     # reference train_custom.py:105


@dataclasses.dataclass(frozen=True)
class TransferTrainConfig:
    """Two-stage transfer schedule (reference train_transfer.py:346-354)."""

    batch_size: int = 2
    stage1_lr: float = 5e-3
    stage1_epochs: int = 3
    stage2_lr: float = 1e-3
    stage2_epochs: int = 2
    momentum: float = 0.9
    weight_decay: float = 5e-4
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    transfer: TransferTrainConfig = dataclasses.field(
        default_factory=TransferTrainConfig)
    tile: TileConfig = dataclasses.field(default_factory=TileConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = Config()
