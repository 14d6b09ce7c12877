"""Static-shape proposal selection.

The reference builds proposals with dynamic boolean indexing
(proposal_utils.py:12-59): topk -> score filter -> clip -> min-size filter
(-> NMS at inference), then random sampling (custom_maskrcnn.py:117).
Every step shrinks the tensor — a shape XLA cannot trace. Here each stage
keeps the full static slot count and carries a validity mask instead; the
selection *semantics* (ordering, thresholds, greedy NMS) are unchanged.

Note the reference never decodes RPN bbox deltas — its proposals are the
raw anchors (proposal_utils.py:25,47). We reproduce that behavior (it
defines the model the metrics were built on); decode support exists in
ops/boxes.py behind the detector's `decode_proposals` flag.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from livecell_tpu.ops.boxes import clip_boxes, small_box_mask
from livecell_tpu.ops.nms import nms_fixed


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # [K,4]
    scores: jnp.ndarray  # [K]
    valid: jnp.ndarray   # [K] bool


def sample_rows(rng: jax.Array, valid: jnp.ndarray, k: int):
    """Uniformly sample up to k True rows of `valid` (static output).

    Returns ([k] int32 indices, [k] bool mask). Functional equivalent of
    the reference's randperm sampling (proposal_utils.py:6-10, rpn.py:84-99).
    """
    n = valid.shape[0]
    u = jax.random.uniform(rng, valid.shape)
    pri = jnp.where(valid, u + 1.0, 0.0)
    top, idx = jax.lax.top_k(pri, min(k, n))
    if k > n:
        idx = jnp.pad(idx, (0, k - n))
        top = jnp.pad(top, (0, k - n))
    return idx.astype(jnp.int32), top > 0.5


def training_proposals(
    objectness: jnp.ndarray,
    anchors: jnp.ndarray,
    image_size: tuple[int, int],
    rng: jax.Array,
    pre_topk: int = 500,
    score_thresh: float = 0.01,
    min_size: float = 5.0,
    num_samples: int = 128,
    deltas: jnp.ndarray | None = None,
    approx_topk: bool = False,
) -> Proposals:
    """Training-time proposals (reference proposal_utils.py:12-31 + the
    sample_proposals call at custom_maskrcnn.py:117).

    Args:
      objectness: [A] RPN logits flattened in (y, x, anchor) order.
      anchors: [A,4].
      deltas: optional [A,4] RPN deltas; when given, proposals are the
        decoded anchors (decode_proposals mode). Decoding happens AFTER
        the top-k — identical result (selection depends only on scores,
        decode is per-anchor) but 76x less decode/clip work than
        decoding all A anchors.
    """
    from livecell_tpu.ops.topk import top_k
    scores = jax.nn.sigmoid(objectness)
    top_scores, top_idx = top_k(scores, pre_topk, approx=approx_topk)
    boxes = anchors[top_idx]
    if deltas is not None:
        from livecell_tpu.ops.boxes import decode_boxes
        boxes = jax.lax.stop_gradient(decode_boxes(
            deltas[top_idx].astype(jnp.float32), boxes))
    valid = top_scores > score_thresh
    boxes = clip_boxes(boxes, image_size)
    valid &= small_box_mask(boxes, min_size)

    sel, sel_valid = sample_rows(rng, valid, num_samples)
    return Proposals(boxes[sel], top_scores[sel], sel_valid)


def inference_proposals(
    objectness: jnp.ndarray,
    anchors: jnp.ndarray,
    image_size: tuple[int, int],
    pre_topk: int = 250,
    score_thresh: float = 0.3,
    nms_thresh: float = 0.4,
    post_nms: int = 50,
    min_size: float = 10.0,
    nms_fn=nms_fixed,
    deltas: jnp.ndarray | None = None,
) -> Proposals:
    """Inference-time proposals (reference proposal_utils.py:33-59):
    topk -> score>thresh -> clip -> min-size -> greedy NMS -> top post_nms.
    Decode-after-topk as in training_proposals when `deltas` is given.
    """
    scores = jax.nn.sigmoid(objectness)
    top_scores, top_idx = jax.lax.top_k(scores, pre_topk)
    boxes = anchors[top_idx]
    if deltas is not None:
        from livecell_tpu.ops.boxes import decode_boxes
        boxes = decode_boxes(deltas[top_idx].astype(jnp.float32), boxes)
    valid = top_scores > score_thresh
    boxes = clip_boxes(boxes, image_size)
    valid &= small_box_mask(boxes, min_size)

    keep_idx, keep_valid = nms_fn(
        boxes, top_scores, nms_thresh, post_nms, valid)
    return Proposals(boxes[keep_idx], top_scores[keep_idx], keep_valid)
