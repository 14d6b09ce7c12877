"""Fixed-shape greedy NMS.

The reference calls torchvision's CUDA NMS (proposal_utils.py:55,
custom_maskrcnn.py:192). That returns a dynamic-length index list — a
shape XLA cannot compile. Here NMS is reformulated with static shapes:

  * scores of invalid candidates are pushed to -inf,
  * a fori_loop runs exactly `max_keep` iterations; each picks the
    highest-scoring live candidate (greedy order — identical to
    torchvision's sequential semantics) and kills every live candidate
    with IoU strictly greater than the threshold,
  * the result is a [N] keep-mask plus the selection order, from which
    callers take a static top-`max_keep` slice.

Cost: max_keep sequential steps of [N]-vector work after one [N,N] IoU
matrix (a single dense op). For the reference's N<=250, max_keep<=50 this
is microseconds on a v5e core.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from livecell_tpu.ops.boxes import box_iou

_NEG = -1e9


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a fixed iteration count.

    Args:
      boxes: [N,4] xyxy.
      scores: [N] selection scores.
      iou_thresh: boxes with IoU > thresh w.r.t. a kept box are suppressed
        (strict >, matching torchvision).
      max_keep: number of greedy picks (static).
      valid: optional [N] bool; invalid rows can never be picked.

    Returns:
      keep_idx: [max_keep] int32 indices in pick order (greedy = descending
        score). Slots past the number of survivors repeat the argmax of a
        fully-suppressed score vector; use keep_valid to mask them.
      keep_valid: [max_keep] bool.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)  # [N,N]

    live_scores = scores if valid is None else jnp.where(valid, scores, _NEG)

    def body(_, state):
        live, keep_idx, keep_val, step = state
        masked = jnp.where(live > _NEG / 2, live, _NEG)
        pick = jnp.argmax(masked)
        ok = masked[pick] > _NEG / 2
        keep_idx = keep_idx.at[step].set(jnp.int32(pick))
        keep_val = keep_val.at[step].set(ok)
        # Suppress the pick itself and all overlaps above threshold.
        suppress = (iou[pick] > iou_thresh) | (
            jnp.arange(n) == pick)
        live = jnp.where(ok & suppress, _NEG, live)
        return live, keep_idx, keep_val, step + 1

    keep_idx = jnp.zeros((max_keep,), jnp.int32)
    keep_val = jnp.zeros((max_keep,), bool)
    _, keep_idx, keep_val, _ = jax.lax.fori_loop(
        0, max_keep, body, (live_scores, keep_idx, keep_val, 0))
    return keep_idx, keep_val
