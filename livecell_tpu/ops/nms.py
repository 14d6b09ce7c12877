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


def nms_iterated(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
    valid: jnp.ndarray | None = None,
    max_sweeps: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS via iterated matrix sweeps instead of `max_keep`
    sequential argmax steps.

    Greedy NMS is the unique solution of the score-order recurrence
      alive[i] = not exists j (rank j < rank i, alive[j], iou[j,i] > t)
    The sweep operator g(alive)[i] evaluates that formula against the
    CURRENT alive set; g is order-reversing, so iterating from the
    all-alive state produces a sandwich  a1 <= a3 <= ... <= a* <= ...
    <= a2 <= a0  that converges to the greedy fixpoint in O(suppression
    chain depth) sweeps (typically 3-8 for detection boxes; a 2-cycle
    cannot occur at a fixpoint because g's fixpoint is unique). Each
    sweep is ONE [N,N]-masked matrix reduction — XLA-friendly — versus
    nms_fixed's 1000 dependent argmax+scatter steps for the
    torchvision-shaped 1000->1000 proposal NMS (the hot path of
    reference src/train_transfer.py via torchvision RPN.filter_proposals).

    Exactness: the loop runs until a sweep changes nothing (early exit
    inside lax.while_loop), at which point alive IS the greedy set.
    If `max_sweeps` is hit first (adversarial chains), the current
    UPPER-bound sweep is returned: a superset of the greedy survivors
    ordered by score — for proposal generation the downstream top-k
    just sees a few extra candidates. Parity with nms_fixed asserted in
    tests/test_nms.py for random dense boxes.

    Returns (keep_idx [max_keep], keep_valid [max_keep]) like nms_fixed:
    survivors in descending-score order.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    live = scores if valid is None else jnp.where(valid, scores, _NEG)
    ok = live > _NEG / 2

    # Rank by score descending; "higher-ranked" = strictly greater
    # score, ties broken by index (argmax semantics of nms_fixed).
    order = jnp.argsort(-live, stable=True)
    rank = jnp.argsort(order, stable=True)                     # [N]
    higher = (rank[:, None] < rank[None, :])                   # j ranks above i
    sup = higher & (iou > iou_thresh)                          # j can kill i

    def sweep(alive):
        killed = jnp.any(sup & alive[:, None], axis=0)
        return ok & ~killed

    # Iterate in PAIRS and carry the even iterate: evens form a
    # decreasing chain of supersets of the greedy set (g is
    # order-reversing, so g(g(.)) is order-preserving), so on sweep
    # exhaustion the returned set errs toward extra candidates, never
    # dropped survivors.
    def cond(state):
        even, it, done = state
        return (~done) & (it < max_sweeps)

    def body(state):
        even, it, _ = state
        odd = sweep(even)
        nxt = sweep(odd)
        # odd == even => g fixpoint (exact greedy set);
        # nxt == even => even chain stabilized (2-cycle sandwich).
        done = jnp.all(odd == even) | jnp.all(nxt == even)
        return nxt, it + 2, done

    alive, _, _ = jax.lax.while_loop(
        cond, body, (ok, jnp.int32(0), jnp.bool_(False)))

    sel = jnp.where(alive, live, _NEG)
    kval, kidx = jax.lax.top_k(sel, max_keep)
    return kidx.astype(jnp.int32), kval > _NEG / 2
