"""Greedy NMS as a single Pallas TPU kernel.

The jnp fallback (ops/nms.py) runs max_keep XLA while-loop iterations,
each a separate fused launch over HBM-resident vectors. This kernel
keeps everything — scores, the candidate boxes (transposed [4, N] so the
lane dimension is the box axis), and the live mask — in VMEM and runs
the whole greedy loop inside one kernel invocation: per pick, one VPU
argmax over N lanes, a 4-scalar box load, one vectorized IoU row, and a
masked suppression update. No [N, N] IoU matrix is materialized.

Semantics match ops/nms.py exactly (greedy by score, suppress IoU
strictly greater than the threshold).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(boxes_ref, scores_ref, out_idx_ref, out_val_ref, live_ref,
                *, max_keep: int, iou_thresh: float, n: int):
    """All updates are full-row vector ops (Mosaic forbids scalar VMEM
    stores); the pick's box coordinates come out via one-hot reductions
    and results land in the output rows via one-hot selects."""
    live_ref[:] = scores_ref[:]
    out_idx_ref[:] = jnp.zeros_like(out_idx_ref)
    out_val_ref[:] = jnp.zeros_like(out_val_ref)
    n_pad = live_ref.shape[1]
    k_pad = out_idx_ref.shape[1]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    bx1 = boxes_ref[0:1, :]
    by1 = boxes_ref[1:2, :]
    bx2 = boxes_ref[2:3, :]
    by2 = boxes_ref[3:4, :]

    def body(k, _):
        live = live_ref[:]
        m = jnp.max(live)
        pick = jnp.argmax(live.reshape(-1)).astype(jnp.int32)
        ok = m > _NEG / 2

        onehot = (lane_idx == pick).astype(jnp.float32)
        x1 = jnp.sum(bx1 * onehot)
        y1 = jnp.sum(by1 * onehot)
        x2 = jnp.sum(bx2 * onehot)
        y2 = jnp.sum(by2 * onehot)
        area_p = (x2 - x1) * (y2 - y1)

        ix = jnp.maximum(0.0, jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1))
        iy = jnp.maximum(0.0, jnp.minimum(y2, by2) - jnp.maximum(y1, by1))
        inter = ix * iy
        area = (bx2 - bx1) * (by2 - by1)
        union = area + area_p - inter
        iou = jnp.where(union > 0, inter / union, 0.0)

        suppress = (iou > iou_thresh) | (lane_idx == pick)
        live_ref[:] = jnp.where(ok & suppress, _NEG, live)

        kvec = slot_idx == k
        out_idx_ref[:] = jnp.where(kvec, pick, out_idx_ref[:])
        out_val_ref[:] = jnp.where(kvec & ok, 1, out_val_ref[:])
        return 0

    jax.lax.fori_loop(0, max_keep, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("iou_thresh", "max_keep", "interpret"))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               max_keep: int, valid: jnp.ndarray | None = None,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.nms.nms_fixed on TPU."""
    n = boxes.shape[0]
    n_pad = _round_up(n, _LANE)
    k_pad = _round_up(max_keep, _LANE)

    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid, live, _NEG)
    live = jnp.pad(live, (0, n_pad - n), constant_values=_NEG)

    boxes_t = jnp.pad(boxes.astype(jnp.float32).T,
                      ((0, 4), (0, n_pad - n)))  # [8, n_pad] sublane-pad

    kernel = functools.partial(_nms_kernel, max_keep=max_keep,
                               iou_thresh=iou_thresh, n=n)
    out_idx, out_val = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, k_pad), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(boxes_t, live.reshape(1, n_pad))

    return out_idx[0, :max_keep], out_val[0, :max_keep].astype(bool)


def nms_auto(boxes, scores, iou_thresh, max_keep, valid=None):
    """Pallas kernel on TPU, jnp fallback elsewhere."""
    from livecell_tpu.ops.nms import nms_fixed

    platform = jax.devices()[0].platform if jax.devices() else "cpu"
    if platform not in ("tpu", "axon"):
        return nms_fixed(boxes, scores, iou_thresh, max_keep, valid)
    return nms_pallas(boxes, scores, iou_thresh, max_keep, valid)
