"""Fused anchor-GT IoU matcher as a Pallas TPU kernel.

Why: the RPN losses need, per image, the per-anchor max IoU against the
GT boxes, the encoded regression targets of the matched GT box, and
each GT's best anchor (torchvision allow_low_quality_matches). The XLA
formulation materializes the [B, N, I] IoU matrix in HBM (N=38k
anchors, I=128 instance slots at bs=16 -> ~300 MB/step), runs two
argmax passes over it, resolves matched boxes with a [B*N, 4] row
gather that ran at ~7 GB/s effective (3.9 ms of a 29 ms step on the r3
xprof trace), and then encodes targets with a ~20-op elementwise chain
over [B, N, 4] arrays whose minor dim of 4 uses 4/128 VPU lanes
(another ~4 ms).

This kernel streams anchor tiles through VMEM with GT slots on
sublanes and anchors on lanes, so the IoU tile [Ip, TN] reduces to
per-anchor rows [1, TN] that keep every coordinate chain lane-wide:
the matched GT coords come from a one-hot [Ip,TN]x[Ip,8] contraction
on the MXU (no gather), the box-delta encode runs on [1, TN] rows
in-registers, and the per-GT best anchor accumulates across tiles in
VMEM scratch. The IoU matrix and the matched boxes never touch HBM.

Semantics match the XLA path (same first-index tie-breaks as
jnp.argmax; invalid GT masked to IoU -1; reference encode formulas
with the 1.0 size clamps, reference box_utils.py:4-28), asserted by
tests/test_pallas_match.py against ops.boxes.

Replaces the hot matching loop of the reference training step
(reference src/rpn.py:72-85 `box_iou(anchors, gt)` + argmax matching,
src/custom_maskrcnn.py:96-111).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from livecell_tpu.ops.boxes import box_iou, encode_boxes


def _kernel(an_ref, gt_ref, mx_ref, *rest, tn: int, full: bool):
    if full:
        tgt_ref, bi_ref, bv_s, bi_s = rest
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    a = an_ref[:]                                     # [8, TN] f32
    g = gt_ref[0]                                     # [Ip, 8] f32
    ip = g.shape[0]

    ax0, ay0, ax1, ay1 = a[0:1], a[1:2], a[2:3], a[3:4]      # [1, TN]
    gx0, gy0, gx1, gy1 = g[:, 0:1], g[:, 1:2], g[:, 2:3], g[:, 3:4]
    valid = g[:, 4:5]                                        # [Ip, 1]

    iw = jnp.clip(jnp.minimum(ax1, gx1) - jnp.maximum(ax0, gx0), 0.0)
    ih = jnp.clip(jnp.minimum(ay1, gy1) - jnp.maximum(ay0, gy0), 0.0)
    inter = iw * ih                                          # [Ip, TN]
    area_a = (ax1 - ax0) * (ay1 - ay0)                       # [1, TN]
    area_g = (gx1 - gx0) * (gy1 - gy0)                       # [Ip, 1]
    union = area_a + area_g - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    iou = jnp.where(valid > 0, iou, -1.0)                    # [Ip, TN]

    best = iou.max(axis=0, keepdims=True)                    # [1, TN]
    mx_ref[0, 0:1] = best

    if not full:
        return

    # Matched GT coords per anchor: first index attaining the max
    # (jnp.argmax tie-break), resolved as a one-hot contraction on the
    # MXU — no gather. Result [8, TN]: coords as lane-wide rows.
    sub = jax.lax.broadcasted_iota(jnp.int32, (ip, tn), 0)
    at_max = iou == best
    idx = jnp.where(at_max, sub, ip).min(axis=0, keepdims=True)
    onehot = (at_max & (sub == idx)).astype(jnp.float32)
    mg = jax.lax.dot_general(
        g, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [8, TN]

    # Box-delta encode on lane-wide rows (reference box_utils.py:4-28,
    # min-size 1.0 clamps) — the same formulas as ops.boxes.encode_boxes.
    aw = jnp.clip(ax1 - ax0, 1.0)
    ah = jnp.clip(ay1 - ay0, 1.0)
    acx = (ax0 + ax1) * 0.5
    acy = (ay0 + ay1) * 0.5
    bw = jnp.clip(mg[2:3] - mg[0:1], 1.0)
    bh = jnp.clip(mg[3:4] - mg[1:2], 1.0)
    bcx = (mg[0:1] + mg[2:3]) * 0.5
    bcy = (mg[1:2] + mg[3:4]) * 0.5
    tgt_ref[0] = jnp.concatenate([
        (bcx - acx) / aw, (bcy - acy) / ah,
        jnp.log(bw / aw), jnp.log(bh / ah)], axis=0)         # [4, TN]

    # Per-GT best anchor, accumulated across anchor tiles in VMEM
    # scratch (strict > keeps the first tile among ties; in-tile
    # min-index keeps the first anchor: jnp.argmax order).
    lane = jax.lax.broadcasted_iota(jnp.int32, (ip, tn), 1)
    bv = iou.max(axis=1, keepdims=True)                      # [Ip, 1]
    bi = jnp.where(iou == bv, lane, tn).min(
        axis=1, keepdims=True) + t * tn                      # [Ip, 1]

    @pl.when(t == 0)
    def _():
        bv_s[:, 0:1] = jnp.full((ip, 1), -2.0, jnp.float32)
        bi_s[:, 0:1] = jnp.zeros((ip, 1), jnp.int32)

    upd = bv > bv_s[:, 0:1]
    bv_s[:, 0:1] = jnp.where(upd, bv, bv_s[:, 0:1])
    bi_s[:, 0:1] = jnp.where(upd, bi, bi_s[:, 0:1])

    @pl.when(t == nt - 1)
    def _():
        bi_ref[0] = bi_s[:]


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    p = -n % mult
    if p == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, p)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("full", "interpret"))
def match_anchors_pallas(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                         gt_valid: jnp.ndarray, full: bool = True,
                         interpret: bool = False):
    """Batched anchor-GT matching without materializing the IoU matrix.

    anchors [N,4] f32, gt_boxes [B,I,4] f32, gt_valid [B,I] bool ->
      max_iou     [B, N] f32  (invalid GT masked to -1)
      reg_targets [B, 4, N] f32 = encode(gt_boxes[argmax], anchors),
                  PLANAR coord rows (full=True)
      best_anchor [B, I] i32 = argmax over anchors  (full=True)
    """
    n = anchors.shape[0]
    b, i = gt_boxes.shape[:2]

    # Anchor-tile width: as wide as the [Ip, TN] f32 intermediates
    # allow (~6 live per program) — the kernel is grid-overhead bound
    # (r3: tn=512 -> 1200 programs -> 1.17 ms/step; tn=2048 -> 304
    # programs -> ~0.4 ms/step at bs=16, I=128).
    ip_est = -(-max(i, 1) // 8) * 8
    tn = max(512, min(4096, (1 << 22) // ip_est))
    an = _pad_to(anchors.astype(jnp.float32), 0, tn)
    np_, t = an.shape[0], an.shape[0] // tn
    # Anchor coords as lane-wide rows [8, Np] (rows 4..7 zero).
    an_p = jnp.concatenate([an.T, jnp.zeros((4, np_), jnp.float32)], 0)
    # GT rows [B, Ip, 8]: x0 y0 x1 y1 valid 0 0 0.
    gt_p = jnp.concatenate([
        gt_boxes.astype(jnp.float32),
        gt_valid.astype(jnp.float32)[..., None],
        jnp.zeros((b, i, 3), jnp.float32)], axis=-1)
    gt_p = _pad_to(gt_p, 1, 8)
    ip = gt_p.shape[1]

    out_shapes = [jax.ShapeDtypeStruct((b, 8, np_), jnp.float32),
                  jax.ShapeDtypeStruct((b, 4, np_), jnp.float32),
                  jax.ShapeDtypeStruct((b, ip, 8), jnp.int32)]
    out_specs = [
        pl.BlockSpec((1, 8, tn), lambda bi_, ti: (bi_, 0, ti),
                     memory_space=pltpu.VMEM),
        # Targets PLANAR [B, 4, N] — coords as lane-wide rows, the
        # kernel's native orientation. Any [N, 4]-shaped HBM tensor
        # pads its 4-lane minor dim to 128 on TPU; the [N, 4] variants
        # of this output cost 1.4-2.3 ms/step in relayout copies on the
        # r3e/r3f traces. The reg loss consumes [4, N] directly.
        pl.BlockSpec((1, 4, tn), lambda bi_, ti: (bi_, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ip, 8), lambda bi_, ti: (bi_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((ip, 8), jnp.float32),
               pltpu.VMEM((ip, 8), jnp.int32)]
    if not full:
        out_shapes, out_specs, scratch = out_shapes[:1], out_specs[:1], []

    outs = pl.pallas_call(
        functools.partial(_kernel, tn=tn, full=full),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((8, tn), lambda bi_, ti: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip, 8), lambda bi_, ti: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if full else out_specs[0],
        out_shape=out_shapes if full else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(an_p, gt_p)

    if not full:
        return outs[:, 0, :n]
    mx, tgt, bi_t = outs
    best = jnp.minimum(bi_t[:, :i, 0], n - 1)  # pad-lane safety only
    return mx[:, 0, :n], tgt[:, :, :n], best


def match_anchors_xla(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_valid: jnp.ndarray, full: bool = True):
    """Reference XLA implementation of match_anchors_pallas (same
    outputs). The matched box is resolved with a one-hot einsum rather
    than `gt_boxes[argmax]` — a dynamic row gather is the single
    slowest op on the TPU trace while the einsum rides the MXU."""

    def per_image(gt, v):
        ious = jnp.where(v[None, :], box_iou(anchors, gt), -1.0)  # [N, I]
        max_iou = ious.max(axis=1)
        if not full:
            return max_iou, None, None
        matched = ious.argmax(axis=1)
        onehot = jax.nn.one_hot(matched, gt.shape[0], dtype=gt.dtype)
        matched_box = onehot @ gt
        # Targets PLANAR [4, N], matching the pallas kernel's output
        # orientation (see match_anchors_pallas docstring).
        return (max_iou, encode_boxes(matched_box, anchors).T,
                ious.argmax(axis=0))

    out = jax.vmap(per_image)(gt_boxes, gt_valid)
    return out[0] if not full else out
