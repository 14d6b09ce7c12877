"""Fused RoIAlign as a Pallas TPU kernel.

Why: the XLA einsum formulation (ops/roi_align.py) materializes the
row-interpolated intermediate t = einsum('kyh,hwc->kywc') in HBM —
[B=16, K=128, 14, W=76, C=256] bf16 is ~1.1 GB — and the xprof trace of
the fixed-mode train step shows those convolution fusions plus their
layout copies at ~13 ms of a 50 ms step, all HBM-bandwidth-bound
(~1.2-1.5 GB accessed per op). This kernel keeps the whole chain in
VMEM: the per-image feature slab (56x76x128 bf16 ~= 1.1 MB) is loaded
once per (image, channel-block) and every ROI block's two interpolation
contractions + 2x2 average pool run on-chip, writing only the pooled
[K, 7, 7, C] result. HBM traffic drops ~30x on this op.

Semantics are identical to ops/roi_align.roi_align (torchvision
RoIAlign, aligned=False, sampling_ratio taps; reference
custom_maskrcnn.py:48-50): the interpolation weight matrices come from
the same ops/interp.roi_sample_matrices, so the golden tests' semantics
are shared, with bf16 tap arithmetic (the model's "default" precision).

The custom VJP returns d_feat only — boxes are non-differentiable
through RoIAlign, as in torchvision (its CUDA backward produces
grad_input only), and the model detaches proposals anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ROI block: 8 ROIs' intermediates [8, n, W, Cb] stay well under VMEM.
_KB = 16
# Channel blocks. Forward: two lane tiles — halves the grid and doubles
# the N dim of the (MXU-starved, K=8) column-interpolation dot.
# Backward keeps one tile: its f32 [KB*n, W, Cb] intermediate overflows
# the 16 MB VMEM budget at 256.
_CB_FWD = 256
_CB_BWD = 128


def _axis_weights(lo, hi, size: int, n: int, out_size: int,
                  ratio: int, scale: float) -> jnp.ndarray:
    """Pooled bilinear sample weights, computed in-registers.

    Same math as ops/interp.roi_sample_matrices with the 2x2 sample
    average pre-folded (torchvision RoIAlign, aligned=False): building
    these [K, n, H]/[K, n, W] matrices in XLA cost ~2 ms/step (per-ROI
    elementwise chains over sub-128 minor dims); in-kernel they are a
    few iota passes per tile. lo/hi: [KB, 1, 1] box coords. Rows
    p >= out_size (even-padding) get zero weight."""
    kb = lo.shape[0]
    start = lo * scale
    bin_sz = jnp.maximum(hi * scale - start, 1.0) / out_size
    # Integer iota + cast: Mosaic has no float iota lowering.
    p = jax.lax.broadcasted_iota(jnp.int32, (kb, n, 1), 1) \
        .astype(jnp.float32)
    grid = jax.lax.broadcasted_iota(jnp.int32, (kb, n, size), 2) \
        .astype(jnp.float32)
    w = jnp.zeros((kb, n, size), jnp.float32)
    for s in range(ratio):
        c = start + (p + (s + 0.5) / ratio) * bin_sz        # [KB, n, 1]
        valid = (c >= -1.0) & (c <= float(size))
        cc = jnp.clip(c, 0.0, float(size - 1))
        w = w + jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid)) \
            * valid.astype(jnp.float32)
    w = w * (p < out_size).astype(jnp.float32) / ratio
    return w.astype(jnp.bfloat16)                           # [KB, n, size]


def _tile_weights(box_ref, h: int, w: int, n: int, out_size: int,
                  ratio: int, scale: float):
    b = box_ref[0].astype(jnp.float32)                # [KB, 4]
    kb = b.shape[0]
    x0, y0 = b[:, 0].reshape(kb, 1, 1), b[:, 1].reshape(kb, 1, 1)
    x1, y1 = b[:, 2].reshape(kb, 1, 1), b[:, 3].reshape(kb, 1, 1)
    wy = _axis_weights(y0, y1, h, n, out_size, ratio, scale)
    wx = _axis_weights(x0, x1, w, n, out_size, ratio, scale)
    return wy, wx


def _fwd_kernel(feat_ref, box_ref, out_ref, *, n: int, out_size: int,
                ratio: int, scale: float):
    f = feat_ref[0]                                   # [H, W, Cb] bf16
    h, w, cb = f.shape
    kb = box_ref.shape[1]
    wy, wx = _tile_weights(box_ref, h, w, n, out_size, ratio, scale)
    wy = wy.reshape(kb * n, h)                        # [Kb*n, H] bf16
    # Row interpolation on the MXU; f32 accumulation. The 2x2 sample
    # average is already folded into the weight matrices (the mean over
    # sample pairs of wy_p (x) wx_q factorizes into (mean wy) (x)
    # (mean wx)), so n here is out_size, not out_size*ratio.
    t = jax.lax.dot_general(
        wy, f.reshape(h, w * cb),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [Kb*n, W*Cb]
    t = t.reshape(kb * n, w, cb).astype(jnp.bfloat16)
    # Column interpolation batched over (k, p) so t is consumed in its
    # natural [(k p), x, c] layout — einsum('kqx,kpxc') would force a
    # [k, x, p*c] transpose of t inside the kernel, which dominates the
    # kernel's runtime.
    wxb = jnp.broadcast_to(wx[:, None], (kb, n, n, w)) \
        .reshape(kb * n, n, w)
    o = jax.lax.dot_general(
        wxb, t,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [Kb*n(p), n(q), Cb]
    out_ref[0] = o.reshape(kb, n, n, cb).astype(out_ref.dtype)


def _bwd_kernel(g_ref, box_ref, dfeat_ref, *, n: int, out_size: int,
                ratio: int, scale: float):
    kb_idx = pl.program_id(2)
    h = dfeat_ref.shape[1]
    w = dfeat_ref.shape[2]
    cb = dfeat_ref.shape[3]
    kb = box_ref.shape[1]
    wy, wx = _tile_weights(box_ref, h, w, n, out_size, ratio, scale)

    gp = g_ref[0].astype(jnp.bfloat16)                # [Kb, n, n, Cb]
    # The pooling average is folded into wy/wx (see _fwd_kernel), so g
    # back-propagates through the pooled weights directly.
    # u[k,p,x,c] = sum_q wx[k,q,x] * gp[k,p,q,c], batched over (k, p) so
    # gp is consumed in natural layout (same reasoning as the forward).
    wxb = jnp.broadcast_to(wx[:, None], (kb, n, n, w)) \
        .reshape(kb * n, n, w)
    u = jax.lax.dot_general(
        wxb, gp.reshape(kb * n, n, cb),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [Kb*n(p), W, Cb]
    u = u.astype(jnp.bfloat16)
    # dfeat[y,x,c] += sum_k sum_p wy[k,p,y] * u[k,p,x,c]
    wy = wy.reshape(kb * n, h)                        # [Kb*n, H]
    d = jax.lax.dot_general(
        wy, u.reshape(kb * n, w * cb),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [H, W*Cb]
    d = d.reshape(1, h, w, cb)

    @pl.when(kb_idx == 0)
    def _():
        dfeat_ref[...] = d

    @pl.when(kb_idx > 0)
    def _():
        dfeat_ref[...] += d


def _pad_k(x: jnp.ndarray, k: int, kp: int) -> jnp.ndarray:
    if kp == k:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, kp - k)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas(features: jnp.ndarray, boxes: jnp.ndarray,
                     out_size: int = 7, spatial_scale: float = 0.25,
                     sampling_ratio: int = 2,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched fused RoIAlign: [B,H,W,C], [B,K,4] -> [B,K,s,s,C]."""
    return _forward(features, boxes, out_size, spatial_scale,
                    sampling_ratio, interpret)


def _forward(features, boxes, out_size, spatial_scale, sampling_ratio,
             interpret=False):
    b, h, w, c = features.shape
    k = boxes.shape[1]
    kp = -(-k // _KB) * _KB
    cb = _CB_FWD if c % _CB_FWD == 0 else c
    n = out_size + out_size % 2      # Mosaic needs even sublane groups

    boxes_p = _pad_k(boxes.astype(jnp.float32), k, kp)    # [B, Kp, 4]
    feat = features.astype(jnp.bfloat16)

    grid = (b, c // cb, kp // _KB)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n=n, out_size=out_size,
                          ratio=sampling_ratio, scale=spatial_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda bi, ci, ki: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _KB, 4), lambda bi, ci, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _KB, n, n, cb),
            lambda bi, ci, ki: (bi, ki, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, kp, n, n, c), features.dtype),
        interpret=interpret,
    )(feat, boxes_p)
    return out[:, :k, :out_size, :out_size]


def _fwd_rule(features, boxes, out_size, spatial_scale, sampling_ratio,
              interpret=False):
    out = _forward(features, boxes, out_size, spatial_scale,
                   sampling_ratio, interpret)
    # `features` is saved only for its (static) shape/dtype; the array
    # is alive for the conv backward regardless.
    return out, (features, boxes)


def _bwd_rule(out_size, spatial_scale, sampling_ratio, interpret, res, g):
    (features, boxes) = res
    fdtype = features.dtype
    b, h, w, c = features.shape
    k = boxes.shape[1]
    kp = -(-k // _KB) * _KB
    cb = _CB_BWD if c % _CB_BWD == 0 else c

    n = out_size + out_size % 2
    boxes_p = _pad_k(boxes.astype(jnp.float32), k, kp)
    g = _pad_k(g, k, kp)
    if n != out_size:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, n - out_size),
                        (0, n - out_size), (0, 0)))

    grid = (b, c // cb, kp // _KB)
    dfeat = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n, out_size=out_size,
                          ratio=sampling_ratio, scale=spatial_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _KB, n, n, cb),
                         lambda bi, ci, ki: (bi, ki, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _KB, 4), lambda bi, ci, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cb), lambda bi, ci, ki: (bi, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
    )(g, boxes_p)
    return dfeat.astype(fdtype), jnp.zeros_like(boxes)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
