"""Fused RoIAlign as Pallas TPU kernels.

Why: the XLA einsum formulation (ops/roi_align.py) materializes the
row-interpolated intermediate t = einsum('kyh,hwc->kywc') in HBM —
[B=16, K=128, 14, W=76, C=256] bf16 is ~1.1 GB — and the xprof trace of
the fixed-mode train step showed those contractions plus their layout
copies at ~13 ms of a 50 ms step. The Pallas kernel keeps the whole
chain in VMEM: the per-image feature slab (56x76x256 bf16 ~= 2.2 MB) is
loaded once per (image, channel-block) and every ROI block's two
interpolation contractions run on-chip, writing only the pooled
[K, 7, 7, C] result.

Structure (r3): THREE kernels instead of one. An r3 on-chip micro-bench
(scripts/bench_roi_blocks.py + piece probes) showed the per-program
bilinear-weight computation — a few iota/select passes over
[KB, n, H]/[KB, n, W] — costing ~8 us/program, i.e. ~1 ms of the
2.9 ms forward at its 128-program grid and ~2 ms of the backward at its
256-program grid, dwarfing the GEMMs. So:

  1. `_weights_kernel` computes the pooled bilinear weights for all
     (image, ROI) pairs once — a ~0.1 ms elementwise kernel.
  2. `_fwd_kernel` consumes the weight tensors and runs the two
     interpolation GEMMs per (image, channel, ROI-block) program.
  3. `_bwd_kernel` reuses the SAME weight tensors via the custom-VJP
     residuals (they are a function of boxes only), transposing the
     two contractions.

Semantics are identical to ops/roi_align.roi_align (torchvision
RoIAlign, aligned=False, sampling_ratio taps; reference
custom_maskrcnn.py:48-50): the weight formula matches
ops/interp.roi_sample_matrices with the 2x2 sample average pre-folded,
with bf16 tap arithmetic (the model's "default" precision).

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


# Block sizes from the r3 on-chip sweep (scripts/bench_roi_blocks.py).
# VMEM bounds the f32 GEMM intermediate [KB*n, W, CB]; the 16 MB
# default scoped-VMEM limit is raised per-call below (v5e has 128 MB).
_KB = 64          # forward ROI block
_CB_FWD = 256
_KB_BWD = 128     # backward ROI block (r3 sweep: fwdbwd 2.94 vs 3.08 ms
                  # at kb_bwd=32; fewer dfeat accumulation programs)
_CB_BWD = 256
_KW = 128         # weights-kernel ROI block
_VMEM_LIMIT = 100 * 1024 * 1024


def _axis_weights(lo, hi, size: int, n: int, out_size: int,
                  ratio: int, scale: float) -> jnp.ndarray:
    """Pooled bilinear sample weights.

    Same math as ops/interp.roi_sample_matrices with the 2x2 sample
    average pre-folded (torchvision RoIAlign, aligned=False): the mean
    over sample pairs of wy_p (x) wx_q factorizes into (mean wy) (x)
    (mean wx), so n here is out_size (padded even), not
    out_size*ratio. lo/hi: [KB, 1, 1] box coords. Rows p >= out_size
    (even-padding) get zero weight."""
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


def _weights_kernel(box_ref, wy_ref, wx_ref, *, n: int, out_size: int,
                    ratio: int, scale: float):
    b = box_ref[0].astype(jnp.float32)                # [KW, 4]
    kw = b.shape[0]
    h, w = wy_ref.shape[-1], wx_ref.shape[-1]
    x0, y0 = b[:, 0].reshape(kw, 1, 1), b[:, 1].reshape(kw, 1, 1)
    x1, y1 = b[:, 2].reshape(kw, 1, 1), b[:, 3].reshape(kw, 1, 1)
    wy_ref[0] = _axis_weights(y0, y1, h, n, out_size, ratio, scale)
    wx_ref[0] = _axis_weights(x0, x1, w, n, out_size, ratio, scale)


def roi_weights(boxes_p: jnp.ndarray, h: int, w: int, n: int,
                out_size: int, ratio: int, scale: float,
                interpret: bool = False):
    """All pooled bilinear weights: [B, Kp, 4] -> ([B, Kp, n, H],
    [B, Kp, n, W]) bf16. Kp must be a multiple of 8."""
    b, kp = boxes_p.shape[:2]
    kw = min(_KW, kp)
    return pl.pallas_call(
        functools.partial(_weights_kernel, n=n, out_size=out_size,
                          ratio=ratio, scale=scale),
        grid=(b, kp // kw),
        in_specs=[pl.BlockSpec((1, kw, 4), lambda bi, ki: (bi, ki, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, kw, n, h), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kw, n, w), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, kp, n, h), jnp.bfloat16),
                   jax.ShapeDtypeStruct((b, kp, n, w), jnp.bfloat16)],
        interpret=interpret,
    )(boxes_p)


def _fwd_kernel(feat_ref, wy_ref, wx_ref, out_ref):
    f = feat_ref[0]                                   # [H, W, Cb] bf16
    h, w, cb = f.shape
    kb, n = wy_ref.shape[1], wy_ref.shape[2]
    wy = wy_ref[0].reshape(kb * n, h)                 # [Kb*n, H] bf16
    # Row interpolation on the MXU; f32 accumulation (Mosaic requires a
    # 32-bit matmul accumulator — bf16 preferred_element_type fails
    # verification), downcast once for the second contraction.
    t = jax.lax.dot_general(
        wy, f.reshape(h, w * cb),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [Kb*n, W*Cb]
    t = t.reshape(kb * n, w, cb).astype(jnp.bfloat16)
    # Column interpolation batched over (k, p) so t is consumed in its
    # natural [(k p), x, c] layout — einsum('kqx,kpxc') would force a
    # [k, x, p*c] transpose of t inside the kernel, which dominates the
    # kernel's runtime.
    wxb = jnp.broadcast_to(wx_ref[0].reshape(kb, 1, n, w),
                           (kb, n, n, w)).reshape(kb * n, n, w)
    o = jax.lax.dot_general(
        wxb, t,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [Kb*n(p), n(q), Cb]
    out_ref[0] = o.reshape(kb, n, n, cb).astype(out_ref.dtype)


def _bwd_kernel(g_ref, wy_ref, wx_ref, dfeat_ref):
    kb_idx = pl.program_id(2)
    h = dfeat_ref.shape[1]
    w = dfeat_ref.shape[2]
    cb = dfeat_ref.shape[3]
    kb, n = wy_ref.shape[1], wy_ref.shape[2]

    gp = g_ref[0].astype(jnp.bfloat16)                # [Kb, n, n, Cb]
    # The pooling average is folded into wy/wx, so g back-propagates
    # through the pooled weights directly.
    # u[k,p,x,c] = sum_q wx[k,q,x] * gp[k,p,q,c], batched over (k, p) so
    # gp is consumed in natural layout (same reasoning as the forward).
    wxb = jnp.broadcast_to(wx_ref[0].reshape(kb, 1, n, w),
                           (kb, n, n, w)).reshape(kb * n, n, w)
    u = jax.lax.dot_general(
        wxb, gp.reshape(kb * n, n, cb),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [Kb*n(p), W, Cb]
    u = u.astype(jnp.bfloat16)
    # dfeat[y,x,c] += sum_k sum_p wy[k,p,y] * u[k,p,x,c]
    wy = wy_ref[0].reshape(kb * n, h)                 # [Kb*n, H]
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def roi_align_pallas(features: jnp.ndarray, boxes: jnp.ndarray,
                     out_size: int = 7, spatial_scale: float = 0.25,
                     sampling_ratio: int = 2,
                     interpret: bool = False,
                     kb: int = _KB, cb_fwd: int = _CB_FWD) -> jnp.ndarray:
    """Batched fused RoIAlign: [B,H,W,C], [B,K,4] -> [B,K,s,s,C]."""
    out, _, _ = _forward(features, boxes, out_size, spatial_scale,
                         sampling_ratio, interpret, kb, cb_fwd)
    return out


def _channel_block(c: int, preferred: int) -> int:
    """Largest lane-aligned divisor of c at most `preferred`, falling
    back to c itself when no multiple of 128 divides it (e.g. c=96).
    Guards against the r3 behavior where any c not divisible by the
    preferred block silently became a full-width block (c=384 would
    blow the VMEM budget instead of using cb=128; ADVICE r3)."""
    for cand in (preferred, 256, 128):
        if cand <= c and c % cand == 0:
            return cand
    return c


def _forward(features, boxes, out_size, spatial_scale, sampling_ratio,
             interpret=False, kb_block=_KB, cb_fwd=_CB_FWD):
    b, h, w, c = features.shape
    k = boxes.shape[1]
    n_pad = out_size + out_size % 2
    cb = _channel_block(c, cb_fwd)
    # The f32 GEMM intermediate [KB*n, W*CB] dominates VMEM; shrink the
    # ROI block for wide feature maps (e.g. the transfer path's 272-wide
    # P2 level, where KB=64 would need a 142 MB intermediate). Uses the
    # actual channel block, not min(cb_fwd, c) (ADVICE r3).
    while (kb_block > 8 and
           kb_block * n_pad * w * cb * 4 > 40 * 1024 * 1024):
        kb_block //= 2
    kb_block = min(kb_block, -(-k // 8) * 8)
    kp = -(-k // kb_block) * kb_block
    n = out_size + out_size % 2      # Mosaic needs even sublane groups

    boxes_p = _pad_k(boxes.astype(jnp.float32), k, kp)    # [B, Kp, 4]
    wy, wx = roi_weights(boxes_p, h, w, n, out_size, sampling_ratio,
                         spatial_scale, interpret)
    feat = features.astype(jnp.bfloat16)

    grid = (b, c // cb, kp // kb_block)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda bi, ci, ki: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb_block, n, h),
                         lambda bi, ci, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb_block, n, w),
                         lambda bi, ci, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, kb_block, n, n, cb),
            lambda bi, ci, ki: (bi, ki, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, kp, n, n, c), features.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(feat, wy, wx)
    return out[:, :k, :out_size, :out_size], wy, wx


def _fwd_rule(features, boxes, out_size, spatial_scale, sampling_ratio,
              interpret=False, kb=_KB, cb_fwd=_CB_FWD):
    out, wy, wx = _forward(features, boxes, out_size, spatial_scale,
                           sampling_ratio, interpret, kb, cb_fwd)
    # The weight tensors (a function of boxes only) are the residuals —
    # the backward reuses them instead of recomputing per program,
    # which was ~2 ms of the old backward's 2.4 ms. `features` is saved
    # only for its (static) shape/dtype.
    return out, (features, wy, wx)


def _bwd_rule(out_size, spatial_scale, sampling_ratio, interpret, kb,
              cb_fwd, res, g):
    (features, wy, wx) = res
    fdtype = features.dtype
    b, h, w, c = features.shape
    kp = wy.shape[1]
    k = g.shape[1]
    n_pad = out_size + out_size % 2
    # Budget the resident f32 buffers for wide maps: the dfeat block
    # [H, W, CB] halves its channel block when large, and the GEMM
    # intermediate [KB*n, W, CB] shrinks the ROI block (transfer P2 is
    # 200x272 — the custom-path defaults would need >280 MB).
    cb = _channel_block(c, _CB_BWD)
    if h * w * cb * 4 > 32 * 1024 * 1024 and c % 128 == 0:
        cb = 128
    # Largest power-of-two ROI block (dividing Kp) whose resident
    # buffers — f32 GEMM intermediate + f32 dfeat block + bf16 g
    # block — fit the scoped-VMEM budget. The custom path (56x76x256)
    # keeps the swept kb=128; the transfer P2 level (200x272) drops
    # to 32. If even kb=8 does not fit (huge map with an indivisible
    # channel count), fail loudly with the XLA fallback named instead
    # of letting Mosaic die on a VMEM overflow (ADVICE r3).
    kb_block = None
    dfeat_bytes = h * w * cb * 4
    for cand in (128, 64, 32, 16, 8):
        resident = (cand * n_pad * w * cb * 4 + dfeat_bytes +
                    cand * n_pad * n_pad * cb * 2)
        if (cand <= kp and kp % cand == 0 and
                resident <= 90 * 1024 * 1024):
            kb_block = cand
            break
    if kb_block is None:
        raise ValueError(
            f"pallas roi_align backward: no ROI block fits the VMEM "
            f"budget for feature map {h}x{w}x{c} (channel block {cb}); "
            f"use roi_backend='einsum' for this shape")

    n = out_size + out_size % 2
    g = _pad_k(g, k, kp)
    if n != out_size:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, n - out_size),
                        (0, n - out_size), (0, 0)))

    grid = (b, c // cb, kp // kb_block)
    dfeat = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kb_block, n, n, cb),
                         lambda bi, ci, ki: (bi, ki, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb_block, n, h),
                         lambda bi, ci, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb_block, n, w),
                         lambda bi, ci, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cb), lambda bi, ci, ki: (bi, 0, 0, ci),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(g, wy, wx)
    return dfeat.astype(fdtype), jnp.zeros((b, k, 4), jnp.float32)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
