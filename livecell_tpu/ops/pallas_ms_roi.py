"""Fused multiscale (FPN) RoIAlign as Pallas TPU kernels.

The XLA formulation (ops/roi_align.py:multiscale_roi_align) gathers
4 corner pixels per bilinear tap from a flattened pyramid — for the
transfer model's training step that is ~1.6M scattered row-gathers per
image forward and the matching scatter-adds backward, the dominant
non-conv cost of the 800x1088 torchvision-parity path (reference
src/train_transfer.py; torchvision MultiScaleRoIAlign).

The TPU-native reformulation exploits a LevelMapper invariant: level
k = floor(4 + log2(sqrt(area)/224)) clamped to [2,5] bounds every
ROI's extent ON ITS ASSIGNED LEVEL:

  unclamped levels: extent = sqrt(area)/stride in [14, 28) pixels
  P2 clamp:         sqrt(area) < 112  => extent < 28
  P5 clamp:         extent = sqrt(area)/32 <= sqrt(Himg*Wimg)/32

so a STATIC window of `win = ceil(sqrt(Himg*Wimg)/32 + 3)` (rounded up
to a multiple of 8; 40 for the 800x1086 canvas) covers every tap of
any clipped ROI. Each ROI then becomes dense MXU work:

  1. XLA prep (vectorized, cheap): per-ROI level, window origin, and
     POOLED bilinear weights on the window — Wy/Wx [B, K, n, win]
     (the 2x2 sample average prefolded exactly like
     ops/pallas_roi_align._axis_weights).
  2. Forward kernel: per ROI, `lax.switch` on the level picks one
     dynamic-slice [win, win, C] patch from the VMEM-resident level
     map, then two small GEMMs interpolate: out = Wy @ patch @ Wx^T.
     Level/origin scalars ride the scalar-prefetch channel (SMEM).
  3. Backward kernel: transposed GEMMs produce the patch gradient,
     accumulated into per-level f32 dfeat refs with dynamic-slice
     read-modify-write (the grid's ROI axis is sequential).

Semantics match multiscale_roi_align (torchvision RoIAlign
aligned=False on the LevelMapper level; reference train_transfer.py
via torchvision MultiScaleRoIAlign), asserted in
tests/test_pallas_ms_roi.py. Level maps are padded to >= win per axis
so window slices never clamp.

The custom VJP differentiates features only (torchvision's CUDA
backward produces grad_input only; proposals are detached anyway).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KB = 16          # ROIs per program
_VMEM_LIMIT = 110 * 1024 * 1024


def window_size(img_h: int, img_w: int) -> int:
    """Static tap-window size for a canvas: the P5-clamped worst-case
    extent + bilinear spill, rounded up to a multiple of 8."""
    # Unclamped and P2-clamped levels bound the extent by 28; the
    # P5 clamp bounds it by sqrt(H*W)/32 (largest possible box).
    ext = max(28.0, math.sqrt(img_h * img_w) / 32.0)
    return int(math.ceil((ext + 3) / 8)) * 8


def ms_roi_prep(boxes: jnp.ndarray, level_hw: Sequence[Tuple[int, int]],
                out_size: int, sampling_ratio: int, win: int,
                canonical_size: float = 224.0, canonical_level: int = 4):
    """XLA-side preparation: per-ROI level, window origins, pooled
    window weights.

    boxes [B, K, 4] (image coords). Returns (lvl [B,K] i32,
    y0/x0 [B,K] i32, Wy/Wx [B,K,n,win] bf16) with n = out_size padded
    even."""
    b = boxes.astype(jnp.float32)
    area = jnp.clip((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]),
                    1e-12)
    lvl = jnp.floor(canonical_level +
                    jnp.log2(jnp.sqrt(area) / canonical_size + 1e-6))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2            # [B,K] 0..3
    scale = 0.25 / jnp.exp2(lvl.astype(jnp.float32))

    hs = jnp.asarray([h for h, _ in level_hw], jnp.int32)[lvl]
    ws = jnp.asarray([w for _, w in level_hw], jnp.int32)[lvl]

    def axis(lo, hi, size_arr):
        start = lo * scale
        bin_sz = jnp.maximum(hi * scale - start, 1.0) / out_size
        m = out_size * sampling_ratio
        j = jnp.arange(m, dtype=jnp.float32)
        pos = jnp.floor(j / sampling_ratio)
        frac = (j % sampling_ratio + 0.5) / sampling_ratio
        c = start[..., None] + (pos + frac)[None, None, :] * \
            bin_sz[..., None]                                  # [B,K,m]
        sz = size_arr.astype(jnp.float32)[..., None]
        valid = (c >= -1.0) & (c <= sz)
        cc = jnp.clip(c, 0.0, sz - 1.0)
        i0 = jnp.floor(cc).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size_arr[..., None] - 1)
        fr = cc - i0.astype(cc.dtype)
        w1 = fr * valid
        w0 = (1.0 - fr) * valid
        origin = jnp.clip(i0.min(axis=-1), 0,
                          jnp.maximum(size_arr - win, 0))      # [B,K]
        u = jnp.arange(win, dtype=jnp.int32)
        oh0 = (i0 - origin[..., None])[..., None] == u
        oh1 = (i1 - origin[..., None])[..., None] == u
        w = w0[..., None] * oh0 + w1[..., None] * oh1          # [B,K,m,win]
        bsz, k = lo.shape
        w = w.reshape(bsz, k, out_size, sampling_ratio, win) \
             .sum(axis=3) / sampling_ratio
        if out_size % 2:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 0)))
        return origin, w.astype(jnp.bfloat16)

    y0, wy = axis(b[..., 1], b[..., 3], hs)
    x0, wx = axis(b[..., 0], b[..., 2], ws)
    return lvl, y0, x0, wy, wx


def _fwd_kernel(meta_ref, wy_ref, wx_ref, p2_ref, p3_ref, p4_ref, p5_ref,
                out_ref, *, win: int, kb: int, cdt=jnp.bfloat16):
    refs = (p2_ref, p3_ref, p4_ref, p5_ref)
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    n = wy_ref.shape[2]
    c = out_ref.shape[-1]
    kp = meta_ref.shape[1]

    def body(k, _):
        lvl = meta_ref[bi, ki * kb + k, 0]
        y0 = meta_ref[bi, ki * kb + k, 1]
        x0 = meta_ref[bi, ki * kb + k, 2]
        wy = wy_ref[0, pl.ds(k, 1)].reshape(n, win)     # bf16
        wx = wx_ref[0, pl.ds(k, 1)].reshape(n, win)

        def load(i):
            def f():
                return refs[i][0, pl.ds(y0, win), pl.ds(x0, win), :]
            return f

        patch = jax.lax.switch(lvl, [load(i) for i in range(4)])
        t = jax.lax.dot_general(
            wy, patch.reshape(win, win * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n(p), win*C]
        t = t.reshape(n, win, c).astype(cdt)
        # o[q, p, c] = sum_v wx[q, v] * t[p, v, c]
        o = jax.lax.dot_general(
            wx, t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n(q), n(p), C]
        out_ref[0, pl.ds(k, 1)] = \
            o.transpose(1, 0, 2).astype(out_ref.dtype)[None]
        return ()

    jax.lax.fori_loop(0, kb, body, ())


def _bwd_kernel(meta_ref, wy_ref, wx_ref, g_ref,
                d2_ref, d3_ref, d4_ref, d5_ref, *, win: int, kb: int,
                cdt=jnp.bfloat16):
    drefs = (d2_ref, d3_ref, d4_ref, d5_ref)
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    n = wy_ref.shape[2]

    @pl.when(ki == 0)
    def _():
        for d in drefs:
            d[...] = jnp.zeros_like(d)

    def body(k, _):
        lvl = meta_ref[bi, ki * kb + k, 0]
        y0 = meta_ref[bi, ki * kb + k, 1]
        x0 = meta_ref[bi, ki * kb + k, 2]
        wy = wy_ref[0, pl.ds(k, 1)].reshape(n, win)
        wx = wx_ref[0, pl.ds(k, 1)].reshape(n, win)
        g = g_ref[0, pl.ds(k, 1)][0].astype(cdt)
        c = g.shape[-1]

        # t2[v, p, c] = sum_q wx[q, v] * g[p, q, c]
        t2 = jax.lax.dot_general(
            wx, g,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [win(v), n(p), C]
        t2 = t2.astype(cdt)
        # dp[u, v, c] = sum_p wy[p, u] * t2[v, p, c]
        dp = jax.lax.dot_general(
            wy, t2,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [win(u), win(v), C]

        def upd(i):
            def f():
                cur = drefs[i][0, pl.ds(y0, win), pl.ds(x0, win), :]
                drefs[i][0, pl.ds(y0, win), pl.ds(x0, win), :] = cur + dp
                return ()
            return f

        jax.lax.switch(lvl, [upd(i) for i in range(4)])
        return ()

    jax.lax.fori_loop(0, kb, body, ())


def _pad_levels(feats, win):
    """Pad each [B, H, W, C] level so H, W >= win (window slices never
    clamp) and to multiples of 8 for clean sublane tiling."""
    out = []
    for f in feats:
        b, h, w, c = f.shape
        ph = max(win, -(-h // 8) * 8) - h
        pw = max(win, -(-w // 8) * 8) - w
        out.append(jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
                   if (ph or pw) else f)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ms_roi_align_pallas(feats: Tuple[jnp.ndarray, ...],
                        boxes: jnp.ndarray,
                        out_size: int = 7,
                        sampling_ratio: int = 2,
                        interpret: bool = False) -> jnp.ndarray:
    """Batched fused MultiScaleRoIAlign.

    feats: 4 level maps [B, H_l, W_l, C] (P2-P5, strides 4/8/16/32),
    boxes [B, K, 4] in image coordinates (the stride-4 image is
    4*H_2 x 4*W_2). Returns [B, K, out_size, out_size, C] in
    feats[0].dtype.
    """
    out, _ = _forward(feats, boxes, out_size, sampling_ratio, interpret)
    return out


def _forward(feats, boxes, out_size, sampling_ratio, interpret):
    b, _, _, c = feats[0].shape
    k = boxes.shape[1]
    img_h, img_w = feats[0].shape[1] * 4, feats[0].shape[2] * 4
    win = window_size(img_h, img_w)
    kb = min(_KB, k)
    kp = -(-k // kb) * kb
    n = out_size + out_size % 2

    level_hw = [(f.shape[1], f.shape[2]) for f in feats]
    lvl, y0, x0, wy, wx = ms_roi_prep(
        boxes, level_hw, out_size, sampling_ratio, win)
    meta = jnp.stack([lvl, y0, x0], axis=-1)             # [B, K, 3]
    meta = jnp.pad(meta, ((0, 0), (0, kp - k), (0, 0))).astype(jnp.int32)
    cdt = jnp.float32 if interpret else jnp.bfloat16
    pad4 = [(0, 0), (0, kp - k), (0, 0), (0, 0)]
    wy = jnp.pad(wy, pad4).astype(cdt)
    wx = jnp.pad(wx, pad4).astype(cdt)
    fp = [f.astype(cdt) for f in _pad_levels(feats, win)]

    grid = (b, kp // kb)
    feat_specs = [
        pl.BlockSpec((1,) + f.shape[1:],
                     lambda bi, ki, m: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM) for f in fp]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kb, n, win),
                         lambda bi, ki, m: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, n, win),
                         lambda bi, ki, m: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + feat_specs,
        out_specs=pl.BlockSpec(
            (1, kb, n, n, c), lambda bi, ki, m: (bi, ki, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, win=win, kb=kb, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kp, n, n, c), feats[0].dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
    )(meta, wy, wx, *fp)
    # Zero-row stand-ins carry each level's (shape, dtype) through the
    # VJP residuals without holding memory (dtypes aren't pytree leaves).
    spec = tuple(jnp.zeros((0,) + f.shape[1:], f.dtype) for f in feats)
    res = (spec, meta, wy, wx)
    return out[:, :k, :out_size, :out_size], res


def _fwd_rule(feats, boxes, out_size, sampling_ratio, interpret):
    out, res = _forward(feats, boxes, out_size, sampling_ratio, interpret)
    return out, (res, boxes.shape)


def _bwd_rule(out_size, sampling_ratio, interpret, saved, g):
    (spec, meta, wy, wx), bshape = saved
    b = bshape[0]
    k = bshape[1]
    fdtype = spec[0].dtype
    shapes = tuple((b,) + s.shape[1:] for s in spec)
    c = shapes[0][-1]
    img_h, img_w = shapes[0][1] * 4, shapes[0][2] * 4
    win = window_size(img_h, img_w)
    kb = min(_KB, k)
    kp = meta.shape[1]
    n = out_size + out_size % 2

    g = jnp.pad(g.astype(jnp.float32),
                ((0, 0), (0, kp - k), (0, n - out_size),
                 (0, n - out_size), (0, 0)))

    padded = []
    for (bs, h, w, cc) in shapes:
        ph = max(win, -(-h // 8) * 8)
        pw = max(win, -(-w // 8) * 8)
        padded.append((bs, ph, pw, cc))

    grid = (b, kp // kb)
    dspecs = [
        pl.BlockSpec((1,) + s[1:], lambda bi, ki, m: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM) for s in padded]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kb, n, win),
                         lambda bi, ki, m: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, n, win),
                         lambda bi, ki, m: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, n, n, c),
                         lambda bi, ki, m: (bi, ki, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=dspecs,
    )
    douts = pl.pallas_call(
        functools.partial(_bwd_kernel, win=win, kb=kb,
                          cdt=jnp.float32 if interpret else jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in padded],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary")),
    )(meta, wy, wx, g)
    dfeats = tuple(
        d[:, :s[1], :s[2], :].astype(fdtype)
        for d, s in zip(douts, shapes))
    return dfeats, jnp.zeros(bshape, jnp.float32)


ms_roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
