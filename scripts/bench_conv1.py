"""On-chip bench of conv1 (7x7 stride-2, C_in=3) strategies.

The r3 fixed-mode trace shows conv1 at ~1.64 ms/step — ~3% of the MXU
peak for its ~10 GFLOP (fwd + wgrad) because C_in=3 starves the MXU's
contraction dimension. Candidate reformulations (all exactly the same
math as the reference's nn.Conv2d(3, 64, 7, stride=2, padding=3),
custom_maskrcnn.py:30 via resnet18):

  plain : lax.conv_general_dilated as-is (what flax emits today)
  s2d   : space-to-depth factor 2 -> conv 4x4 stride 1 on 12 channels
          (kernel regrouped by input-coordinate parity)
  im2col: 49 strided slices -> [B,Ho,Wo,147] patches -> one GEMM

Verifies each variant against `plain` in f32 before timing, then times
fwd and fwd+wgrad in bf16 with a 30-iteration in-graph scan and
value-fetch sync.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv1.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _conv_plain(x, w):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_kernel(w):
    """Regroup a [7,7,3,O] stride-2 kernel into [4,4,12,O] over
    space-to-depth(2) input, channel order (ey, ex, c)."""
    import jax.numpy as jnp
    w4 = jnp.zeros((4, 4, 12, w.shape[-1]), w.dtype)
    for ky in range(7):
        ey, ty = (ky + 1) % 2, (ky - 3 - (ky + 1) % 2) // 2 + 2
        for kx in range(7):
            ex, tx = (kx + 1) % 2, (kx - 3 - (kx + 1) % 2) // 2 + 2
            w4 = w4.at[ty, tx, (ey * 2 + ex) * 3:(ey * 2 + ex) * 3 + 3
                       ].set(w[ky, kx])
    return w4


def _conv_s2d(x, w):
    import jax
    import jax.numpy as jnp
    b, h, wd, c = x.shape
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        xs, _s2d_kernel(w), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_im2col(x, w):
    import jax.numpy as jnp
    b, h, wd, c = x.shape
    ho, wo = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cols = [xp[:, ky:ky + 2 * ho - 1:2, kx:kx + 2 * wo - 1:2, :]
            for ky in range(7) for kx in range(7)]
    patches = jnp.concatenate(cols, axis=-1)          # [B,Ho,Wo,147]
    return patches @ w.reshape(49 * c, -1)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from livecell_tpu.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    b, h, w = 16, 304, 224
    x32 = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32))
    k32 = jnp.asarray(
        rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)

    variants = {"plain": _conv_plain, "s2d": _conv_s2d,
                "im2col": _conv_im2col}
    ref = np.asarray(_conv_plain(x32, k32))
    for name, fn in variants.items():
        got = np.asarray(fn(x32, k32))
        err = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
        print(json.dumps({"check": name, "rel_err": err}), flush=True)

    x = x32.astype(jnp.bfloat16)
    k = k32.astype(jnp.bfloat16)
    g0 = jnp.asarray(rng.normal(size=(b, h // 2, w // 2, 64))
                     .astype(np.float32)).astype(jnp.bfloat16)
    loops = 30
    for name, fn in variants.items():
        @jax.jit
        def rep_fwd(x, k):
            def body(carry, _):
                o = fn(x, k * (1 + 1e-12 * carry).astype(k.dtype))
                return jnp.sum(o).astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=loops)[0]

        wgrad = jax.grad(
            lambda kk: jnp.sum((fn(x, kk) * g0).astype(jnp.float32)))

        @jax.jit
        def rep_bwd(k):
            def body(carry, _):
                g = wgrad(k * (1 + 1e-12 * carry).astype(k.dtype))
                return jnp.sum(g).astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0), None,
                                length=loops)[0]

        row = {"variant": name}
        t = time_fn(rep_fwd, x, k, iters=5)
        row["fwd_ms"] = round(t["median_s"] * 1e3 / loops, 3)
        t = time_fn(rep_bwd, k, iters=5)
        row["fwd_wgrad_ms"] = round(t["median_s"] * 1e3 / loops, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
