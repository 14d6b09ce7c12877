"""On-chip RoIAlign Pallas block-size sweep.

The r3 trace shows the two RoIAlign pallas calls at ~4.2 ms of the
21.5 ms fixed-mode step, far above their padded-MAC estimate (~1.2 ms)
— consistent with per-program overhead dominating at grid sizes of
128 (fwd) / 256 (bwd) programs. This sweeps the ROI-block (KB) and
channel-block (CB) sizes at the flagship shapes to find the smallest
grid that fits VMEM:

  box pass : feat [16, 56, 76, 256], K=128  (mask_rcnn.py:265)
  mask pass: feat [16, 56, 76, 256], K=64   (mask_rcnn.py:356)

Prints one JSON line per config with value-fetch-synced per-call times
(30-iteration in-graph scan to amortize the ~25 ms tunnel RTT):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_roi_blocks.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from livecell_tpu.ops import pallas_roi_align as pra
    from livecell_tpu.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    b, h, w, c = 16, 56, 76, 256
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    def make_boxes(k):
        x0 = rng.uniform(0, w * 4 - 60, (b, k))
        y0 = rng.uniform(0, h * 4 - 60, (b, k))
        bw = rng.uniform(20, 56, (b, k))
        bh = rng.uniform(20, 56, (b, k))
        return jnp.asarray(np.stack(
            [x0, y0, x0 + bw, y0 + bh], axis=-1).astype(np.float32))

    loops = 30
    # (kb_fwd, cb_fwd, kb_bwd, cb_bwd) under the r3 split-weights
    # structure (weights kernel + GEMM kernels sharing them via VJP
    # residuals).
    configs = [(64, 256, 32, 256),      # r3 defaults
               (64, 256, 64, 256),
               (64, 256, 128, 256),
               (128, 256, 32, 256),
               (128, 256, 64, 256),
               (128, 256, 128, 256)]    # bf16 t admits KB=128 in VMEM
    for k in (128, 64):
        boxes = make_boxes(k)
        for kb, cbf, kbb, cbb in configs:
            pra._KB_BWD, pra._CB_BWD = kbb, cbb

            def roi(f):
                return pra.roi_align_pallas(f, boxes, 7, 0.25, 2, False,
                                            kb, cbf)

            @jax.jit
            def rep_fwd(f):
                def body(carry, _):
                    out = roi(f * (1 + 1e-12 * carry))
                    return jnp.sum(out).astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None,
                                    length=loops)[0]

            grad = jax.grad(lambda f: jnp.sum(
                roi(f).astype(jnp.float32)))

            @jax.jit
            def rep_bwd(f):
                def body(carry, _):
                    g = grad(f * (1 + 1e-12 * carry))
                    return jnp.sum(g).astype(jnp.float32), ()
                return jax.lax.scan(body, jnp.float32(0), None,
                                    length=loops)[0]

            row = {"k": k, "kb": kb, "cb_fwd": cbf,
                   "kb_bwd": kbb, "cb_bwd": cbb}
            try:
                t = time_fn(rep_fwd, feat, iters=5)
                row["fwd_ms"] = round(t["median_s"] * 1e3 / loops, 3)
                t = time_fn(rep_bwd, feat, iters=5)
                row["fwdbwd_ms"] = round(t["median_s"] * 1e3 / loops, 3)
            except Exception as e:  # VMEM overflow etc.
                row["error"] = str(e)[:120]
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
