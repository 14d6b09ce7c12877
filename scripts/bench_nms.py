"""On-chip A/B of the two NMS backends at production shapes.

VERDICT r2 item 5: the Pallas NMS kernel existed but was only ever run
in interpret mode; decide its fate with data. Times `nms_fixed` (XLA
fixed-iteration greedy, ops/nms.py) against `nms_pallas` (single-VMEM
kernel, ops/pallas_nms.py) jitted + vmapped over the batch at the
shapes the models actually run (reference proposal path:
src/utils/proposal_utils.py:55):

  custom RPN:   [16, 500] -> keep 250   (training proposal NMS)
  custom infer: [16, 250] -> keep 50    (detection NMS, quirk caps)
  transfer RPN: [8, 1000] -> keep 1000  (torchvision per-level top-k)

Prints one JSON line per (shape, backend) with value-fetch-synced
timings; run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_nms.py
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

    from livecell_tpu.ops.nms import nms_fixed
    from livecell_tpu.ops.pallas_nms import nms_pallas
    from livecell_tpu.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    shapes = [("custom_rpn", 16, 500, 250, 0.7),
              ("custom_infer", 16, 250, 50, 0.4),
              ("transfer_rpn", 8, 1000, 1000, 0.7)]
    results = []
    for name, b, n, keep, thresh in shapes:
        cx = rng.uniform(0, 700, (b, n)).astype(np.float32)
        cy = rng.uniform(0, 500, (b, n)).astype(np.float32)
        wh = rng.uniform(8, 60, (b, n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.stack(
            [cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
             cx + wh[..., 0] / 2, cy + wh[..., 1] / 2], axis=-1))
        scores = jnp.asarray(rng.uniform(size=(b, n)).astype(np.float32))

        for backend, fn in (("xla", nms_fixed), ("pallas", nms_pallas)):
            f = jax.jit(jax.vmap(
                lambda bx, sc: fn(bx, sc, thresh, keep)[0]))
            t = time_fn(f, boxes, scores, iters=20)
            results.append({"metric": f"nms_{name}_{backend}",
                            "value": round(t["median_s"] * 1e3, 3),
                            "unit": "ms", "batch": b, "n": n,
                            "keep": keep})
            print(json.dumps(results[-1]), flush=True)
        # equality check between backends on this shape
        ia = jax.jit(jax.vmap(lambda bx, sc: nms_fixed(
            bx, sc, thresh, keep)[0]))(boxes, scores)
        ib = jax.jit(jax.vmap(lambda bx, sc: nms_pallas(
            bx, sc, thresh, keep)[0]))(boxes, scores)
        print(json.dumps({"metric": f"nms_{name}_equal",
                          "value": bool((np.asarray(ia)
                                         == np.asarray(ib)).all())}),
              flush=True)


if __name__ == "__main__":
    main()
