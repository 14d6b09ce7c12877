"""On-chip NMS benchmark at production shapes.

VERDICT r2 item 5 asked to settle the dormant Pallas NMS kernel with
data. Settled (r3, this script): the XLA fixed-iteration greedy won at
every shape (xla vs pallas median ms: 1.12 vs 2.08 @ 16x500->250, 0.60
vs 0.78 @ 16x250->50, 2.80 vs 3.81 @ 8x1000->1000, 50-iteration
in-graph scan to amortize the ~25 ms tunnel RTT), and the kernel
mismatched the reference semantics on hardware at n=1000 (62/8000
indices). The kernel was deleted; this script remains to benchmark
`nms_fixed` (ops/nms.py) at the shapes the models actually run
(reference proposal path: src/utils/proposal_utils.py:55):

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

        loops = 50
        for backend, fn in (("xla", nms_fixed),):
            nms_b = jax.vmap(lambda bx, sc: fn(bx, sc, thresh, keep)[0])

            # Amortize the ~25 ms tunnel RTT: `loops` dependent NMS
            # calls inside one jit (score offset keyed on the previous
            # iteration's output defeats CSE), then one value fetch.
            @jax.jit
            def rep(bx, sc):
                def body(carry, _):
                    out = nms_b(bx, sc + 1e-9 * carry[:, :1])
                    return out.astype(jnp.float32), ()
                carry, _ = jax.lax.scan(
                    body, jnp.zeros((b, keep), jnp.float32), None,
                    length=loops)
                return carry

            t = time_fn(rep, boxes, scores, iters=10)
            results.append({"metric": f"nms_{name}_{backend}",
                            "value": round(t["median_s"] * 1e3 / loops,
                                           4),
                            "unit": "ms", "batch": b, "n": n,
                            "keep": keep,
                            "rtt_incl_ms": round(
                                t["median_s"] * 1e3, 2)})
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
