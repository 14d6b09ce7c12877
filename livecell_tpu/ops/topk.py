"""Top-k backend selection.

`jax.lax.top_k` over the flat anchor grid (N=38k per image) lowers to a
full sort on TPU — ~2.3 ms/step of the fixed-mode trace across the
proposal top-k and the RPN sampling thresholds. `jax.lax.approx_max_k`
is the TPU-native single-pass alternative (the MIPS ApproxTopK HLO) at
a configurable recall.

Used only where approximation is statistically harmless (training-time
proposal pre-top-k and the balanced-sampling threshold over iid uniform
priorities — reference proposal_utils.py:12-31, rpn.py:84-99); the
inference path keeps exact top-k for AP parity. Config gate:
ModelConfig.topk_backend ("auto" = approx on TPU hardware, exact
elsewhere; "exact"; "approx").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_topk_approx(configured: str) -> bool:
    """Map a topk_backend config value to use-approx (trace-time)."""
    if configured == "auto":
        return jax.devices()[0].platform in ("tpu", "axon")
    return configured == "approx"


def top_k(x: jnp.ndarray, k: int, approx: bool = False,
          recall_target: float = 0.95):
    """lax.top_k drop-in; approx=True uses the TPU ApproxTopK HLO.

    Returns (values, indices), values sorted descending in both modes
    (aggregate_to_topk gives an exact sorted top-k of the candidate
    set; only the candidate set itself is approximate).
    """
    k = min(k, x.shape[-1])
    if not approx:
        return jax.lax.top_k(x, k)
    return jax.lax.approx_max_k(x, k, recall_target=recall_target)
