"""Checkpointing via Orbax.

Reference behavior: one save at end of training with a dict of
{epoch, model_state_dict, optimizer_state_dict, train_losses,
val_metrics, param_info} (train_custom.py:365-372) or a bare state_dict
(train_transfer.py:511-513); loading accepts both (visualize.py:35-61).
Here both logical formats are Orbax pytree checkpoints; `load`
distinguishes them by the presence of a 'params' key, mirroring the
reference's dict-form sniffing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, params: Any, batch_stats: Any,
         opt_state: Any = None, epoch: Optional[int] = None,
         train_losses=None, val_metrics=None,
         param_info: Optional[Dict] = None,
         model_config: Optional[Dict] = None):
    import orbax.checkpoint as ocp

    payload = {
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats),
    }
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    meta = {"epoch": epoch, "train_losses": train_losses,
            "val_metrics": val_metrics, "param_info": param_info}
    payload["meta"] = {k: v for k, v in meta.items() if v is not None}

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if model_config is not None:
        # Sidecar JSON (string/bool leaves don't fit an Orbax array
        # tree). Stored inside the checkpoint directory so the config
        # travels with the weights; eval reconstructs the exact model
        # (anchor geometry, budgets, quirk switches) with no CLI flags.
        import json

        with open(os.path.join(path, "model_config.json"), "w") as f:
            json.dump(model_config, f, indent=1)
    return path


def load(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by `save` (or a bare variables pytree)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    if "params" not in payload:
        # bare variables dict (the transfer trainer's raw-state_dict analog)
        payload = {"params": payload, "batch_stats": {}, "meta": {}}
    payload.setdefault("batch_stats", {})
    payload.setdefault("meta", {})
    cfg_path = os.path.join(path, "model_config.json")
    if os.path.exists(cfg_path):
        import json

        with open(cfg_path) as f:
            payload["model_config"] = json.load(f)
    return payload
