"""Torchvision checkpoint import for the transfer Mask R-CNN.

The reference loads `maskrcnn_resnet50_fpn(pretrained=True)` and swaps
the 91-class predictors for 2-class ones (reference
train_transfer.py:20-35). Here the same pretrained `state_dict` (saved
locally as a `.pth`) is translated tensor-by-tensor into our flax
variable tree:

  * conv weights: torch OIHW -> flax HWIO,
  * ConvTranspose2d (mask deconv): (in,out,kh,kw) -> (kh,kw,in,out)
    **with a spatial flip** — flax ConvTranspose cross-correlates where
    torch's deconv convolves, so the unflipped transpose is numerically
    wrong (verified in tests/test_transfer.py:test_deconv_import_matches_torch),
  * linear weights: [out,in] -> [in,out]; fc6 additionally permutes its
    input dimension from torch's (C,y,x) ROI flatten to our NHWC (y,x,c)
    flatten,
  * BatchNorm weight/bias/running_mean/running_var ->
    scale/bias + batch_stats mean/var,
  * class-count-dependent predictor tensors (box_predictor.*,
    mask_predictor.mask_fcn_logits.*) are skipped when shapes mismatch —
    the reference swaps those modules anyway.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def jax_tree_to_dict(tree: Any) -> Dict[str, np.ndarray]:
    """Flatten a variable (sub)tree to {'a/b/c': np.ndarray}."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        out[name] = np.asarray(leaf)
    return out


def _dict_to_tree(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild a pytree with `template`'s structure from the flat dict."""
    import jax

    def rebuild(path, leaf):
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        return flat[name].astype(np.asarray(leaf).dtype)

    return jax.tree_util.tree_map_with_path(rebuild, template)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose
    (kh,kw,in,out), spatially flipped (see module docstring)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fc6(w: np.ndarray, roi: int = 7, ch: int = 256) -> np.ndarray:
    """fc6 [1024, C*r*r] consumes torch's (C,y,x) ROI flatten; ours is
    NHWC (y,x,c) — permute the input axis accordingly."""
    out = w.shape[0]
    w = w.reshape(out, ch, roi, roi).transpose(0, 2, 3, 1).reshape(out, -1)
    return np.transpose(w, (1, 0))


_BN_MAP = {"weight": ("params", "scale"), "bias": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}


def _translate(key: str) -> Tuple[str, str, Any] | None:
    """torchvision state_dict key -> (collection, our flat key, converter).

    Returns None for tensors that are consumed-by-design without a
    destination (num_batches_tracked counters).
    """
    parts = key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None

    # --- backbone ------------------------------------------------------
    if key.startswith("backbone.body."):
        rest = parts[2:]
        if rest[0] == "conv1":
            return ("params", "backbone/conv1/kernel", _conv)
        if rest[0] == "bn1":
            col, leaf = _BN_MAP[rest[1]]
            return (col, f"backbone/bn1/{leaf}", None)
        # layer{s}.{j}.(convK|bnK|downsample.{0,1}).*
        stage, j = rest[0], rest[1]
        block = f"backbone/{stage}_{j}"
        if rest[2].startswith("conv"):
            return ("params", f"{block}/{rest[2]}/conv/kernel", _conv)
        if rest[2].startswith("bn"):
            col, leaf = _BN_MAP[rest[3]]
            return (col, f"{block}/conv{rest[2][2:]}/bn/{leaf}", None)
        if rest[2] == "downsample":
            if rest[3] == "0":
                return ("params", f"{block}/downsample/conv/kernel", _conv)
            col, leaf = _BN_MAP[rest[4]]
            return (col, f"{block}/downsample/bn/{leaf}", None)

    # --- FPN (inner/layer blocks; ≥0.13 nests a Conv2dNormActivation) --
    if key.startswith("backbone.fpn."):
        kind, idx = parts[2], parts[3]
        leaf = parts[-1]
        ours = "lateral" if kind == "inner_blocks" else "output"
        conv = _conv if leaf == "weight" else None
        leaf_name = "kernel" if leaf == "weight" else "bias"
        return ("params", f"fpn/{ours}{idx}/{leaf_name}", conv)

    # --- RPN head ------------------------------------------------------
    if key.startswith("rpn.head."):
        mod = parts[2]
        leaf = parts[-1]
        conv = _conv if leaf == "weight" else None
        leaf_name = "kernel" if leaf == "weight" else "bias"
        return ("params", f"rpn/{mod}/{leaf_name}", conv)

    # --- RoI heads -----------------------------------------------------
    if key.startswith("roi_heads.box_head."):
        fc, leaf = parts[2], parts[3]
        if leaf == "weight":
            return ("params", f"box_head/{fc}/kernel",
                    _fc6 if fc == "fc6" else _linear)
        return ("params", f"box_head/{fc}/bias", None)
    if key.startswith("roi_heads.box_predictor."):
        mod, leaf = parts[2], parts[3]
        leaf_name = "kernel" if leaf == "weight" else "bias"
        conv = _linear if leaf == "weight" else None
        return ("params", f"box_predictor/{mod}/{leaf_name}", conv)
    if key.startswith("roi_heads.mask_head."):
        mod, leaf = parts[2], parts[3]
        leaf_name = "kernel" if leaf == "weight" else "bias"
        conv = _conv if leaf == "weight" else None
        return ("params", f"mask_head/{mod}/{leaf_name}", conv)
    if key.startswith("roi_heads.mask_predictor."):
        mod, leaf = parts[2], parts[3]
        leaf_name = "kernel" if leaf == "weight" else "bias"
        if mod == "conv5_mask":
            conv = _deconv if leaf == "weight" else None
        else:
            conv = _conv if leaf == "weight" else None
        return ("params", f"mask_head/{mod}/{leaf_name}", conv)

    raise KeyError(f"unrecognized torchvision key: {key}")


# Class-count-dependent modules the reference swaps out
# (train_transfer.py:22-35): shape mismatches here are expected.
_SWAPPED_PREFIXES = ("box_predictor/", "mask_head/mask_fcn_logits/")


def load_torchvision_weights(variables: Dict, path: str,
                             strict: bool = False) -> Dict:
    """Import a torchvision maskrcnn_resnet50_fpn state_dict .pth into
    our variable tree. Returns a NEW variables dict (numpy leaves).

    strict=True raises if any checkpoint tensor is neither imported nor
    in the known skip set (counters + swapped predictors), or if a
    mappable tensor's shape mismatches.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise ValueError(f"expected a state_dict at {path}")

    flat = {"params": jax_tree_to_dict(variables["params"]),
            "batch_stats": jax_tree_to_dict(
                variables.get("batch_stats", {}))}

    unconsumed = []
    for key, tensor in sd.items():
        try:
            spec = _translate(key)
        except KeyError:
            # A slightly different torchvision version may carry extra or
            # renamed keys; only strict mode treats that as fatal.
            if strict:
                raise
            unconsumed.append((key, "unrecognized key"))
            continue
        if spec is None:
            continue
        col, ours, conv = spec
        target = flat[col].get(ours)
        if target is None:
            unconsumed.append((key, "no such parameter: " + ours))
            continue
        val = tensor.detach().cpu().numpy().astype(np.float32)
        if conv is not None:
            val = conv(val)
        if val.shape != target.shape:
            if ours.startswith(_SWAPPED_PREFIXES):
                continue  # 91-class predictor: swapped by design
            unconsumed.append(
                (key, f"shape {val.shape} vs ours {target.shape}"))
            continue
        flat[col][ours] = val

    if strict and unconsumed:
        lines = "\n".join(f"  {k}: {why}" for k, why in unconsumed[:20])
        raise ValueError(f"{len(unconsumed)} unconsumed tensors:\n{lines}")

    out = {"params": _dict_to_tree(variables["params"], flat["params"])}
    if variables.get("batch_stats"):
        out["batch_stats"] = _dict_to_tree(variables["batch_stats"],
                                           flat["batch_stats"])
    return out
