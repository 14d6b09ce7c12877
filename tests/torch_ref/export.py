"""Export livecell_tpu custom-model variables into the torch transcription.

The torch module tree in reference_model.py is named to mirror the JAX
param tree, so the key mapping is mechanical:
  a/b/kernel -> a.b.weight  (conv HWIO->OIHW; deconv also spatial-flips;
                             dense [in,out]->[out,in]; box_head fc1 gets
                             the NHWC->NCHW flatten permute)
  a/bn/scale -> a.bn.weight, mean -> running_mean, var -> running_var
"""

from __future__ import annotations

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = np.asarray(v, np.float32)
    return out


def _kernel_to_torch(key: str, w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:
        if "deconv" in key:
            # flax ConvTranspose kernel [kh,kw,in,out] convolves as-is;
            # torch's deconv is the conv gradient -> flip + reorder.
            return np.transpose(w[::-1, ::-1], (2, 3, 0, 1)).copy()
        return np.transpose(w, (3, 2, 0, 1)).copy()        # HWIO -> OIHW
    assert w.ndim == 2
    if key == "box_head/fc1/kernel":
        # Ours flattens ROI features (H,W,C)-major; torch flattens
        # (C,H,W)-major.
        hin, out = w.shape
        c = hin // 49
        k = w.reshape(7, 7, c, out)
        return np.transpose(k, (2, 0, 1, 3)).reshape(c * 49, out).T.copy()
    return w.T.copy()


def export_to_torch(variables, torch_model):
    """Load our params + batch_stats into the torch module (strict)."""
    import torch

    params = _flatten(variables["params"])
    stats = _flatten(variables.get("batch_stats", {}))

    sd = torch_model.state_dict()
    written = set()

    def put(tkey, arr):
        assert tkey in sd, f"no torch param {tkey}"
        assert tuple(sd[tkey].shape) == arr.shape, \
            f"{tkey}: torch {tuple(sd[tkey].shape)} vs ours {arr.shape}"
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(arr))
        written.add(tkey)

    for key, w in params.items():
        base = key.replace("/", ".")
        if key.endswith("/kernel"):
            put(base[:-len("kernel")] + "weight", _kernel_to_torch(key, w))
        elif key.endswith("/scale"):
            put(base[:-len("scale")] + "weight", w)
        elif key.endswith("/bias"):
            put(base, w)
        else:
            raise KeyError(f"unmapped param leaf: {key}")

    for key, w in stats.items():
        base = key.replace("/", ".")
        if key.endswith("/mean"):
            put(base[:-len("mean")] + "running_mean", w)
        elif key.endswith("/var"):
            put(base[:-len("var")] + "running_var", w)
        else:
            raise KeyError(f"unmapped stat leaf: {key}")

    missing = [k for k in sd
               if k not in written and not k.endswith("num_batches_tracked")]
    assert not missing, f"torch params never written: {missing[:10]}"
    torch_model.load_state_dict(sd, strict=True)
    return torch_model
