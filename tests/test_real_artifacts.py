"""Real-artifact gates (VERDICT r3 #7): skip-marked tests that activate
the moment genuine torchvision weights or the real LIVECell tree are
present, asserting against the pinned manifests in docs/manifests/.

This image has zero egress, so these normally skip; on a networked host

    curl -fL <url from docs/manifests/torchvision_weights.json> \
        -o models/maskrcnn_resnet50_fpn_coco.pth
    LIVECELL_WEIGHTS=models/maskrcnn_resnet50_fpn_coco.pth pytest \
        tests/test_real_artifacts.py -v

(scripts/run_real_livecell.sh runs the same gates before training).
Reference: src/train_transfer.py:22 (pretrained=True), DVC.md:109-121.
"""

import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
MANIFESTS = REPO / "docs" / "manifests"


def _weights_path():
    p = os.environ.get("LIVECELL_WEIGHTS",
                       str(REPO / "models" / "maskrcnn_resnet50_fpn_coco.pth"))
    return p if os.path.exists(p) else None


def _data_root():
    p = os.environ.get("LIVECELL_DATA", str(REPO / "data"))
    return p if os.path.isdir(os.path.join(p, "annotations")) else None


def test_manifests_are_valid_json():
    for name in ("livecell_data.json", "torchvision_weights.json"):
        with open(MANIFESTS / name) as f:
            m = json.load(f)
        assert m, name
    with open(MANIFESTS / "torchvision_weights.json") as f:
        wm = json.load(f)
    # The pin matches torchvision's filename-suffix convention.
    assert wm["sha256_prefix"] in wm["url"]


@pytest.mark.skipif(_weights_path() is None,
                    reason="genuine torchvision weights not present "
                           "(zero-egress image); see docs/manifests/")
def test_real_weights_sha256_and_import():
    wm = json.load(open(MANIFESTS / "torchvision_weights.json"))
    path = _weights_path()
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    assert h.hexdigest().startswith(wm["sha256_prefix"]), \
        "weight file does not match the pinned sha256 prefix"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_torch_import.py"),
         "--weights", path],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "import OK" in r.stdout


@pytest.mark.skipif(_data_root() is None,
                    reason="real LIVECell tree not present "
                           "(zero-egress image); see docs/manifests/")
def test_real_data_matches_manifest():
    dm = json.load(open(MANIFESTS / "livecell_data.json"))
    root = Path(_data_root())
    from livecell_tpu.data.validate import validate_tree

    reports = validate_tree(str(root))
    for rep in reports:
        assert rep.ok, (rep.split, rep.errors[:5])
    # Tree size within 5% of the DVC pin (partial downloads fail here).
    exp = dm["expected_trees"]["data"]
    total = sum(f.stat().st_size for f in root.rglob("*") if f.is_file())
    assert total > 0.95 * exp["size_bytes"], \
        f"data tree {total} bytes << pinned {exp['size_bytes']}"
