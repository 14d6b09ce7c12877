"""COCO AP computation unit tests with hand-constructed cases."""

import numpy as np

from livecell_tpu.train.coco_eval import (
    average_precision, compute_ap, greedy_match)


def test_greedy_match_basic():
    scores = np.array([0.9, 0.8, 0.7])
    iou = np.array([[0.8, 0.0],
                    [0.75, 0.1],
                    [0.0, 0.6]])
    tp = greedy_match(scores, iou, 2, 0.5)
    # det0 takes gt0; det1's best (gt0) is taken -> FP; det2 takes gt1.
    assert tp.tolist() == [True, False, True]


def test_greedy_match_prefers_higher_iou():
    scores = np.array([0.9])
    iou = np.array([[0.55, 0.95]])
    tp = greedy_match(scores, iou, 2, 0.5)
    assert tp.tolist() == [True]


def test_average_precision_perfect():
    ap = average_precision(np.array([0.9, 0.8]), np.array([True, True]), 2)
    assert ap > 0.99


def test_average_precision_half():
    # One TP then one FP over 2 GT: recall caps at 0.5, precision 1 there.
    ap = average_precision(np.array([0.9, 0.8]),
                           np.array([True, False]), 2)
    assert 0.45 < ap < 0.55


def test_compute_ap_keys():
    per_image = [
        (np.array([0.9, 0.2]),
         np.array([[0.9, 0.0], [0.0, 0.85]]), 2),
        (np.array([]), np.zeros((0, 1)), 1),
    ]
    out = compute_ap(per_image)
    assert set(out) == {"AP", "AP50", "AP75"}
    assert 0 < out["AP"] <= 1
    assert out["AP50"] >= out["AP75"] >= 0


def test_evaluate_coco_multi_matches_unfused(tmp_path):
    """The fused single-pass evaluator (bit-packed GT upload, in-kernel
    unpack, paste+IoU fused, GT bucketed to multiples of 32) must agree
    exactly with the straightforward unfused computation."""
    import json

    import jax.numpy as jnp

    from livecell_tpu.models.detector import Detections
    from livecell_tpu.ops.boxes import box_iou
    from livecell_tpu.ops.mask_ops import paste_masks
    from livecell_tpu.data.coco import ann_to_mask, CocoIndex
    from livecell_tpu.train.coco_eval import (
        compute_ap, evaluate_coco_multi, mask_iou_matrix)

    H, W, D = 48, 40, 8
    rng = np.random.default_rng(3)
    n_gt = [3, 37]  # second tile crosses the 32-bucket boundary
    images, anns, gt_boxes = [], [], []
    aid = 1
    for i, n in enumerate(n_gt):
        images.append({"id": i + 1, "height": H, "width": W,
                       "file_name": f"t{i}.png"})
        bxs = []
        for _ in range(n):
            x0, y0 = rng.uniform(0, W - 9), rng.uniform(0, H - 9)
            w, h = rng.uniform(4, 8), rng.uniform(4, 8)
            anns.append({"id": aid, "image_id": i + 1, "category_id": 1,
                         "bbox": [x0, y0, w, h], "area": w * h,
                         "segmentation": [[x0, y0, x0 + w, y0,
                                           x0 + w, y0 + h, x0, y0 + h]],
                         "iscrowd": 0})
            bxs.append([x0, y0, x0 + w, y0 + h])
            aid += 1
        gt_boxes.append(np.asarray(bxs, np.float32))
    ann_file = str(tmp_path / "coco.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "cell"}]}, f)

    class Cfg:
        image_height, image_width = H, W

    class DS:
        cfg = Cfg()
        tile_hw = (H, W)
        image_ids = np.asarray([1, 2])
        offsets = np.cumsum([0] + n_gt)
        boxes = np.concatenate(gt_boxes, axis=0)

        def batches(self, bs):
            yield (np.zeros((2, H, W, 1), np.float32),
                   {"boxes": np.zeros((2, 4, 4), np.float32),
                    "valid": np.zeros((2, 4), bool)},
                   np.asarray([True, True]))

    DS.ann_file = ann_file

    boxes = np.zeros((2, D, 4), np.float32)
    for bi in range(2):
        for d in range(D):
            b = gt_boxes[bi][rng.integers(len(gt_boxes[bi]))]
            boxes[bi, d] = np.clip(b + rng.normal(0, 1.2, 4),
                                   0, [W, H, W, H])
    scores = rng.uniform(0.1, 1, (2, D)).astype(np.float32)
    valid = rng.uniform(size=(2, D)) > 0.3
    probs = rng.uniform(0, 1, (2, D, 28, 28)).astype(np.float32)

    def eval_step(p, bs_, imgs):
        return Detections(boxes=jnp.asarray(boxes),
                          scores=jnp.asarray(scores),
                          labels=jnp.ones((2, D), jnp.int32),
                          valid=jnp.asarray(valid),
                          mask_probs=jnp.asarray(probs))

    got = evaluate_coco_multi(eval_step, None, None, DS(), 2,
                              iou_types=("segm", "bbox"))

    # Unfused recompute with the same underlying ops.
    coco = CocoIndex(ann_file)
    per = {"segm": [], "bbox": []}
    for bi in range(2):
        v = valid[bi]
        s = scores[bi][v]
        order = np.argsort(-s)[:100]
        n = n_gt[bi]
        biou = np.asarray(box_iou(jnp.asarray(boxes[bi][v]),
                                  jnp.asarray(DS.boxes[DS.offsets[bi]:
                                                       DS.offsets[bi + 1]])))
        per["bbox"].append((s[order], biou[order], n))
        gmasks = np.stack([ann_to_mask(a, H, W)
                           for a in coco.get_anns(bi + 1)])
        dmasks = np.asarray(paste_masks(jnp.asarray(probs[bi]),
                                        jnp.asarray(boxes[bi]), (H, W),
                                        valid=jnp.asarray(valid[bi]))) > 0
        miou = np.asarray(mask_iou_matrix(jnp.asarray(dmasks[v]),
                                          jnp.asarray(gmasks)))
        per["segm"].append((s[order], miou[order], n))
    want = {t: compute_ap(per[t]) for t in per}
    for t in ("segm", "bbox"):
        for k in ("AP", "AP50", "AP75"):
            assert got[t][k] == want[t][k], (t, k)


def test_evaluate_coco_multi_box_metrics_matches_evaluate(tmp_path):
    """box_metrics=True must reproduce metrics.evaluate exactly from the
    same single detector pass."""
    import json

    import jax.numpy as jnp

    from livecell_tpu.models.detector import Detections
    from livecell_tpu.train import metrics as metrics_lib
    from livecell_tpu.train.coco_eval import evaluate_coco_multi

    H, W, D, I = 32, 32, 6, 5
    rng = np.random.default_rng(7)
    ann_file = str(tmp_path / "coco.json")
    with open(ann_file, "w") as f:
        json.dump({"images": [{"id": 1, "height": H, "width": W,
                               "file_name": "t.png"}],
                   "annotations": [{"id": 1, "image_id": 1,
                                    "category_id": 1,
                                    "bbox": [4, 4, 10, 10], "area": 100,
                                    "segmentation": [[4, 4, 14, 4,
                                                      14, 14, 4, 14]],
                                    "iscrowd": 0}],
                   "categories": [{"id": 1, "name": "cell"}]}, f)

    gt_boxes = np.zeros((1, I, 4), np.float32)
    gt_boxes[0, 0] = [4, 4, 14, 14]
    gt_valid = np.zeros((1, I), bool)
    gt_valid[0, 0] = True

    class Cfg:
        image_height, image_width = H, W

    class DS:
        cfg = Cfg()
        tile_hw = (H, W)
        image_ids = np.asarray([1])
        offsets = np.asarray([0, 1])
        boxes = gt_boxes[0, :1]

        def batches(self, bs):
            yield (np.zeros((1, H, W, 1), np.float32),
                   {"boxes": gt_boxes, "valid": gt_valid},
                   np.asarray([True]))

    DS.ann_file = ann_file

    det = Detections(
        boxes=jnp.asarray(rng.uniform(0, W, (1, D, 4)).astype(np.float32)),
        scores=jnp.asarray(rng.uniform(0, 1, (1, D)).astype(np.float32)),
        labels=jnp.ones((1, D), jnp.int32),
        valid=jnp.asarray(rng.uniform(size=(1, D)) > 0.3),
        mask_probs=jnp.asarray(
            rng.uniform(0, 1, (1, D, 28, 28)).astype(np.float32)))

    def eval_step(p, b, imgs):
        return det

    got = evaluate_coco_multi(eval_step, None, None, DS(), 1,
                              iou_types=("bbox",), box_metrics=True)
    want = metrics_lib.evaluate(eval_step, None, None, DS(), 1)
    assert got["box_metrics"] == want
